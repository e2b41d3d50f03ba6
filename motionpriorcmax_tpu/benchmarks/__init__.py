"""Benchmark harnesses: component microbenches + scaling efficiency."""
