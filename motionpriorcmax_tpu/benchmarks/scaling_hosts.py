"""Correctness-at-N-hosts table over a REAL jax.distributed CPU cluster.

One real chip is an environment fact (BASELINE.md), so step-time scaling
cannot be measured here — but the multi-host PATH (host-local loading,
host_local_batch_to_global assembly, SPMD step over a process-spanning
mesh, cross-process metric reduction, collective checkpointing) can be
proven correct at N processes, not just the 2 the test suite pins: each N
must reproduce the single-process loss on an identical global mesh.

Run:  python -m motionpriorcmax_tpu.benchmarks.scaling_hosts
Spawns N in {1, 2, 4} process clusters over 8 virtual CPU devices
(tests/_distributed_worker.py) and prints one JSON line per N with the
best-val metric, step count, and wall time; ends with a parity verdict.
"""

from __future__ import annotations

import json
import socket
import subprocess
import sys
import time
from pathlib import Path

TOTAL_DEVICES = 8
WORKER = Path(__file__).resolve().parents[2] / "tests" / "_distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_cluster(nproc: int, workdir: Path, timeout: int = 1200):
    port = _free_port()
    t0 = time.perf_counter()
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), str(pid), str(nproc), str(port),
         str(workdir), str(TOTAL_DEVICES)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(WORKER.parents[1]))
        for pid in range(nproc)]
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    wall = time.perf_counter() - t0
    outs = [json.loads((workdir / f"out_n{nproc}_p{pid}.json").read_text())
            for pid in range(nproc)]
    return outs, wall


def main():
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        results = {}
        for nproc in (1, 2, 4):
            outs, wall = run_cluster(nproc, Path(td))
            # Every process must agree on the reduced val metric.
            bests = {round(o["best"], 6) for o in outs}
            assert len(bests) == 1, bests
            results[nproc] = outs[0]
            print(json.dumps({"hosts": nproc,
                              "devices": TOTAL_DEVICES,
                              "best_val": round(outs[0]["best"], 6),
                              "steps": outs[0]["steps"],
                              "wall_s": round(wall, 1)}), flush=True)
        ref = results[1]["best"]
        ok = all(abs(results[n]["best"] - ref) < 5e-3 for n in results)
        print(json.dumps({"parity_vs_single_process": ok,
                          "best_vals": {n: round(results[n]["best"], 6)
                                        for n in results}}), flush=True)
        assert ok


if __name__ == "__main__":
    main()
