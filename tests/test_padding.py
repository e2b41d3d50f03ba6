"""InputPadder-equivalent tests (reference C21 with the bug fixed)."""

import jax.numpy as jnp
import numpy as np

from motionpriorcmax_tpu.ops.padding import (pad_to_multiple, padding_amounts,
                                             requires_padding, unpad)


def test_requires_padding_fixed():
    # The reference version always returns False (DIVERGENCES.md #1).
    assert requires_padding(30, 40, 8) is True
    assert requires_padding(32, 44, 8) is True
    assert requires_padding(32, 48, 8) is False


def test_pad_unpad_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 30, 41)).astype(np.float32))
    padded = pad_to_multiple(x, 8)
    assert padded.shape == (2, 3, 32, 48)
    back = unpad(padded, 30, 41, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pad_replicate_edges():
    x = jnp.arange(6.0).reshape(1, 1, 2, 3)
    padded = pad_to_multiple(x, 4)
    assert padded.shape == (1, 1, 4, 4)
    # Replicate mode: corners repeat edge values.
    assert float(padded[0, 0, 0, 0]) == 0.0
    assert float(padded[0, 0, -1, -1]) == 5.0


def test_no_top_padding():
    top, bottom, left, right = padding_amounts(30, 40, 8, no_top_padding=True)
    assert top == 0 and bottom == 2
    assert left + right == 0
