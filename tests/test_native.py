"""Native C++ host kernels vs NumPy references."""

import numpy as np
import pytest

from motionpriorcmax_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


def test_lower_bound(rng):
    t = np.sort(rng.integers(0, 10000, 500)).astype(np.int64)
    for v in (0, 5000, 9999, 20000, int(t[100])):
        assert native.lower_bound(t, v) == np.searchsorted(t, v, "left")


def test_voxelize_trilinear_matches_numpy(rng):
    from motionpriorcmax_tpu.data.host_ops import voxel_grid_numpy

    nb, h, w = 5, 24, 32
    m = 500
    x = rng.uniform(-1, w + 1, m).astype(np.float32)
    y = rng.uniform(-1, h + 1, m).astype(np.float32)
    t = np.sort(rng.integers(0, 100000, m)).astype(np.int64)
    p = rng.integers(0, 2, m).astype(np.float32)

    t_norm = (t - t[0]) / max(t[-1] - t[0], 1) * (nb - 1)
    got = native.voxelize_trilinear(x, y, t_norm.astype(np.float32), p,
                                    nb, h, w)
    want = voxel_grid_numpy(x, y, p, t, nb, h, w)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_voxelize_temporal(rng):
    nb, h, w = 4, 10, 12
    x = rng.integers(0, w, 200).astype(np.int32)
    y = rng.integers(0, h, 200).astype(np.int32)
    t_norm = rng.uniform(0, nb - 1, 200).astype(np.float32)
    p = rng.integers(0, 2, 200).astype(np.float32)
    got = native.voxelize_temporal(x, y, t_norm, p, nb, h, w)

    want = np.zeros((nb, h, w))
    for xi, yi, ti, pi in zip(x, y, t_norm, p):
        v = 2 * pi - 1
        t0 = int(np.floor(ti))
        for tt in (t0, t0 + 1):
            if 0 <= tt < nb:
                want[tt, yi, xi] += v * (1 - abs(tt - ti))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_pack_dsec_events(rng):
    h, w, nb = 16, 20, 5
    m = 300
    x = rng.integers(0, w, m).astype(np.uint16)
    y = rng.integers(0, h, m).astype(np.uint16)
    t = np.sort(rng.integers(0, 100000, m)).astype(np.int64)
    p = rng.integers(0, 2, m).astype(np.uint8)
    # Rectify map: identity + jitter, some pixels mapped out of bounds.
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    rect = np.stack([gx, gy], axis=-1)
    rect[0, 0] = (-5.0, -5.0)  # force an out-of-bounds mapping

    packed = native.pack_dsec_events(x, y, t, p, rect, h, w, nb)

    # NumPy reference (loader.py:152-161 semantics).
    xy_rect = rect[y, x]
    xr, yr = xy_rect[:, 0], xy_rect[:, 1]
    tn = (t - t.min()) / max(t.max() - t.min(), 1)
    bins = np.clip(np.searchsorted(np.linspace(0, 1, nb + 1), tn) - 1, 0, None)
    rows = np.column_stack([yr, xr, tn, p, bins]).astype(np.float32)
    mask = (yr >= 0) & (yr < h) & (xr >= 0) & (xr < w)
    want = rows[mask]

    assert packed.shape == want.shape
    np.testing.assert_allclose(packed[:, [0, 1, 3]], want[:, [0, 1, 3]],
                               atol=1e-5)
    np.testing.assert_allclose(packed[:, 2], want[:, 2], atol=1e-6)
    np.testing.assert_array_equal(packed[:, 4], want[:, 4])
