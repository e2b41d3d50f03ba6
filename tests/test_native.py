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


def test_lut_cell_sort_native_matches_numpy():
    """C++ counting sort == numpy stable argsort path, and it is fast."""
    import time

    from motionpriorcmax_tpu import native
    from motionpriorcmax_tpu.data.host_ops import lut_cell_keys

    if not native.available():
        import pytest
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(0)
    h, w, nbins, s = 480, 640, 15, 4
    hq, wq = h // s, w // s
    m = 1 << 20
    ev = np.zeros((m, 6), np.float32)
    ev[:, 0] = rng.uniform(0, h - 1, m)
    ev[:, 1] = rng.uniform(0, w - 1, m)
    ev[:, 2] = rng.uniform(0, 1, m)
    ev[:, 3] = rng.integers(0, 2, m)
    ev[:, 4] = rng.integers(0, nbins, m)
    ev[:, 5] = 1.0

    t0 = time.perf_counter()
    out_c, ends_c = native.lut_cell_sort_segment(ev, hq, wq, nbins, s)
    dt_c = time.perf_counter() - t0

    keys, ncells = lut_cell_keys(ev, (h, w), nbins, s)
    t0 = time.perf_counter()
    order = np.argsort(keys, kind="stable")
    out_np = ev[order]
    ends_np = np.searchsorted(keys[order], np.arange(ncells), side="right")
    dt_np = time.perf_counter() - t0

    np.testing.assert_array_equal(out_c, out_np)
    np.testing.assert_array_equal(ends_c, ends_np)
    print(f"native {dt_c*1e3:.1f} ms vs numpy {dt_np*1e3:.1f} ms")
