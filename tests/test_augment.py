"""MultiFlow augmentor tests.

The reference snapshot wires spatial/photo augmentors that it never defines
(src/loader/multiflow/datasubset.py:119-131); ours are designed fresh, so
the tests pin the invariants instead of parity: geometric consistency
between voxel / flow / images / events, and value preservation.
"""

import numpy as np
import pytest

from motionpriorcmax_tpu.data import (MultiflowAugmentor, PhotometricAugmentor,
                                      SpatialAugmentor)

H, W = 24, 32


def make_sample(rng, n_ev=200):
    voxel = rng.normal(size=(5, H, W)).astype(np.float32)
    flows = [rng.normal(size=(2, H, W)).astype(np.float32) for _ in range(3)]
    images = [rng.uniform(0, 255, (3, H, W)).astype(np.float32)
              for _ in range(2)]
    events = np.column_stack([
        rng.integers(0, H, n_ev), rng.integers(0, W, n_ev),
        rng.uniform(0, 1, n_ev), rng.integers(0, 2, n_ev),
        rng.integers(0, 5, n_ev)]).astype(np.float32)
    return voxel, flows, images, events


def test_hflip_geometry(rng):
    voxel, flows, images, events = make_sample(rng)
    aug = SpatialAugmentor(h_flip_prob=1.0, v_flip_prob=0.0, seed=1)
    v2, f2, im2, ev2 = aug(voxel, flows, images, events)

    np.testing.assert_allclose(v2, voxel[..., ::-1])
    # x component negated + mirrored; y component mirrored only.
    np.testing.assert_allclose(f2[0][0], -flows[0][0, :, ::-1])
    np.testing.assert_allclose(f2[0][1], flows[0][1, :, ::-1])
    np.testing.assert_allclose(im2[0], images[0][..., ::-1])
    # Event at column x moves to W-1-x; the voxel value at the event's pixel
    # must be preserved under the same mapping.
    np.testing.assert_allclose(ev2[:, 1], (W - 1) - events[:, 1])
    yi = events[:, 0].astype(int)
    xi = events[:, 1].astype(int)
    np.testing.assert_allclose(v2[0, yi, ev2[:, 1].astype(int)],
                               voxel[0, yi, xi])

    # Involution: flipping twice restores everything.
    v3, f3, im3, ev3 = aug(v2, f2, im2, ev2)
    np.testing.assert_allclose(v3, voxel)
    np.testing.assert_allclose(f3[1], flows[1])
    np.testing.assert_allclose(ev3, events)


def test_vflip_geometry(rng):
    voxel, flows, images, events = make_sample(rng)
    aug = SpatialAugmentor(h_flip_prob=0.0, v_flip_prob=1.0)
    v2, f2, _, ev2 = aug(voxel, flows, images, events)
    np.testing.assert_allclose(v2, voxel[..., ::-1, :])
    np.testing.assert_allclose(f2[0][1], -flows[0][1, ::-1])
    np.testing.assert_allclose(f2[0][0], flows[0][0, ::-1])
    np.testing.assert_allclose(ev2[:, 0], (H - 1) - events[:, 0])


def test_crop_consistency(rng):
    voxel, flows, images, events = make_sample(rng, n_ev=500)
    ch, cw = 16, 16
    aug = SpatialAugmentor(h_flip_prob=0.0, v_flip_prob=0.0,
                           crop_hw=(ch, cw), seed=3)
    v2, f2, im2, ev2 = aug(voxel, flows, images, events)
    assert v2.shape == (5, ch, cw)
    assert f2[0].shape == (2, ch, cw) and im2[0].shape == (3, ch, cw)

    # All surviving events lie inside the window, and their voxel values
    # match the cropped grid at the shifted coordinates.
    assert len(ev2) > 0
    assert (ev2[:, 0] >= 0).all() and (ev2[:, 0] < ch).all()
    assert (ev2[:, 1] >= 0).all() and (ev2[:, 1] < cw).all()
    # Recover the window offset from one surviving event via value matching
    # on the flow grid (flow values are crop-invariant).
    found = False
    for y0 in range(H - ch + 1):
        for x0 in range(W - cw + 1):
            if np.allclose(f2[0], flows[0][:, y0:y0 + ch, x0:x0 + cw]):
                found = True
                np.testing.assert_allclose(
                    v2, voxel[:, y0:y0 + ch, x0:x0 + cw])
                break
        if found:
            break
    assert found


def test_no_op_probabilities(rng):
    voxel, flows, images, events = make_sample(rng)
    aug = SpatialAugmentor(h_flip_prob=0.0, v_flip_prob=0.0)
    v2, f2, im2, ev2 = aug(voxel, flows, images, events)
    np.testing.assert_allclose(v2, voxel)
    np.testing.assert_allclose(f2[2], flows[2])
    np.testing.assert_allclose(ev2, events)


def test_photometric_bounds_and_sharing(rng):
    images = [rng.uniform(0, 255, (3, H, W)).astype(np.float32)
              for _ in range(2)]
    aug = PhotometricAugmentor(brightness=0.3, contrast=0.3, gamma=0.3,
                               seed=5)
    out = aug(images)
    for im in out:
        assert im.shape == (3, H, W)
        assert im.min() >= 0.0 and im.max() <= 255.0
    # Same draw on both images: a constant-offset pair keeps its ordering.
    a = np.full((3, H, W), 100.0, np.float32)
    b = np.full((3, H, W), 120.0, np.float32)
    oa, ob = PhotometricAugmentor(seed=7)([a, b])
    assert ob.mean() >= oa.mean()


def test_composite_matches_subset_hook(rng):
    """The composite plugs into MultiflowDatasubset's augmentor call shape
    (multiflow.py:249-251)."""
    voxel, flows, images, events = make_sample(rng)
    aug = MultiflowAugmentor(
        spatial=SpatialAugmentor(h_flip_prob=1.0),
        photometric=PhotometricAugmentor(seed=2))
    v2, f2, im2, ev2 = aug(voxel, flows, images, events)
    assert v2.shape == voxel.shape and len(f2) == 3 and len(im2) == 2
    assert ev2.shape == events.shape
    # Photometric ran after spatial: images are flipped AND jittered.
    assert not np.allclose(im2[0], images[0][..., ::-1])
