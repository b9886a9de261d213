"""Watershed instance splitting: native/python agreement and the
merged-blob split property."""

import numpy as np
import pytest

from unetseg_tpu.post.watershed import (
    distance_markers,
    get_instance_masks_watershed,
    merge_shallow_ridges,
    watershed,
)


def _two_touching_disks(r=10, sep=18, shape=(48, 64)):
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    c1 = (24, 22)
    c2 = (24, 22 + sep)
    m = ((yy - c1[0]) ** 2 + (xx - c1[1]) ** 2 <= r * r) | (
        (yy - c2[0]) ** 2 + (xx - c2[1]) ** 2 <= r * r
    )
    return m.astype(np.uint8)


def test_markers_find_two_peaks():
    m = _two_touching_disks()
    markers, dist = distance_markers(m, marker_frac=0.6, smooth_sigma=1.0)
    ids = set(np.unique(markers)) - {0}
    assert len(ids) == 2


def test_watershed_splits_merged_blob():
    m = _two_touching_disks()
    inst = get_instance_masks_watershed(m, min_size=5, backend="python")
    ids = set(np.unique(inst)) - {0}
    assert len(ids) == 2
    # the full foreground stays covered
    assert ((inst > 0) == (m > 0)).all()


def test_single_cell_unchanged():
    m = np.zeros((32, 32), np.uint8)
    m[8:24, 8:24] = 1
    inst = get_instance_masks_watershed(m, min_size=5, backend="python")
    assert set(np.unique(inst)) == {0, 1}
    assert ((inst > 0) == (m > 0)).all()


def test_native_matches_python():
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no compiler")
    m = _two_touching_disks(r=8, sep=14)
    a = get_instance_masks_watershed(m, min_size=5, backend="native")
    b = get_instance_masks_watershed(m, min_size=5, backend="python")
    np.testing.assert_array_equal(a, b)


def test_watershed_respects_mask():
    elev = np.zeros((8, 8), np.float32)
    markers = np.zeros((8, 8), np.uint16)
    markers[2, 2] = 1
    mask = np.zeros((8, 8), np.uint8)
    mask[2:5, 2:5] = 1
    out = watershed(elev, markers, mask, backend="python")
    assert (out[mask == 0] == 0).all()
    assert (out[2:5, 2:5] == 1).all()


def test_empty_mask():
    inst = get_instance_masks_watershed(np.zeros((16, 16), np.uint8), backend="python")
    assert inst.sum() == 0


def test_saddle_merge_keeps_true_contact_split():
    # two disks joined by a thin neck: the saddle (neck half-width) is far
    # below the peaks (disk radii), so the split must survive merging
    m = _two_touching_disks(r=10, sep=19)
    split = get_instance_masks_watershed(
        m, min_size=5, marker_frac=0.6, smooth_sigma=1.0, backend="python"
    )
    merged = get_instance_masks_watershed(
        m, min_size=5, marker_frac=0.6, smooth_sigma=1.0,
        merge_saddle_frac=0.7, backend="python",
    )
    assert len(set(np.unique(split)) - {0}) == 2
    assert len(set(np.unique(merged)) - {0}) == 2


def test_saddle_merge_rejoins_bumpy_single_cell():
    # dumbbell with a WIDE bridge: two peaks (the square centers) above the
    # marker threshold, but the connecting ridge is nearly as high as the
    # peaks — one bumpy cell, not two
    m = np.zeros((40, 80), np.uint8)
    m[8:32, 8:32] = 1    # peak ~12
    m[8:32, 48:72] = 1   # peak ~12
    m[10:30, 32:48] = 1  # bridge, ridge ~10 >= 0.7 * 12
    over = get_instance_masks_watershed(
        m, min_size=5, marker_frac=0.9, smooth_sigma=0.0, backend="python"
    )
    fixed = get_instance_masks_watershed(
        m, min_size=5, marker_frac=0.9, smooth_sigma=0.0,
        merge_saddle_frac=0.7, backend="python",
    )
    assert len(set(np.unique(over)) - {0}) >= 2  # over-segmented without merge
    assert len(set(np.unique(fixed)) - {0}) == 1


def test_merge_shallow_ridges_direct():
    # hand-built partition: region 1 and 2 split by a ridge as high as the
    # peaks -> merge; region 3 separated by a zero-depth neck -> keep
    labels = np.array([
        [1, 1, 2, 2, 0, 3, 3],
        [1, 1, 2, 2, 0, 3, 3],
    ])
    dist = np.array([
        [3.0, 3.0, 2.9, 3.0, 0.1, 3.0, 3.0],
        [3.0, 3.0, 2.9, 3.0, 0.1, 3.0, 3.0],
    ], np.float32)
    # make 3 touch 2 through the low corridor so a 3<->2 saddle exists
    labels[0, 4] = 3
    out = merge_shallow_ridges(labels, dist, merge_frac=0.7)
    assert out[0, 0] == out[0, 2]      # 1 and 2 merged
    assert out[0, 5] != out[0, 0]      # 3 stays separate
