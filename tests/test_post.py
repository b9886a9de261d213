"""Connected-component post-processing parity with the reference semantics."""

import numpy as np
import pytest

from unetseg_tpu.post.cc import (
    get_instance_masks,
    label_components,
    relabel_sequential,
    remove_small,
)


def _three_blobs():
    m = np.zeros((30, 30), np.uint8)
    m[2:6, 2:6] = 1          # 16 px
    m[10:12, 10:12] = 1      # 4 px (small)
    m[20:28, 20:28] = 1      # 64 px
    return m


def test_label_components_count():
    labeled, n = label_components(_three_blobs())
    assert n == 3
    assert set(np.unique(labeled)) == {0, 1, 2, 3}


def test_8_connectivity_diagonal_merge():
    """Diagonal touch merges under 8-connectivity (reference uses
    skimage connectivity=2, utils/metrics.py:65)."""
    m = np.zeros((6, 6), np.uint8)
    m[0:2, 0:2] = 1
    m[2, 2] = 1  # touches (1,1) diagonally
    labeled, n = label_components(m)
    assert n == 1


def test_remove_small_keeps_ids_with_gaps():
    labeled, _ = label_components(_three_blobs())
    out = remove_small(labeled, min_size=15)
    ids = set(np.unique(out)) - {0}
    assert len(ids) == 2
    # surviving ids keep their values (gap where the small one was)
    assert ids == {labeled[3, 3], labeled[21, 21]}


def test_get_instance_masks_matches_reference_defaults():
    """min_size=15 like scripts/predict.py:47, uint16 output, 0/255 input."""
    m = _three_blobs() * 255
    inst = get_instance_masks(m, min_size=15)
    assert inst.dtype == np.uint16
    assert len(set(np.unique(inst)) - {0}) == 2
    assert inst[10, 10] == 0  # small blob removed


def test_get_instance_masks_relabel():
    inst = get_instance_masks(_three_blobs(), min_size=15, relabel=True)
    assert set(np.unique(inst)) == {0, 1, 2}


def test_empty_mask():
    inst = get_instance_masks(np.zeros((8, 8), np.uint8))
    assert inst.sum() == 0


def test_relabel_sequential():
    x = np.array([[0, 3, 3], [7, 0, 9]])
    out = relabel_sequential(x)
    np.testing.assert_array_equal(out, [[0, 1, 1], [2, 0, 3]])


def test_skimage_connectivity2_semantics():
    """Hand-built fixture pinning the skimage.measure.label(connectivity=2) +
    remove_small_objects semantics the reference relies on
    (reference: utils/metrics.py:42-72): 8-connectivity joins diagonal
    touches, and removal is strict `area < min_size`. (Replaces a skimage
    cross-check that could never run in this environment — the CC path is
    also golden-tested bit-exact in test_golden_artifacts.py.)"""
    m = np.zeros((8, 8), np.uint8)
    m[1, 1] = 1          # diagonal neighbor of...
    m[2, 2:5] = 1        # ...a 3-px run: one 4-px component under 8-conn
    m[5, 5:7] = 1        # separate 2-px component
    inst = get_instance_masks(m, min_size=1)
    assert inst[1, 1] != 0 and inst[1, 1] == inst[2, 3]  # diagonal merged
    assert inst[5, 5] != 0 and inst[5, 5] != inst[1, 1]
    # strict `< min_size`: the 2-px component survives min_size=2 ...
    inst2 = get_instance_masks(m, min_size=2)
    assert inst2[5, 5] != 0
    # ... and dies at min_size=3 while the 4-px one survives
    inst3 = get_instance_masks(m, min_size=3)
    assert inst3[5, 5] == 0 and inst3[2, 3] != 0


def test_temporal_resplit_ignores_subminsize_fragments(monkeypatch):
    """A watershed FRAGMENT (below min_size, about to die in remove_small)
    must not count as 'this component is already split' — round-5 fix for
    the seq-02 frame-51 merge: markers split 17.3k px into 16.7k + 630,
    the 630 fragment satisfied the old gate, remove_small deleted it, and
    two tracked cells stayed merged for the rest of the sequence."""
    import numpy as np

    from unetseg_tpu.post import temporal

    h, w = 60, 100
    prev = np.zeros((h, w), np.uint16)
    prev[10:50, 5:48] = 1
    prev[10:50, 52:95] = 2
    binary = np.zeros((h, w), bool)
    binary[10:50, 5:95] = True  # the two cells merged into one component

    def fake_markers(b, marker_frac, smooth_sigma):
        # one central marker + a spurious tiny-corner marker, so the
        # marker watershed yields a big basin + a sub-min_size fragment
        m = np.zeros(b.shape, np.int32)
        m[30, 50] = 1
        m[11, 6] = 2  # 6-px corner basin under the EDT watershed
        from scipy.ndimage import distance_transform_edt

        return m, distance_transform_edt(b).astype(np.float32)

    monkeypatch.setattr(temporal, "distance_markers", fake_markers)
    out = temporal.temporal_instance_masks(
        binary, prev, min_size=300, min_overlap=50,
    )
    labs = sorted(set(np.unique(out)) - {0})
    assert len(labs) == 2, f"expected the core-seeded re-split, got {labs}"
    # each re-split cell sits where its previous-frame cell was
    a = out[30, 20]
    b_ = out[30, 80]
    assert a != 0 and b_ != 0 and a != b_
