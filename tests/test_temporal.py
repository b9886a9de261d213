"""Temporal-marker watershed (post/temporal.py): previous-frame cores split
what the distance transform cannot."""

import numpy as np

from unetseg_tpu.post.temporal import instance_cores, temporal_instance_masks


def _disk(shape, c, r):
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    return (yy - c[0]) ** 2 + (xx - c[1]) ** 2 <= r * r


def test_instance_cores_one_core_per_instance():
    inst = np.zeros((64, 96), np.uint16)
    inst[_disk(inst.shape, (32, 24), 12)] = 1
    inst[_disk(inst.shape, (32, 64), 10)] = 2
    cores = instance_cores(inst, core_frac=0.5)
    assert cores[32, 24] and cores[32, 64]
    assert (inst[cores] > 0).all()
    # cores are strictly inside their instances (no bleed)
    assert set(np.unique(inst[cores])) == {1, 2}


def test_first_frame_matches_plain_watershed():
    from unetseg_tpu.post.watershed import get_instance_masks_watershed

    m = (_disk((48, 64), (24, 22), 10) | _disk((48, 64), (24, 40), 10))
    a = temporal_instance_masks(m, None, min_size=5, backend="python")
    b = get_instance_masks_watershed(
        m, min_size=5, marker_frac=0.5, backend="python"
    )
    np.testing.assert_array_equal(a, b)


def test_previous_cores_split_wide_contact():
    """Two cells whose merged silhouette has ONE distance peak (wide
    contact): plain watershed keeps them merged; with the previous frame's
    two instances the component is re-split."""
    shape = (64, 96)
    # frame t-1: two separate squares
    prev = np.zeros(shape, np.uint16)
    prev[16:48, 12:42] = 1
    prev[16:48, 50:80] = 2
    # frame t: the union plus the gap filled -> one rectangular blob whose
    # distance transform has a single ridge (no internal minimum)
    cur = np.zeros(shape, np.uint8)
    cur[16:48, 12:80] = 1

    plain = temporal_instance_masks(cur, None, min_size=5, backend="python")
    assert len(set(np.unique(plain)) - {0}) == 1  # under-segmented

    split = temporal_instance_masks(
        cur, prev, min_size=5, min_overlap=100, backend="python"
    )
    ids = set(np.unique(split)) - {0}
    assert len(ids) == 2
    # left/right halves carry different labels, split near the old boundary
    assert split[32, 20] != split[32, 70]
    # full foreground still covered
    assert ((split > 0) == (cur > 0)).all()


def test_no_resplit_when_counts_agree():
    """If distance markers already split the component into as many cells
    as the previous frame had, temporal seeding must not fire."""
    shape = (48, 96)
    prev = np.zeros(shape, np.uint16)
    prev[_disk(shape, (24, 26), 10)] = 1
    prev[_disk(shape, (24, 62), 10)] = 2
    cur = (_disk(shape, (24, 28), 10) | _disk(shape, (24, 60), 10)).astype(np.uint8)
    out = temporal_instance_masks(
        cur, prev, min_size=5, min_overlap=50, backend="python"
    )
    assert len(set(np.unique(out)) - {0}) == 2


def test_area_guard_rejects_fragment_split():
    """A previous instance that barely pokes into the current component
    (overlap above min_overlap, but the re-split piece is far below its old
    area) must NOT spawn a fragment instance: the guard drops its seed and
    the component keeps a single label."""
    shape = (64, 96)
    prev = np.zeros(shape, np.uint16)
    prev[8:56, 8:56] = 1       # big cell, area 2304
    prev[24:40, 58:90] = 2     # neighbor mostly OUTSIDE the current blob
    cur = np.zeros(shape, np.uint8)
    cur[8:56, 8:62] = 1        # current component: cell 1 plus a thin sliver
                               # of cell 2's old footprint (overlap 16*4=64...)

    # make the overlap pass min_overlap but stay tiny vs prev area of cell 2
    out = temporal_instance_masks(
        cur, prev, min_size=5, min_overlap=50, area_guard=0.5,
        backend="python",
    )
    assert len(set(np.unique(out)) - {0}) == 1  # no fragment instance

    # with the guard off the same geometry fragments into two
    out2 = temporal_instance_masks(
        cur, prev, min_size=5, min_overlap=50, area_guard=0.0,
        backend="python",
    )
    assert len(set(np.unique(out2)) - {0}) == 2


def test_area_guard_keeps_balanced_split():
    """The guard must not break the legitimate wide-contact re-split."""
    shape = (64, 96)
    prev = np.zeros(shape, np.uint16)
    prev[16:48, 12:42] = 1
    prev[16:48, 50:80] = 2
    cur = np.zeros(shape, np.uint8)
    cur[16:48, 12:80] = 1
    split = temporal_instance_masks(
        cur, prev, min_size=5, min_overlap=100, area_guard=0.3,
        backend="python",
    )
    assert len(set(np.unique(split)) - {0}) == 2


def test_predict_sequence_temporal_flag(tmp_path):
    """Engine smoke: the temporal_markers flag threads prev-frame state."""
    import jax

    from unetseg_tpu.core.config import InferConfig, ModelConfig
    from unetseg_tpu.data.io import write_mask_u8
    from unetseg_tpu.infer.engine import Predictor
    from unetseg_tpu.models.unet import UNet, init_unet
    from PIL import Image

    size = 188
    mcfg = ModelConfig(base_features=4, compute_dtype="float32")
    model = UNet(cfg=mcfg)
    v = init_unet(model, jax.random.key(0), input_size=size)
    pred = Predictor(
        model, v["params"], v["batch_stats"],
        InferConfig(image_size=size, min_cell_size=1),
    )
    seq = tmp_path / "01"
    seq.mkdir()
    for i in range(3):
        img = (np.random.RandomState(i).rand(size, size) * 255).astype(np.uint8)
        Image.fromarray(img).save(seq / f"t{i:03d}.tif")
    out_m = str(tmp_path / "RES")
    out_i = str(tmp_path / "RES_INST")
    written = pred.predict_sequence(
        str(seq), out_m, out_i, batch_size=2, temporal_markers=True
    )
    assert len(written) == 6

    # bidi: same frame set, deferred instance writes land identically named
    out_m2 = str(tmp_path / "RES2")
    out_i2 = str(tmp_path / "RES_INST2")
    written2 = pred.predict_sequence(
        str(seq), out_m2, out_i2, batch_size=2,
        temporal_markers=True, temporal_bidi=True,
    )
    import os

    import pytest

    assert len(written2) == 6
    assert sorted(os.listdir(out_i2)) == sorted(os.listdir(out_i))

    with pytest.raises(ValueError):
        pred.predict_sequence(
            str(seq), out_m2, out_i2, temporal_bidi=True
        )


def test_refine_backward_splits_early_frames():
    """Frame 0 is a merged blob, frame 1 has the two cells separate: the
    FORWARD pass leaves frame 0 merged (no history), the backward sweep
    splits it from frame 1's instances."""
    from unetseg_tpu.post.temporal import refine_backward

    shape = (64, 96)
    f0 = np.zeros(shape, np.uint8)
    f0[16:48, 12:80] = 1  # merged blob, single distance ridge
    f1 = np.zeros(shape, np.uint8)
    f1[16:48, 12:42] = 1
    f1[16:48, 50:80] = 1  # separated
    binaries = [f0, f1]
    fwd = []
    prev = None
    for b in binaries:
        inst = temporal_instance_masks(
            b, prev, min_size=5, min_overlap=100, backend="python"
        )
        fwd.append(inst)
        prev = inst
    assert len(set(np.unique(fwd[0])) - {0}) == 1  # forward: merged
    assert len(set(np.unique(fwd[1])) - {0}) == 2

    out = refine_backward(
        binaries, fwd, min_size=5, min_overlap=100, backend="python"
    )
    assert len(set(np.unique(out[0])) - {0}) == 2  # backward: split
    assert out[0][32, 20] != out[0][32, 70]
    assert ((out[0] > 0) == (f0 > 0)).all()  # coverage preserved
    np.testing.assert_array_equal(out[1], fwd[1])  # later frame untouched


def test_refine_backward_never_merges():
    """A frame whose forward result is MORE split than its successor must
    keep its forward labels (strictly-more-pieces adoption only)."""
    from unetseg_tpu.post.temporal import refine_backward

    shape = (64, 96)
    b_split = np.zeros(shape, np.uint8)
    b_split[16:48, 12:42] = 1
    b_split[16:48, 50:80] = 1
    b_merged = np.zeros(shape, np.uint8)
    b_merged[16:48, 12:80] = 1
    binaries = [b_split, b_merged]
    fwd = []
    prev = None
    for b in binaries:
        inst = temporal_instance_masks(
            b, prev, min_size=5, min_overlap=100, backend="python"
        )
        fwd.append(inst)
        prev = inst
    assert len(set(np.unique(fwd[0])) - {0}) == 2
    out = refine_backward(
        binaries, fwd, min_size=5, min_overlap=100, backend="python"
    )
    # frame 0 keeps its two instances even though frame 1 has one
    assert len(set(np.unique(out[0])) - {0}) == 2
