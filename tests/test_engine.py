"""Inference engine tests with a tiny real U-Net on CPU."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from unetseg_tpu.core.config import InferConfig, ModelConfig
from unetseg_tpu.data.io import read_image
from unetseg_tpu.infer.engine import Predictor, load_image_01
from unetseg_tpu.models.unet import UNet, init_unet

TINY = ModelConfig(compute_dtype="float32", base_features=4)
SIZE = 188  # net output 4


@pytest.fixture(scope="module")
def predictor():
    model = UNet(cfg=TINY)
    v = init_unet(model, jax.random.key(0), input_size=SIZE)
    return Predictor(
        model=model,
        params=v["params"],
        batch_stats=v["batch_stats"],
        cfg=InferConfig(image_size=SIZE, tile_input=SIZE, tile_batch=4, min_cell_size=1),
    )


def test_probs_shape_and_range(predictor):
    imgs = np.random.RandomState(0).rand(2, SIZE, SIZE).astype(np.float32)
    p = np.asarray(predictor.probs(imgs))
    assert p.shape == (2, 4, 4)
    assert (p >= 0).all() and (p <= 1).all()


def test_predict_image_binary(predictor):
    img = np.random.RandomState(1).rand(SIZE, SIZE).astype(np.float32)
    m = predictor.predict_image(img)
    assert m.shape == (4, 4)
    assert set(np.unique(m)) <= {0, 1}


def test_probs_tiled_full_resolution(predictor):
    img = np.random.RandomState(2).rand(50, 70).astype(np.float32)
    p = predictor.probs_tiled(img)
    assert p.shape == (50, 70)
    assert np.isfinite(p).all()


def test_probs_tiled_deterministic(predictor):
    img = np.random.RandomState(3).rand(30, 30).astype(np.float32)
    a = predictor.probs_tiled(img)
    b = predictor.probs_tiled(img)
    np.testing.assert_array_equal(a, b)


def test_masks_tiled_matches_per_frame(predictor):
    """The frame-batched device-threshold path == per-frame probs_tiled +
    host threshold, bit for bit."""
    imgs = np.random.RandomState(4).rand(3, 50, 70).astype(np.float32)
    batched = predictor.masks_tiled(imgs)
    assert batched.shape == (3, 50, 70) and batched.dtype == np.uint8
    for k in range(3):
        ref = (
            predictor.probs_tiled(imgs[k]) > predictor.cfg.threshold
        ).astype(np.uint8)
        np.testing.assert_array_equal(batched[k], ref)


def test_masks_tiled_tta_flips(predictor):
    """TTA 'flips' runs and is itself flip-consistent: predicting a flipped
    batch returns the flipped prediction (the transform set is closed
    under flips)."""
    import dataclasses

    pred = dataclasses.replace(predictor, cfg=dataclasses.replace(
        predictor.cfg, tta="flips"
    ))
    imgs = np.random.RandomState(5).rand(2, 40, 40).astype(np.float32)
    m = pred.masks_tiled(imgs)
    m_flipped = pred.masks_tiled(imgs[:, ::-1].copy())
    np.testing.assert_array_equal(m[:, ::-1], m_flipped)


def test_merge_tta_probs_semantics():
    """Unit semantics of every merge mode on hand-built probability sets."""
    import jax.numpy as jnp

    from unetseg_tpu.infer.tiling import merge_tta_probs

    # 4 transforms; one pixel with a dissenting near-zero vote (a membrane
    # seen by one flip), one solid-foreground, one solid-background
    probs = [
        jnp.asarray([[0.9, 0.8, 0.1]]),
        jnp.asarray([[0.9, 0.8, 0.1]]),
        jnp.asarray([[0.9, 0.8, 0.1]]),
        jnp.asarray([[0.01, 0.8, 0.1]]),
    ]
    t = 0.5
    mean = np.asarray(merge_tta_probs(probs, t, "mean"))[0]
    gmean = np.asarray(merge_tta_probs(probs, t, "gmean"))[0]
    vote = np.asarray(merge_tta_probs(probs, t, "vote"))[0]
    mx = np.asarray(merge_tta_probs(probs, t, "max"))[0]
    # mean smooths over the dissent: (0.9*3+0.01)/4 = 0.68 > 0.5 -> fg
    assert mean.tolist() == [1, 1, 0]
    # gmean respects the near-zero vote: (0.9^3*0.01)^0.25 = 0.29 -> bg
    assert gmean.tolist() == [0, 1, 0]
    # vote: 3/4 strict majority -> fg on pixel 0
    assert vote.tolist() == [1, 1, 0]
    # max is the union
    assert mx.tolist() == [1, 1, 0]
    with pytest.raises(ValueError):
        merge_tta_probs(probs, t, "median")


@pytest.mark.parametrize("merge", ["gmean", "vote", "max"])
def test_masks_tiled_tta_merge_modes(predictor, merge):
    """Every merge mode runs through the batched tiled path and stays
    flip-consistent (the transform set is closed under flips)."""
    import dataclasses

    pred = dataclasses.replace(predictor, cfg=dataclasses.replace(
        predictor.cfg, tta="flips", tta_merge=merge
    ))
    imgs = np.random.RandomState(6).rand(2, 40, 40).astype(np.float32)
    m = pred.masks_tiled(imgs)
    assert m.shape == (2, 40, 40) and set(np.unique(m)) <= {0, 1}
    m_flipped = pred.masks_tiled(imgs[:, ::-1].copy())
    np.testing.assert_array_equal(m[:, ::-1], m_flipped)


def test_predict_sequence_outputs(predictor, tmp_path):
    seq = tmp_path / "01"
    seq.mkdir()
    rs = np.random.RandomState(4)
    for i in range(3):
        Image.fromarray((rs.rand(SIZE, SIZE) * 255).astype(np.uint8)).save(
            seq / f"t{i:03d}.tif"
        )
    masks_dir = str(tmp_path / "01_RES")
    inst_dir = str(tmp_path / "01_RES_INST")
    written = predictor.predict_sequence(str(seq), masks_dir, inst_dir, batch_size=2)
    assert sorted(os.listdir(masks_dir)) == ["mask000.tif", "mask001.tif", "mask002.tif"]
    assert sorted(os.listdir(inst_dir)) == ["m000.tif", "m001.tif", "m002.tif"]
    m = read_image(os.path.join(masks_dir, "mask000.tif"))
    assert m.dtype == np.uint8 and set(np.unique(m)) <= {0, 255}
    assert m.shape == (4, 4)  # net output size, like the reference's 324
    inst = read_image(os.path.join(inst_dir, "m000.tif"))
    assert np.asarray(inst).dtype in (np.uint16, np.int32)


def test_predict_sequence_resize_output(predictor, tmp_path):
    seq = tmp_path / "01"
    seq.mkdir()
    Image.fromarray(
        (np.random.RandomState(5).rand(SIZE, SIZE) * 255).astype(np.uint8)
    ).save(seq / "t000.tif")
    predictor.predict_sequence(
        str(seq), str(tmp_path / "R"), str(tmp_path / "RI"), resize_output_to=SIZE
    )
    m = read_image(str(tmp_path / "R" / "mask000.tif"))
    assert m.shape == (SIZE, SIZE)


def test_predict_sequence_device_cc_matches_host(predictor, tmp_path):
    """--device-cc must produce byte-identical outputs to the host scipy CC
    path, with and without --resize-output."""
    seq = tmp_path / "01"
    seq.mkdir()
    rs = np.random.RandomState(6)
    for i in range(3):
        Image.fromarray((rs.rand(SIZE, SIZE) * 255).astype(np.uint8)).save(
            seq / f"t{i:03d}.tif"
        )
    for resize in (None, SIZE):
        tag = f"r{resize}"
        predictor.predict_sequence(
            str(seq), str(tmp_path / f"H{tag}"), str(tmp_path / f"HI{tag}"),
            batch_size=2, resize_output_to=resize,
        )
        predictor.predict_sequence(
            str(seq), str(tmp_path / f"D{tag}"), str(tmp_path / f"DI{tag}"),
            batch_size=2, resize_output_to=resize, device_cc=True,
        )
        for i in range(3):
            mh = read_image(str(tmp_path / f"H{tag}" / f"mask{i:03d}.tif"))
            md = read_image(str(tmp_path / f"D{tag}" / f"mask{i:03d}.tif"))
            np.testing.assert_array_equal(mh, md)
            ih = read_image(str(tmp_path / f"HI{tag}" / f"m{i:03d}.tif"))
            idv = read_image(str(tmp_path / f"DI{tag}" / f"m{i:03d}.tif"))
            np.testing.assert_array_equal(ih, idv)


def test_predict_sequence_device_cc_rejects_tiled(predictor, tmp_path):
    seq = tmp_path / "01"
    seq.mkdir()
    Image.fromarray(np.zeros((SIZE, SIZE), np.uint8)).save(seq / "t000.tif")
    with pytest.raises(ValueError):
        predictor.predict_sequence(
            str(seq), str(tmp_path / "a"), str(tmp_path / "b"),
            tiled=True, device_cc=True,
        )


def test_predict_sequence_empty_dir_raises(predictor, tmp_path):
    with pytest.raises(FileNotFoundError):
        predictor.predict_sequence(str(tmp_path), str(tmp_path / "a"), str(tmp_path / "b"))


def test_load_image_01_resize(tmp_path):
    p = str(tmp_path / "t000.tif")
    Image.fromarray((np.eye(10) * 255).astype(np.uint8)).save(p)
    x = load_image_01(p, image_size=20)
    assert x.shape == (20, 20)
    assert x.max() <= 1.0


def test_masks_tiled_tta_flips8(predictor):
    """Full D4 TTA: runs, is transpose-consistent on square inputs, and
    rejects non-square frames."""
    import dataclasses

    pred = dataclasses.replace(predictor, cfg=dataclasses.replace(
        predictor.cfg, tta="flips8", tta_merge="vote"
    ))
    imgs = np.random.RandomState(7).rand(2, 40, 40).astype(np.float32)
    m = pred.masks_tiled(imgs)
    assert m.shape == (2, 40, 40)
    # the transform set is closed under transpose AND flips
    m_t = pred.masks_tiled(np.ascontiguousarray(imgs.transpose(0, 2, 1)))
    np.testing.assert_array_equal(np.transpose(m, (0, 2, 1)), m_t)
    m_f = pred.masks_tiled(imgs[:, ::-1].copy())
    np.testing.assert_array_equal(m[:, ::-1], m_f)
    with pytest.raises(ValueError):
        pred.masks_tiled(np.zeros((1, 40, 50), np.float32))


@pytest.mark.parametrize(
    "kw",
    [{"tta": "flipz"}, {"tta_merge": "median"}, {"ensemble_merge": "max"}],
)
def test_bad_merge_config_fails_at_construction(kw):
    # a bad tta/merge string must fail when the Predictor is built, not
    # with a KeyError deep inside the first tiled predict
    model = UNet(cfg=TINY)
    v = init_unet(model, jax.random.key(0), input_size=SIZE)
    with pytest.raises(ValueError, match=next(iter(kw))):
        Predictor(
            model=model, params=v["params"], batch_stats=v["batch_stats"],
            cfg=InferConfig(image_size=SIZE, tile_input=SIZE, **kw),
        )
