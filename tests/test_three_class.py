"""3-class (bg/interior/border) mode: target construction, train/eval steps,
instance expansion, and the end-to-end predict path on a tiny net."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unetseg_tpu.core.config import InferConfig, ModelConfig, TrainConfig
from unetseg_tpu.infer.engine import Predictor
from unetseg_tpu.models.unet import UNet, init_unet
from unetseg_tpu.post.watershed import expand_markers
from unetseg_tpu.train.state import create_train_state
from unetseg_tpu.train.steps import make_eval_step, make_train_step, three_class_targets

SIZE = 188
TINY3 = ModelConfig(compute_dtype="float32", base_features=4, num_classes=3)


def test_three_class_targets_geometry():
    m = np.zeros((1, 20, 20), np.int32)
    m[0, 4:10, 4:16] = 1
    m[0, 10:16, 4:16] = 2  # touching below
    t = np.asarray(three_class_targets(jnp.asarray(m), halo=1))
    assert set(np.unique(t)) == {0, 1, 2}
    # deep interior of cell 1
    assert t[0, 6, 8] == 1
    # contact row between the cells -> border
    assert t[0, 9, 8] == 2 and t[0, 10, 8] == 2
    # outer rim -> border
    assert t[0, 4, 8] == 2
    # background stays 0
    assert t[0, 0, 0] == 0


def test_three_class_targets_isolated_cell_keeps_interior():
    m = np.zeros((1, 16, 16), np.int32)
    m[0, 4:12, 4:12] = 5
    t = np.asarray(three_class_targets(jnp.asarray(m), halo=1))
    assert (t[0, 6:10, 6:10] == 1).all()


def test_train_and_eval_step_three_class():
    model = UNet(cfg=TINY3)
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY3, train_cfg=TrainConfig(),
        input_size=SIZE, model=model,
    )
    rs = np.random.RandomState(0)
    images = rs.rand(2, SIZE, SIZE).astype(np.float32)
    masks = np.zeros((2, SIZE, SIZE), np.int32)
    masks[:, 40:90, 40:90] = 1
    masks[:, 90:140, 40:90] = 2
    weights = np.ones((2, SIZE, SIZE), np.float32)
    valid = np.ones((2,), bool)
    step = make_train_step(model, augment=False, donate=False, three_class=True)
    state, m = step(state, images, masks, weights, valid, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    estep = make_eval_step(model, three_class=True)
    em = estep(state, images, masks, valid)
    assert 0.0 <= float(em["val_iou"]) <= 1.0


def test_expand_markers_splits_and_covers():
    fg = np.zeros((30, 30), np.uint8)
    fg[5:25, 5:25] = 1
    interior = np.zeros((30, 30), np.uint8)
    interior[8:12, 8:12] = 1
    interior[18:22, 18:22] = 1
    inst = expand_markers(fg, interior, min_size=5, backend="python")
    ids = set(np.unique(inst)) - {0}
    assert len(ids) == 2
    assert ((inst > 0) == (fg > 0)).all()


def test_predict_sequence_three_class(tmp_path):
    from PIL import Image

    model = UNet(cfg=TINY3)
    v = init_unet(model, jax.random.key(0), input_size=SIZE)
    pred = Predictor(
        model=model, params=v["params"], batch_stats=v["batch_stats"],
        cfg=InferConfig(image_size=SIZE, tile_input=SIZE, min_cell_size=1),
    )
    seq = tmp_path / "01"
    seq.mkdir()
    Image.fromarray(
        (np.random.RandomState(1).rand(SIZE, SIZE) * 255).astype(np.uint8)
    ).save(seq / "t000.tif")
    written = pred.predict_sequence(
        str(seq), str(tmp_path / "R"), str(tmp_path / "RI")
    )
    m = np.array(Image.open(tmp_path / "R" / "mask000.tif"))
    assert m.shape == (4, 4)


def test_predict_sequence_three_class_resize_output(tmp_path):
    """Regression: three-class + resize_output_to crashed because the interior
    marker map stayed at net-output size while the mask was resized."""
    from PIL import Image

    model = UNet(cfg=TINY3)
    v = init_unet(model, jax.random.key(0), input_size=SIZE)
    pred = Predictor(
        model=model, params=v["params"], batch_stats=v["batch_stats"],
        cfg=InferConfig(image_size=SIZE, tile_input=SIZE, min_cell_size=1),
    )
    seq = tmp_path / "01"
    seq.mkdir()
    Image.fromarray(
        (np.random.RandomState(1).rand(SIZE, SIZE) * 255).astype(np.uint8)
    ).save(seq / "t000.tif")
    pred.predict_sequence(
        str(seq), str(tmp_path / "R"), str(tmp_path / "RI"),
        resize_output_to=SIZE,
    )
    m = np.array(Image.open(tmp_path / "R" / "mask000.tif"))
    inst = np.array(Image.open(tmp_path / "RI" / "m000.tif"))
    assert m.shape == (SIZE, SIZE) and inst.shape == (SIZE, SIZE)
