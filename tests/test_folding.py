"""BatchNorm folding parity: folded inference net == training net in eval
mode, up to compute-dtype tolerance."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unetseg_tpu.core.config import InferConfig, ModelConfig
from unetseg_tpu.infer.engine import Predictor
from unetseg_tpu.infer.folding import fold_batchnorm
from unetseg_tpu.models.unet import UNet, init_unet

TINY = ModelConfig(compute_dtype="float32", base_features=4)
SIZE = 188


@pytest.fixture(scope="module")
def trained_like_variables():
    """Variables with non-trivial BN stats (as after training)."""
    model = UNet(cfg=TINY)
    v = init_unet(model, jax.random.key(0), input_size=SIZE)
    # run a few train-mode passes so batch_stats move away from init
    x = jax.random.normal(jax.random.key(1), (2, SIZE, SIZE, 1))
    for i in range(3):
        _, upd = model.apply(v, x + i * 0.1, train=True, mutable=["batch_stats"])
        v = {"params": v["params"], "batch_stats": upd["batch_stats"]}
    return model, v


def test_folded_matches_eval_forward(trained_like_variables):
    model, v = trained_like_variables
    x = jax.random.normal(jax.random.key(2), (1, SIZE, SIZE, 1))
    ref = model.apply(v, x, train=False)
    fmodel, fvars = fold_batchnorm(TINY, v)
    out = fmodel.apply(fvars, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_folded_bf16_close_to_fp32_eval(trained_like_variables):
    model, v = trained_like_variables
    bf16_cfg = ModelConfig(compute_dtype="bfloat16", base_features=4)
    x = jax.random.normal(jax.random.key(3), (1, SIZE, SIZE, 1))
    ref = model.apply(v, x, train=False)
    fmodel, fvars = fold_batchnorm(bf16_cfg, v)
    out = fmodel.apply(fvars, x)
    # bf16 has ~3 decimal digits; logits should still agree coarsely
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=0.15)


def test_folded_packed_matches_unpacked(trained_like_variables):
    """use_packed width-packing changes the schedule, not the math."""
    model, v = trained_like_variables
    x = jax.random.normal(jax.random.key(7), (1, SIZE, SIZE, 1))
    fm0, fv0 = fold_batchnorm(TINY, v, use_packed=False)
    fm1, fv1 = fold_batchnorm(TINY, v, use_packed=True)
    a = np.asarray(fm0.apply(fv0, x))
    b = np.asarray(fm1.apply(fv1, x))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_predictor_fold_on_off_agree(trained_like_variables):
    model, v = trained_like_variables
    cfg = InferConfig(image_size=SIZE, tile_input=SIZE, tile_batch=4)
    p_fold = Predictor(model=model, params=v["params"],
                       batch_stats=v["batch_stats"], cfg=cfg, fold=True)
    p_raw = Predictor(model=model, params=v["params"],
                      batch_stats=v["batch_stats"], cfg=cfg, fold=False)
    img = np.random.RandomState(0).rand(SIZE, SIZE).astype(np.float32)
    a = np.asarray(p_fold.probs(img[None]))
    b = np.asarray(p_raw.probs(img[None]))
    np.testing.assert_allclose(a, b, atol=1e-4)
    # tiled path too
    at = p_fold.probs_tiled(np.random.RandomState(1).rand(20, 20).astype(np.float32))
    bt = p_raw.probs_tiled(np.random.RandomState(1).rand(20, 20).astype(np.float32))
    np.testing.assert_allclose(at, bt, atol=1e-4)
