"""Serving export (infer/export.py): jax.export round-trip parity.

The artifact must be callable with only jax (no flax/model code), support a
symbolic batch dimension, and reproduce Predictor.probs bit-for-bit on the
same backend. (The reference has no deployment story — consumers re-import
training code and torch.load a state dict, reference: scripts/predict.py:
120-123.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu.core.config import InferConfig, ModelConfig
from unetseg_tpu.infer.export import (
    export_inference,
    load_exported,
    make_serving_fn,
    save_exported,
)
from unetseg_tpu.models.unet import UNet, init_unet

CFG = ModelConfig(base_features=4)
ICFG = InferConfig(image_size=188, normalize=True)


@pytest.fixture(scope="module")
def tiny_variables():
    model = UNet(cfg=CFG)
    return init_unet(model, jax.random.key(0), input_size=188)


def test_export_roundtrip_parity(tmp_path, tiny_variables):
    data = export_inference(
        CFG, tiny_variables, ICFG, batch=None, platforms=("cpu",)
    )
    path = str(tmp_path / "art.bin")
    save_exported(path, data)
    fn = load_exported(path)
    x = np.random.RandomState(0).rand(3, 188, 188).astype(np.float32)
    got = np.asarray(fn(x))
    ref = np.asarray(make_serving_fn(CFG, tiny_variables, ICFG)(jnp.asarray(x)))
    assert got.shape == (3, 4, 4)
    np.testing.assert_array_equal(got, ref)


def test_export_symbolic_batch(tmp_path, tiny_variables):
    data = export_inference(
        CFG, tiny_variables, ICFG, batch=None, platforms=("cpu",)
    )
    path = str(tmp_path / "art.bin")
    save_exported(path, data)
    fn = load_exported(path)
    # one artifact serves several batch sizes
    for b in (1, 2, 5):
        out = fn(np.zeros((b, 188, 188), np.float32))
        assert out.shape == (b, 4, 4)


def test_export_pinned_batch(tmp_path, tiny_variables):
    data = export_inference(
        CFG, tiny_variables, ICFG, batch=2, platforms=("cpu",)
    )
    path = str(tmp_path / "art.bin")
    save_exported(path, data)
    fn = load_exported(path)
    assert fn(np.zeros((2, 188, 188), np.float32)).shape == (2, 4, 4)
    with pytest.raises(Exception):
        fn(np.zeros((3, 188, 188), np.float32))


def test_export_probabilities_are_valid(tmp_path, tiny_variables):
    data = export_inference(
        CFG, tiny_variables, ICFG, batch=1, platforms=("cpu",)
    )
    path = str(tmp_path / "a.bin")
    save_exported(path, data)
    fn = load_exported(path)
    p = np.asarray(fn(np.random.RandomState(1).rand(1, 188, 188).astype(np.float32)))
    assert np.all(p >= 0) and np.all(p <= 1)
