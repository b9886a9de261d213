"""Data-parallel lanes training step (parallel/sharding.py
make_lanes_dp_train_step): shard_map over the 8-virtual-device CPU mesh
must reproduce the single-device lanes step exactly — global BN statistics,
global loss normalization, psummed gradients (interpret-mode kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu.core.config import MeshConfig, ModelConfig, TrainConfig
from unetseg_tpu.core.mesh import make_mesh
from unetseg_tpu.models.unet import UNet
from unetseg_tpu.parallel.sharding import (
    make_lanes_dp_train_step,
    replicate_state,
    shard_batch,
)
from unetseg_tpu.train.state import create_train_state
from unetseg_tpu.train.steps import make_train_step

CFG = ModelConfig(compute_dtype="float32", base_features=4)
SIZE = 188


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(MeshConfig(data_parallel=8))
    model = UNet(cfg=CFG)
    state = create_train_state(
        jax.random.key(0), model_cfg=CFG, train_cfg=TrainConfig(),
        input_size=SIZE, model=model,
    )
    return mesh, model, state


def _batch(b=8, seed=0, n_valid=None):
    rs = np.random.RandomState(seed)
    valid = np.ones((b,), bool)
    if n_valid is not None:
        valid[n_valid:] = False
    return (
        rs.rand(b, SIZE, SIZE).astype(np.float32),
        (rs.rand(b, SIZE, SIZE) > 0.6).astype(np.int32),
        rs.rand(b, SIZE, SIZE).astype(np.float32) + 0.5,
        valid,
    )


def _single_lanes_step(model, state, batch, key):
    """Reference: the single-device lanes step (interpret kernels)."""
    step = make_train_step(
        model, augment=False, donate=False, lanes=True, jit=False
    )
    # patch interpret mode in: call the un-jitted step with the lanes
    # forward forced to interpret kernels via the module-level flag
    import unetseg_tpu.models.lanes_train as lt

    orig = lt.train_forward_lanes

    def interp_fwd(params, batch_stats, x, cfg, item_mask=None,
                   interpret=False, axis_name=None):
        return orig(params, batch_stats, x, cfg, item_mask=item_mask,
                    interpret=True, axis_name=axis_name)

    lt.train_forward_lanes = interp_fwd
    try:
        import unetseg_tpu.train.steps as steps_mod

        s1, m1 = step(state, *map(jnp.asarray, batch), key)
    finally:
        lt.train_forward_lanes = orig
    return s1, m1


@pytest.mark.parametrize("n_valid", [None, 5])
def test_dp_lanes_step_matches_single_device(setup, n_valid):
    mesh, model, state = setup
    batch = _batch(n_valid=n_valid)
    key = jax.random.key(1)

    s1, m1 = _single_lanes_step(model, state, batch, key)

    dp = make_lanes_dp_train_step(
        mesh, CFG, augment=False, donate=False, interpret=True
    )
    st = replicate_state(mesh, state)
    b = shard_batch(mesh, *batch)
    s2, m2 = dp(st, *b, key)

    assert np.isfinite(float(m2["loss"]))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), atol=1e-6, rtol=1e-6
    )
    flat1 = jax.tree_util.tree_leaves_with_path(s1.params)
    flat2 = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(s2.params)
    )
    for k, v in flat1:
        np.testing.assert_allclose(
            np.asarray(flat2[jax.tree_util.keystr(k)]), np.asarray(v),
            atol=2e-5, rtol=1e-5, err_msg=jax.tree_util.keystr(k),
        )
    # updated BN running stats must match too (global-moments psum path)
    bs1 = jax.tree_util.tree_leaves_with_path(s1.batch_stats)
    bs2 = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(s2.batch_stats)
    )
    for k, v in bs1:
        np.testing.assert_allclose(
            np.asarray(bs2[jax.tree_util.keystr(k)]), np.asarray(v),
            atol=1e-5, rtol=1e-5, err_msg=jax.tree_util.keystr(k),
        )


def test_dp_lanes_step_augmented_runs(setup):
    """Augmented DP step (elastic+photometric outside shard_map) executes
    and produces finite loss/grads."""
    mesh, model, state = setup
    batch = _batch()
    dp = make_lanes_dp_train_step(
        mesh, CFG, augment=True, aug_gamma=0.3, aug_illum=0.1,
        aug_noise=0.05, standardize=True, donate=False, interpret=True,
    )
    st = replicate_state(mesh, state)
    b = shard_batch(mesh, *batch)
    s2, m2 = dp(st, *b, jax.random.key(3))
    assert np.isfinite(float(m2["loss"]))
    assert np.isfinite(float(m2["grad_norm"]))


def test_dp_lanes_epoch_scan_matches_per_step(setup):
    """make_lanes_dp_epoch_step (scan feed) == two sequential DP steps."""
    from unetseg_tpu.parallel.sharding import make_lanes_dp_epoch_step

    mesh, model, state = setup
    rs = np.random.RandomState(3)
    n_frames, b = 16, 8
    images = rs.rand(n_frames, SIZE, SIZE).astype(np.float32)
    masks = (rs.rand(n_frames, SIZE, SIZE) > 0.6).astype(np.int32)
    wmaps = rs.rand(n_frames, SIZE, SIZE).astype(np.float32) + 0.5
    idx = np.arange(n_frames, dtype=np.int32).reshape(2, b)
    vmat = np.ones((2, b), bool)
    key = jax.random.key(7)

    # reference: the jitted per-step DP path with matching fold_in keys
    dp = make_lanes_dp_train_step(
        mesh, CFG, augment=False, donate=False, interpret=True
    )
    st_ref = replicate_state(mesh, state)
    for s in range(2):
        batch = shard_batch(
            mesh, images[idx[s]], masks[idx[s]], wmaps[idx[s]], vmat[s]
        )
        st_ref, m_ref = dp(st_ref, *batch, jax.random.fold_in(key, s))

    epoch = make_lanes_dp_epoch_step(
        mesh, CFG, donate=False, augment=False, interpret=True
    )
    repl = mesh.replicated()
    st2, ms = epoch(
        replicate_state(mesh, state),
        jax.device_put(images, repl), jax.device_put(masks, repl),
        jax.device_put(wmaps, repl), idx, vmat, key,
    )
    np.testing.assert_allclose(
        float(ms["loss"][-1]), float(m_ref["loss"]), atol=1e-6, rtol=1e-6
    )
    p_ref = jax.tree_util.tree_leaves(st_ref.params)
    p_scan = jax.tree_util.tree_leaves(st2.params)
    for a, bb in zip(p_scan, p_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=2e-5, rtol=1e-5
        )
