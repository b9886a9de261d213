"""Parameter EMA (TrainConfig.ema_decay): recurrence math, checkpoint
save/restore of the shadow, resume seeding, and the --ema inference path.

Motivation: the recipe's seq-02 SEG spreads +-0.03 across retrains
(docs/RESULTS.md round 7) — weight averaging is the standard variance
reducer; the shadow rides in the train state so every step factory
(single-device, epoch scan, shard_map DP) updates it via
TrainState.apply_gradients with no per-factory wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu.core.config import ModelConfig, TrainConfig
from unetseg_tpu.train import checkpoint as ckpt
from unetseg_tpu.train.state import create_train_state
from unetseg_tpu.train.steps import make_train_step
from unetseg_tpu.models.unet import UNet

TINY = ModelConfig(compute_dtype="float32", base_features=4)
SIZE = 188
EMA = TrainConfig(ema_decay=0.9, learning_rate=0.05)


def _batch(rs):
    imgs = jnp.asarray(rs.rand(2, SIZE, SIZE), jnp.float32)
    masks = jnp.asarray((rs.rand(2, SIZE, SIZE) > 0.6), jnp.int32)
    wmaps = jnp.ones((2, SIZE, SIZE), jnp.float32)
    valid = jnp.ones((2,), bool)
    return imgs, masks, wmaps, valid


def test_ema_recurrence_matches_manual():
    model = UNet(cfg=TINY)
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY, train_cfg=EMA,
        input_size=SIZE, model=model,
    )
    assert state.ema_params is not None
    step = make_train_step(model, augment=False, donate=False)
    rs = np.random.RandomState(0)
    batch = _batch(rs)

    leaf = lambda st: np.asarray(
        jax.tree.leaves(st.params)[0], np.float64
    )
    eleaf = lambda st: np.asarray(
        jax.tree.leaves(st.ema_params)[0], np.float64
    )
    ema_manual = eleaf(state)
    for i in range(3):
        state, _ = step(state, *batch, jax.random.key(i))
        t = float(state.step)
        d = min(0.9, (1.0 + t) / (10.0 + t))
        ema_manual = ema_manual + (1.0 - d) * (leaf(state) - ema_manual)
        np.testing.assert_allclose(eleaf(state), ema_manual, rtol=1e-5)
    # shadow must differ from raw params (it is an average, not a copy)
    assert not np.allclose(eleaf(state), leaf(state))


def test_ema_off_keeps_state_shape():
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY, train_cfg=TrainConfig(),
        input_size=SIZE,
    )
    assert state.ema_params is None and state.ema_batch_stats is None


def test_light_roundtrip_with_ema(tmp_path):
    model = UNet(cfg=TINY)
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY, train_cfg=EMA,
        input_size=SIZE, model=model,
    )
    step = make_train_step(model, augment=False, donate=False)
    state, _ = step(state, *_batch(np.random.RandomState(0)), jax.random.key(0))
    d = str(tmp_path / "c")
    ckpt.save_checkpoint(d, state, epoch=0, val_loss=0.5)

    template = create_train_state(
        jax.random.key(1), model_cfg=TINY, train_cfg=EMA, input_size=SIZE,
    )
    raw, _ = ckpt.restore_params_for_inference(d, template)
    ema, _ = ckpt.restore_params_for_inference(d, template, ema=True)
    want_raw = jax.tree.leaves(state.params)[0]
    want_ema = jax.tree.leaves(state.ema_params)[0]
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(raw)[0]),
        np.asarray(want_raw, np.float32), atol=1e-2,
    )  # bf16 light shadow
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(ema)[0]),
        np.asarray(want_ema, np.float32), atol=1e-2,
    )
    # and the two are genuinely different weight sets
    assert not np.allclose(
        np.asarray(jax.tree.leaves(raw)[0]),
        np.asarray(jax.tree.leaves(ema)[0]),
    )


def test_full_resume_restores_ema(tmp_path):
    model = UNet(cfg=TINY)
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY, train_cfg=EMA,
        input_size=SIZE, model=model,
    )
    step = make_train_step(model, augment=False, donate=False)
    state, _ = step(state, *_batch(np.random.RandomState(0)), jax.random.key(0))
    d = str(tmp_path / "c")
    ckpt.save_checkpoint(d, state, epoch=3, val_loss=0.4)

    template = create_train_state(
        jax.random.key(1), model_cfg=TINY, train_cfg=EMA, input_size=SIZE,
    )
    restored, epoch, _ = ckpt.restore_checkpoint(d, template)
    assert epoch == 3
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.ema_params)[0]),
        np.asarray(jax.tree.leaves(state.ema_params)[0]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.ema_batch_stats)[0]),
        np.asarray(jax.tree.leaves(state.ema_batch_stats)[0]), rtol=1e-6,
    )


def test_pre_ema_checkpoint_seeds_shadow_on_resume(tmp_path):
    # a checkpoint written WITHOUT ema restored into an EMA run: the shadow
    # restarts at the restored raw weights instead of failing
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY, train_cfg=TrainConfig(),
        input_size=SIZE,
    )
    d = str(tmp_path / "c")
    ckpt.save_checkpoint(d, state, epoch=0, val_loss=0.5)
    template = create_train_state(
        jax.random.key(1), model_cfg=TINY, train_cfg=EMA, input_size=SIZE,
    )
    restored, _, _ = ckpt.restore_checkpoint(d, template)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.ema_params)[0]),
        np.asarray(jax.tree.leaves(restored.params)[0]),
    )


def test_ema_restore_from_non_ema_checkpoint_errors(tmp_path):
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY, train_cfg=TrainConfig(),
        input_size=SIZE,
    )
    d = str(tmp_path / "c")
    ckpt.save_checkpoint(d, state, epoch=0, val_loss=0.5)
    template = create_train_state(
        jax.random.key(1), model_cfg=TINY, train_cfg=TrainConfig(),
        input_size=SIZE,
    )
    with pytest.raises(FileNotFoundError, match="no EMA shadow"):
        ckpt.restore_params_for_inference(d, template, ema=True)


def test_epoch_scan_updates_ema():
    # the device-resident epoch-scan feed (the production path) must carry
    # the shadow through lax.scan
    from unetseg_tpu.train.steps import make_epoch_train_step

    model = UNet(cfg=TINY)
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY, train_cfg=EMA,
        input_size=SIZE, model=model,
    )
    ema0 = np.asarray(jax.tree.leaves(state.ema_params)[0]).copy()
    epoch_step = make_epoch_train_step(model, donate=False, augment=False)
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(4, SIZE, SIZE), jnp.float32)
    masks = jnp.asarray((rs.rand(4, SIZE, SIZE) > 0.6), jnp.int32)
    wmaps = jnp.ones((4, SIZE, SIZE), jnp.float32)
    idx = np.arange(4, dtype=np.int32).reshape(2, 2)
    vmat = np.ones((2, 2), bool)
    state, ms = epoch_step(
        state, imgs, masks, wmaps, idx, vmat, jax.random.key(1)
    )
    assert np.isfinite(np.asarray(ms["loss"])).all()
    ema1 = np.asarray(jax.tree.leaves(state.ema_params)[0])
    assert not np.allclose(ema0, ema1)


def test_ensemble_raw_plus_ema_members(tmp_path):
    # ema="both": two members per checkpoint dir (raw + EMA shadow)
    from unetseg_tpu.core.config import InferConfig
    from unetseg_tpu.infer.engine import Predictor

    model = UNet(cfg=TINY)
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY, train_cfg=EMA,
        input_size=SIZE, model=model,
    )
    step = make_train_step(model, augment=False, donate=False)
    state, _ = step(state, *_batch(np.random.RandomState(0)), jax.random.key(0))
    dirs = []
    for i in range(2):
        d = str(tmp_path / f"c{i}")
        ckpt.save_checkpoint(d, state, epoch=0, val_loss=0.5)
        dirs.append(d)
    pred = Predictor.from_checkpoints(
        dirs, model_cfg=TINY,
        infer_cfg=InferConfig(image_size=SIZE, tile_input=SIZE, min_cell_size=1),
        ema="both",
    )
    assert isinstance(pred.params, list) and len(pred.params) == 4
    # raw and EMA members genuinely differ
    a = np.asarray(jax.tree.leaves(pred.params[0])[0])
    b = np.asarray(jax.tree.leaves(pred.params[1])[0])
    assert not np.allclose(a, b)
    imgs = np.random.RandomState(0).rand(1, SIZE, SIZE).astype(np.float32)
    p = np.asarray(pred.probs(imgs))
    assert p.shape == (1, 4, 4) and np.isfinite(p).all()


def test_ema_restore_from_full_only_epoch(tmp_path):
    # an epoch that exists ONLY in the full resume stream (full_save_interval
    # cadence) must still serve its EMA shadow to predict --ema
    model = UNet(cfg=TINY)
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY, train_cfg=EMA,
        input_size=SIZE, model=model,
    )
    step = make_train_step(model, augment=False, donate=False)
    state, _ = step(state, *_batch(np.random.RandomState(0)), jax.random.key(0))
    d = str(tmp_path / "c")
    ck = ckpt.Checkpointer(d, keep=3, sync=True)
    ck.save_full(state, epoch=7, val_loss=0.4)  # full stream only
    ck.close()
    template = create_train_state(
        jax.random.key(1), model_cfg=TINY, train_cfg=EMA, input_size=SIZE,
    )
    ema_p, ema_bs = ckpt.restore_params_for_inference(
        d, template, epoch=7, ema=True
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(ema_p)[0]),
        np.asarray(jax.tree.leaves(state.ema_params)[0]), rtol=1e-6,
    )


def test_cli_ema_flag_is_tristate():
    """--ema forces on, --no-ema forces off, absent defers to the config's
    use_ema (advisor round-4: a shipped config with use_ema true must be
    overridable off for a single invocation)."""
    from unetseg_tpu.cli.main import build_parser

    p = build_parser()
    base = ["predict", "--checkpoint-dir", "x", "--data-root", "y"]
    assert p.parse_args(base).ema is None
    assert p.parse_args(base + ["--ema"]).ema is True
    assert p.parse_args(base + ["--no-ema"]).ema is False
    # the resolution rule _make_predictor applies:
    for cfg_ema, arg, want in [(True, None, True), (True, False, False),
                               (False, None, False), (False, True, True)]:
        resolved = cfg_ema if arg is None else arg
        assert resolved is want
