"""End-to-end tiny training loop: runs epochs, checkpoints best, resumes."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from unetseg_tpu.core.config import (
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
)
from unetseg_tpu.data.dataset import HeLaArrays
from unetseg_tpu.train import checkpoint as ckpt
from unetseg_tpu.train.loop import train
from unetseg_tpu.train.state import create_train_state

TINY_MODEL = ModelConfig(compute_dtype="float32", base_features=4)
SIZE = 188


@pytest.fixture
def tiny_tree(tmp_path):
    root = tmp_path / "HeLa"
    (root / "01").mkdir(parents=True)
    (root / "01_ST" / "SEG").mkdir(parents=True)
    (root / "01_ST" / "WEIGHT_MAPS").mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(6):
        Image.fromarray((rs.rand(SIZE, SIZE) * 255).astype(np.uint8)).save(
            root / "01" / f"t{i:03d}.tif"
        )
        m = np.zeros((SIZE, SIZE), np.uint16)
        m[40:90, 40:90] = 1
        m[110:150, 100:160] = 2
        Image.fromarray(m).save(root / "01_ST" / "SEG" / f"man_seg{i:03d}.tif")
        np.save(
            root / "01_ST" / "WEIGHT_MAPS" / f"weight_map_{i:03d}.npy",
            np.ones((SIZE, SIZE), np.float64),
        )
    return str(root)


def _cfg(tiny_tree, tmp_path, epochs=2, augment=False):
    return Config(
        model=TINY_MODEL,
        data=DataConfig(
            data_root=tiny_tree, sequence="01", val_percent=0.34, augment=augment
        ),
        train=TrainConfig(
            batch_size=2,
            num_epochs=epochs,
            checkpoint_dir=str(tmp_path / "ckpts"),
            log_every=100,
            donate_state=False,
        ),
    )


def test_train_two_epochs_and_checkpoint(tiny_tree, tmp_path):
    cfg = _cfg(tiny_tree, tmp_path)
    result = train(cfg)
    assert len(result.history) == 2
    assert result.best_epoch >= 0
    assert np.isfinite(result.best_val_loss)
    # full (resume) checkpoint exists and restores the exact final state
    latest = ckpt.latest_epoch(cfg.train.checkpoint_dir)
    assert latest == 1  # the final epoch always writes a full save
    template = create_train_state(
        jax.random.key(0), model_cfg=TINY_MODEL, train_cfg=cfg.train, input_size=SIZE
    )
    restored, epoch, extra = ckpt.restore_checkpoint(
        cfg.train.checkpoint_dir, template
    )
    assert epoch == latest
    assert extra["config"]["train"]["batch_size"] == 2
    # restored params equal trained params bit-exactly (fp32 full stream)
    a = jax.tree.leaves(result.state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # light best-k stream restores a bf16 shadow of the best params
    params, batch_stats, _ = ckpt.restore_light(
        cfg.train.checkpoint_dir, template.params, template.batch_stats
    )
    la = jax.tree.leaves(params)[0]
    assert la.dtype == np.float32  # cast back for consumers
    if result.best_epoch == epoch:
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(a), rtol=1e-2, atol=1e-2
        )


def test_resume_continues(tiny_tree, tmp_path):
    cfg = _cfg(tiny_tree, tmp_path, epochs=1)
    train(cfg)
    cfg2 = _cfg(tiny_tree, tmp_path, epochs=2)
    cfg2 = Config(
        model=cfg2.model,
        data=cfg2.data,
        train=TrainConfig(
            **{**cfg2.train.__dict__, "resume": True}
        ),
    )
    result = train(cfg2)
    # only epoch 1 runs on resume
    assert len(result.history) == 1


def test_max_steps_cutoff(tiny_tree, tmp_path):
    cfg = _cfg(tiny_tree, tmp_path, epochs=5)
    result = train(cfg, max_steps=3)
    assert int(result.state.step) == 3


def test_best_inside_cooldown_is_flushed(tiny_tree, tmp_path):
    """A new best val loss during the checkpoint cooldown must still be
    saved once the interval elapses or the loop ends (ADVICE r1)."""
    cfg = _cfg(tiny_tree, tmp_path, epochs=4)
    cfg = Config(
        model=cfg.model,
        data=cfg.data,
        train=TrainConfig(
            **{**cfg.train.__dict__, "checkpoint_min_interval": 3}
        ),
    )
    result = train(cfg)
    # the best epoch is checkpointed (light stream) even if it fell inside
    # the cooldown
    saved = ckpt.light_latest_epoch(cfg.train.checkpoint_dir)
    assert saved == result.best_epoch
    template = create_train_state(
        jax.random.key(0), model_cfg=TINY_MODEL, train_cfg=cfg.train, input_size=SIZE
    )
    _, _, extra = ckpt.restore_light(
        cfg.train.checkpoint_dir, template.params, template.batch_stats,
        epoch=saved,
    )
    assert extra["config"]["train"]["checkpoint_min_interval"] == 3


def test_full_stream_keeps_latest_not_best(tmp_path):
    """The resume stream's retention must be by recency: keyed on val loss
    it silently dropped newer resume points whenever validation worsened
    (found driving the CLI — full/ held epoch 0 after a final-epoch save)."""
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY_MODEL, input_size=SIZE
    )
    ck = ckpt.Checkpointer(str(tmp_path / "c"), keep=2, sync=True)
    ck.save_full(state, 0, val_loss=0.1)
    ck.save_full(state, 1, val_loss=0.9)  # worse val — still the newest
    ck.close()
    assert ckpt.latest_epoch(str(tmp_path / "c")) == 1


def test_restore_inference_from_full_only_epoch(tmp_path):
    """An epoch that exists only in the full (resume) stream — the
    full_save_interval cadence writes full saves for non-best epochs —
    must be restorable with predict --epoch: the fallback used to look in
    the legacy root instead of <dir>/full and raised FileNotFoundError."""
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY_MODEL, input_size=SIZE
    )
    ck = ckpt.Checkpointer(str(tmp_path / "c"), sync=True)
    ck.save(state, 0, val_loss=0.5)       # light best-k stream @0
    ck.save_full(state, 5, val_loss=0.9)  # full stream only @5
    ck.close()
    params, batch_stats = ckpt.restore_params_for_inference(
        str(tmp_path / "c"), state, epoch=5
    )
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_restore_checkpoint_full_errors_not_masked(tmp_path, monkeypatch):
    """When a full stream exists, a failing full restore (e.g. the caller's
    optimizer template no longer matches the checkpoint) must surface ITS
    error — not fall through to re-trying the LIGHT stream at the root,
    which masks the cause with a confusing tree mismatch."""
    from unetseg_tpu.core.config import TrainConfig

    state = create_train_state(
        jax.random.key(0), model_cfg=TINY_MODEL, input_size=SIZE
    )
    ck = ckpt.Checkpointer(str(tmp_path / "c"), sync=True)
    ck.save(state, 0, val_loss=0.5)
    ck.save_full(state, 5, val_loss=0.9)
    ck.close()
    adam_state = create_train_state(
        jax.random.key(0),
        model_cfg=TINY_MODEL,
        train_cfg=TrainConfig(optimizer="adam", donate_state=False),
        input_size=SIZE,
    )
    consulted = []
    orig = ckpt._stream_latest
    monkeypatch.setattr(
        ckpt, "_stream_latest", lambda d: consulted.append(d) or orig(d)
    )
    with pytest.raises(Exception):
        ckpt.restore_checkpoint(str(tmp_path / "c"), adam_state)
    # only the full stream was consulted after the initial resolution —
    # the legacy/light root is for directories with NO full stream
    assert all(d.endswith("full") for d in consulted)


def test_async_checkpointer_matches_sync(tmp_path):
    """Async (background-writer) saves persist the same artifacts."""
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY_MODEL, input_size=SIZE
    )
    ck = ckpt.Checkpointer(str(tmp_path / "a"), keep=2, sync=False)
    ck.save(state, 0, val_loss=0.5)
    ck.save_full(state, 0, val_loss=0.5)
    ck.close()  # drains the queue
    assert ckpt.best_epoch(str(tmp_path / "a")) == 0
    assert ckpt.latest_epoch(str(tmp_path / "a")) == 0
    restored, _, _ = ckpt.restore_light(
        str(tmp_path / "a"), state.params, state.batch_stats, epoch=0
    )
    first = jax.tree.leaves(restored)[0]
    assert first.dtype == np.float32 or first.dtype == jax.numpy.bfloat16


def test_async_checkpointer_surfaces_worker_errors(tmp_path):
    """A failed background write must raise (on the next enqueue or at
    close) instead of silently losing checkpoints."""
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY_MODEL, input_size=SIZE
    )
    ck = ckpt.Checkpointer(str(tmp_path / "e"), keep=2, sync=False)

    def boom(*a, **k):
        raise OSError("disk full")

    ck._write = boom
    ck.save(state, 0, val_loss=0.5)
    with pytest.raises(RuntimeError, match="background checkpoint save"):
        ck.close()


def test_lanes_active_resolution():
    """TrainConfig.lanes gating: auto is off on CPU, on forces (with a clear
    error for unsupported geometry), off disables."""
    from unetseg_tpu.train.loop import lanes_active

    # CPU backend -> auto resolves False even for supported geometry
    assert lanes_active("auto", TINY_MODEL, SIZE, mesh=None) is False
    assert lanes_active("off", TINY_MODEL, SIZE, mesh=None) is False
    # "on" forces the path when the geometry supports it (188 does)
    assert lanes_active("on", TINY_MODEL, SIZE, mesh=None) is True
    # "on" with an unsupported geometry must fail loudly, not mis-train
    with pytest.raises(ValueError, match="does not support"):
        lanes_active("on", TINY_MODEL, 189, mesh=None)
    with pytest.raises(ValueError, match="auto"):
        lanes_active("sometimes", TINY_MODEL, SIZE, mesh=None)


def test_lanes_active_mesh_divisibility():
    """shard_map splits the batch dim evenly over the data axis — a batch
    that does not divide by the data-parallel degree must keep lanes OFF in
    auto mode and fail loudly in 'on' mode (GSPMD tolerates uneven shards,
    shard_map does not)."""
    from unetseg_tpu.core.config import MeshConfig
    from unetseg_tpu.core.mesh import make_mesh
    from unetseg_tpu.train.loop import lanes_active

    mesh = make_mesh(MeshConfig(data_parallel=4), devices=jax.devices()[:4])
    # divisible: "on" works
    assert lanes_active("on", TINY_MODEL, SIZE, mesh, batch_size=8) is True
    # non-divisible: "on" raises, "auto" resolves False (even on TPU)
    with pytest.raises(ValueError, match="divisible"):
        lanes_active("on", TINY_MODEL, SIZE, mesh, batch_size=6)
    assert (
        lanes_active("auto", TINY_MODEL, SIZE, mesh, batch_size=6) is False
    )
