"""Device-resident (epoch-scan) feed vs the host-fed per-step loop.

With augmentation off the step consumes no randomness, so the two feed
modes must produce IDENTICAL training trajectories (same batch composition
by construction — epoch_index_matrix shares iter_batches' shuffle seed).
"""

import dataclasses

import numpy as np
import pytest

from tests.test_train_loop import TINY_MODEL, _cfg, tiny_tree  # noqa: F401
from unetseg_tpu.data.dataset import (
    HeLaArrays,
    epoch_index_matrix,
    iter_batches,
)
from unetseg_tpu.train.loop import train


def test_epoch_index_matrix_matches_iter_batches():
    rs = np.random.RandomState(0)
    data = HeLaArrays(
        images=rs.rand(7, 8, 8).astype(np.float32),
        masks=np.zeros((7, 8, 8), np.int32),
        weight_maps=np.ones((7, 8, 8), np.float32),
        files=[None] * 7,
    )
    idx = [0, 2, 3, 5, 6]
    mat, valid = epoch_index_matrix(idx, 2, shuffle=True, seed=42)
    batches = list(iter_batches(data, idx, 2, shuffle=True, seed=42))
    assert mat.shape == (len(batches), 2)
    for s, b in enumerate(batches):
        np.testing.assert_array_equal(valid[s], b.valid)
        np.testing.assert_array_equal(
            data.images[mat[s]], b.images
        )


def test_scan_feed_under_mesh_matches_single_device(tiny_tree, tmp_path):  # noqa: F811
    """The GSPMD mesh scan feed (replicated dataset + data-axis sharding
    constraints on gathered batches) trains identically to the
    single-device scan (augment off => no RNG in the step; the lanes
    shard_map path is mesh-gated off here via lanes='off')."""
    import jax

    from unetseg_tpu.core.config import MeshConfig, TrainConfig
    from unetseg_tpu.core.mesh import make_mesh

    assert jax.device_count() == 8
    results = {}
    for mesh in (
        None,
        make_mesh(MeshConfig(data_parallel=2), devices=jax.devices()[:2]),
    ):
        cfg = _cfg(
            tiny_tree, tmp_path / f"mesh{mesh is not None}",
            epochs=2, augment=False,
        )
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, lanes="off")
        )
        results[mesh is not None] = train(cfg, mesh=mesh)
    for a, b in zip(results[True].history, results[False].history):
        assert a["train_loss"] == pytest.approx(b["train_loss"], rel=1e-5)
        assert a["val_loss"] == pytest.approx(b["val_loss"], rel=1e-5)


def test_scan_feed_matches_host_feed(tiny_tree, tmp_path):  # noqa: F811
    results = {}
    for mode in (True, False):
        cfg = _cfg(tiny_tree, tmp_path / f"m{mode}", epochs=2, augment=False)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, device_data=mode)
        )
        results[mode] = train(cfg)
    h_scan = results[True].history
    h_host = results[False].history
    assert len(h_scan) == len(h_host) == 2
    for a, b in zip(h_scan, h_host):
        assert a["train_loss"] == pytest.approx(b["train_loss"], rel=1e-6)
        assert a["val_loss"] == pytest.approx(b["val_loss"], rel=1e-6)
