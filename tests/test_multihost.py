"""Real multi-process bootstrap: two `jax.distributed` processes on
localhost (gloo CPU collectives), exercising exactly the pieces
core/distributed.py adds over single-host GSPMD —

- `maybe_initialize` from environment variables,
- a mesh spanning BOTH processes' devices with a cross-process psum
  (the sharded train step's gradient reduction),
- the per-process host feed (`host_put` materializes only addressable
  shards),
- primary-gated checkpoint writes (process 1's Checkpointer is a no-op).

The reference has no multi-process code path at all (single-device
placement, reference: scripts/train.py:31); SURVEY.md §2 scopes multi-host
DCN into the parallelism plan. Workers run the real package code via the
script below; the parent asserts on their reports.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.multihost

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, os, sys
    sys.path.insert(0, sys.argv[2])  # repo root (PYTHONPATH would fight the
    os.environ["JAX_PLATFORMS"] = "cpu"  # image's sitecustomize)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from unetseg_tpu.core.distributed import (
        barrier, host_put, is_primary, maybe_initialize, process_shard_indices,
    )

    # env-var path: UNETSEG_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID set
    # by the parent test
    assert maybe_initialize() is True
    pid = jax.process_index()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    import numpy as np
    from unetseg_tpu.core.config import MeshConfig, ModelConfig, TrainConfig
    from unetseg_tpu.core.mesh import make_mesh
    from unetseg_tpu.models.unet import UNet
    from unetseg_tpu.parallel.sharding import (
        make_sharded_train_step, replicate_state, shard_batch,
    )
    from unetseg_tpu.train.state import create_train_state

    mesh = make_mesh(MeshConfig(data_parallel=4))
    tiny = ModelConfig(compute_dtype="float32", base_features=4)
    model = UNet(cfg=tiny)
    state = create_train_state(
        jax.random.key(0), model_cfg=tiny, train_cfg=TrainConfig(),
        input_size=188, model=model,
    )
    st = replicate_state(mesh, state)

    rs = np.random.RandomState(0)  # same global batch on every process
    images = rs.rand(4, 188, 188).astype(np.float32)
    masks = (rs.rand(4, 188, 188) > 0.6).astype(np.int32)
    weights = rs.rand(4, 188, 188).astype(np.float32) + 0.5
    valid = np.ones((4,), bool)
    b = shard_batch(mesh, images, masks, weights, valid)
    # per-process feed: the global batch axis spans processes, each process
    # holds only its addressable half
    assert b[0].shape[0] == 4
    assert sum(s.data.shape[0] for s in b[0].addressable_shards) == 2

    step = make_sharded_train_step(mesh, model, augment=False, donate=False)
    st2, metrics = step(st, *b, jax.random.key(1))
    loss = float(metrics["loss"])  # replicated -> addressable everywhere

    # primary-gated checkpointing: each process targets its OWN directory;
    # only process 0's Checkpointer may touch the filesystem
    from unetseg_tpu.train.checkpoint import Checkpointer
    ckdir = os.path.join(sys.argv[1], f"ck_p{pid}")
    ck = Checkpointer(ckdir, sync=True)
    assert ck._active == (pid == 0)
    ck.save(state, epoch=0, val_loss=loss)
    ck.save_full(state, epoch=0, val_loss=loss)
    ck.close()

    # multi-host RESUME: every process builds restore-side Orbax managers
    # on the primary's directory; per-process singleton barrier scoping must
    # keep this hang-free (a {0}-only active set deadlocked non-primaries)
    barrier("saved")
    from unetseg_tpu.train.checkpoint import latest_epoch, restore_checkpoint
    ck0 = os.path.join(sys.argv[1], "ck_p0")
    ep = latest_epoch(ck0)
    assert ep == 0, ep
    st_r, ep_r, _ = restore_checkpoint(ck0, state, ep)
    assert ep_r == 0

    shard0 = process_shard_indices(10).tolist()
    barrier("test_done")
    print("REPORT " + json.dumps({
        "pid": pid, "loss": loss, "primary": is_primary(),
        "ck_exists": os.path.isdir(ckdir), "shard": shard0,
    }), flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_bootstrap(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            UNETSEG_COORDINATOR=f"127.0.0.1:{port}",
            UNETSEG_NUM_PROCESSES="2",
            UNETSEG_PROCESS_ID=str(pid),
        )
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(tmp_path), REPO],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    reports = {}
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [l for l in out.splitlines() if l.startswith("REPORT ")][-1]
        rep = json.loads(line[len("REPORT "):])
        reports[rep["pid"]] = rep

    assert set(reports) == {0, 1}
    # both processes computed the SAME loss — the gradient psum crossed
    # processes and state stayed replicated
    assert reports[0]["loss"] == pytest.approx(reports[1]["loss"], abs=1e-6)
    assert reports[0]["primary"] and not reports[1]["primary"]
    # only process 0 wrote a checkpoint
    assert reports[0]["ck_exists"] is True
    assert reports[1]["ck_exists"] is False
    # disk-shard helper splits disjointly across processes
    assert reports[0]["shard"] == [0, 1, 2, 3, 4]
    assert reports[1]["shard"] == [5, 6, 7, 8, 9]
