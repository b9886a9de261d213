"""Multi-host process bootstrap and process-aware data placement.

The reference is strictly single-process (`cuda-if-available` placement,
reference: scripts/train.py:31); multi-chip scaling in this framework is a
`jax.sharding.Mesh` (core/mesh.py). This module supplies the remaining
multi-HOST pieces so the same mesh spans pods:

- :func:`maybe_initialize` — `jax.distributed.initialize` behind CLI flags /
  environment variables, a no-op in the common single-process case;
- :func:`is_primary` — process-0 gate for filesystem side effects
  (checkpoint writes, metrics JSONL);
- :func:`host_put` — build a global (possibly non-addressable) array from
  host data, materializing only the shards this process's devices own. On a
  single process it is exactly `jax.device_put`.

Collectives then ride ICI within a slice and DCN across slices via the same
GSPMD partitioning as single-host — nothing else in the framework changes.

Exercised end-to-end (bootstrap, cross-process psum, per-process feed,
primary-gated checkpointing) by tests/test_multihost.py, which runs TWO real
`jax.distributed` processes on localhost over the gloo CPU collectives.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

_initialized = False


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Initialize `jax.distributed` if multi-process is configured.

    Arguments fall back to the environment (``UNETSEG_COORDINATOR``,
    ``UNETSEG_NUM_PROCESSES``, ``UNETSEG_PROCESS_ID``) so launchers can
    configure workers without CLI plumbing. Returns True when distributed
    mode is active. No-op (False) when no coordinator is configured or
    num_processes <= 1; idempotent across calls.

    On the CPU backend the gloo collectives implementation is selected —
    required for cross-process collectives, and how the 2-process CPU test
    exercises this path without multi-host TPU hardware.
    """
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(
        "UNETSEG_COORDINATOR"
    )
    if num_processes is None and os.environ.get("UNETSEG_NUM_PROCESSES"):
        num_processes = int(os.environ["UNETSEG_NUM_PROCESSES"])
    if process_id is None and os.environ.get("UNETSEG_PROCESS_ID"):
        process_id = int(os.environ["UNETSEG_PROCESS_ID"])
    if _initialized:
        return True
    if coordinator_address is None or (num_processes or 1) <= 1:
        return False
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older jax without the option
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns filesystem side effects (checkpoints,
    metrics). All processes hold replicated state in the DP design, so
    process 0 writing alone is lossless."""
    return jax.process_index() == 0


def host_put(array, sharding):
    """Place host `array` (full GLOBAL content on every process) onto a
    sharding that may span non-addressable devices.

    Single-process: plain `jax.device_put`. Multi-process: each process
    materializes only the shards its addressable devices own via
    `jax.make_array_from_callback` — the per-process host feed. The host
    array is cheap to hold globally here (the whole HeLa dataset is
    ~100 MB); processes feeding disjoint disk shards instead should slice
    with :func:`process_shard_indices` before calling.
    """
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    array = np.asarray(array)
    return jax.make_array_from_callback(
        array.shape, sharding, lambda idx: array[idx]
    )


def host_put_tree(tree, sharding):
    """:func:`host_put` over a pytree (e.g. a replicated TrainState built
    identically on every process from the same seed)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(lambda a: host_put(np.asarray(a), sharding), tree)


def process_shard_indices(n_items: int) -> np.ndarray:
    """Contiguous split of `range(n_items)` across processes — which global
    items THIS process should load from disk when hosts feed disjoint
    shards (e.g. a frame directory split across pod workers)."""
    return np.array_split(np.arange(n_items), jax.process_count())[
        jax.process_index()
    ]


def barrier(name: str = "unetseg_barrier") -> None:
    """Block until every process reaches this point (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
