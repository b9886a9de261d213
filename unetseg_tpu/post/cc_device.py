"""On-device connected components (8-connectivity) via label propagation.

The host path (post/cc.py, scipy union-find) is the default; this keeps the
whole predict pipeline on device when masks should not round-trip to the
host (e.g. device-resident batch pipelines). Classic iterative algorithm:
seed every foreground pixel with its own flat index, then repeatedly take
the minimum label over the 3x3 neighborhood (masked to foreground) until a
fixpoint — O(component diameter) dense min-pools on the VPU, no
data-dependent shapes (`lax.while_loop` on the convergence flag).

Labels returned are raveled-seed minima (the component's smallest flat
index + 1); `compact=True` relabels to 1..n in first-appearance order,
matching scipy.ndimage.label's raster numbering exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INF32 = 2**31 - 1  # python int: traced-scalar closures break reduce_window internals


@partial(jax.jit, static_argnames=("max_iters",))
def label_components_device(
    binary_mask: jnp.ndarray, max_iters: int = 4096
) -> jnp.ndarray:
    """(H, W) bool/int mask -> (H, W) int32 labels (0 background; foreground
    labels are 1 + the component's minimum flat index)."""
    fg = jnp.asarray(binary_mask) > 0
    h, w = fg.shape
    seeds = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    labels = jnp.where(fg, seeds, _INF32)

    def min_pool(x):
        return jax.lax.reduce_window(
            x, _INF32, jax.lax.min,
            window_dimensions=(3, 3), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
        )

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        nxt = jnp.where(fg, jnp.minimum(labels, min_pool(labels)), _INF32)
        return nxt, jnp.any(nxt != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True), 0))
    return jnp.where(fg, labels, 0)


def get_instance_masks_device(
    binary_mask,
    min_size: int = 15,
    compact: bool = True,
) -> np.ndarray:
    """Device CC + host-side compaction/small-object removal; matches
    post.cc.get_instance_masks(relabel=compact) output exactly except that
    compact=False here still renumbers to scipy raster ids (with gaps where
    small objects were removed), not raw seed minima."""
    raw = np.asarray(label_components_device(jnp.asarray(binary_mask)))
    return compact_labels(raw, min_size=min_size, relabel=compact)


def compact_labels(
    raw: np.ndarray, min_size: int = 15, relabel: bool = False
) -> np.ndarray:
    """Host post-pass on raw device labels, mirroring post.cc.get_instance_masks
    step for step: renumber seed-minimum labels to scipy's raster-order
    1..n, remove small objects id-preserving (gaps allowed), optionally
    compact. Split out so callers that already hold fetched device labels
    (e.g. predict --device-cc) skip the re-upload."""
    from unetseg_tpu.post.cc import relabel_sequential, remove_small

    if raw.max() == 0:
        return raw.astype(np.uint16)
    # Raw labels are 1 + the component's minimum flat index; sorted unique
    # ids are therefore exactly scipy.ndimage.label's raster numbering.
    ids, inv = np.unique(raw, return_inverse=True)
    labels = inv.reshape(raw.shape).astype(np.int64)
    if ids[0] != 0:  # no background pixel: shift so components start at 1
        labels = labels + 1
    labels = remove_small(labels, min_size)
    if relabel:
        labels = relabel_sequential(labels)
    return labels.astype(np.uint16)
