"""Device-mesh construction with named axes.

The reference is strictly single-device ('cuda-if-available',
reference: scripts/train.py:31); this module is the TPU-native replacement:
a `jax.sharding.Mesh` with named axes

- ``data``  — batch-axis data parallelism for train/eval steps,
- ``tile``  — overlap-tile axis sharding for inference,
- ``model`` — reserved channel-sharding axis (kept size 1 by default so that
  TP remains addable without API changes).

Gradient reduction and tile gathers ride ICI via the collectives XLA inserts
for `jit`-with-shardings; multi-host DCN is handled transparently by GSPMD.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unetseg_tpu.core.config import MeshConfig


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Resolved mesh + canonical shardings used across the framework."""

    mesh: Mesh
    data_axis: str = "data"
    tile_axis: str = "tile"
    model_axis: str = "model"

    # ---------------------------------------------------------- shardings
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def batch_sharding(self) -> NamedSharding:
        """Shard leading (batch) dim over the data axis, replicate the rest."""
        return NamedSharding(self.mesh, P(self.data_axis))

    def tile_sharding(self) -> NamedSharding:
        """Shard leading (tile) dim over data*tile axes jointly.

        Overlap-tile inference flattens the tile grid into the leading dim;
        using both axes lets a pure-DP mesh and a dedicated tile mesh share
        one code path.
        """
        return NamedSharding(self.mesh, P((self.data_axis, self.tile_axis)))

    @property
    def num_data(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def num_tile(self) -> int:
        return self.mesh.shape[self.tile_axis]


def make_mesh(
    cfg: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshSpec:
    """Build a 3-axis mesh (data, tile, model) from available devices.

    ``data_parallel == -1`` absorbs all devices not consumed by the other
    axes. Axis sizes must multiply to the device count.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = max(1, cfg.tile_parallel)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel
    if dp == -1:
        if n % (tp * mp) != 0:
            raise ValueError(
                f"{n} devices not divisible by tile*model = {tp * mp}"
            )
        dp = n // (tp * mp)
    if dp * tp * mp != n:
        raise ValueError(
            f"mesh {dp}x{tp}x{mp} != {n} devices"
        )
    dev_array = np.array(devices).reshape(dp, tp, mp)
    mesh = Mesh(dev_array, (cfg.data_axis, cfg.tile_axis, cfg.model_axis))
    return MeshSpec(
        mesh=mesh,
        data_axis=cfg.data_axis,
        tile_axis=cfg.tile_axis,
        model_axis=cfg.model_axis,
    )


def single_device_mesh() -> MeshSpec:
    """A 1x1x1 mesh on the default device — lets every code path be
    mesh-aware without special-casing the single-chip case."""
    return make_mesh(MeshConfig(data_parallel=1), devices=jax.devices()[:1])
