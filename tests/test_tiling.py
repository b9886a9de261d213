"""Overlap-tile engine tests: geometry, seamlessness, equivalence with a
direct full forward, and mesh-sharded execution on the virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unetseg_tpu.core.config import ModelConfig
from unetseg_tpu.core.mesh import MeshConfig, make_mesh
from unetseg_tpu.infer.tiling import (
    TileGrid,
    extract_tiles,
    mirror_pad,
    plan_tiles,
    stitch,
    tiled_apply,
)
from unetseg_tpu.models.shapes import output_size


def test_plan_tiles_512_geometry():
    g = plan_tiles(512, 512, tile_in=512)
    assert g.tile_out == 324
    assert g.margin == 188
    assert (g.ny, g.nx) == (2, 2)
    assert g.pad_top == 94 and g.pad_left == 94
    # padded size must cover ny*tile_out + margin
    assert g.pad_top + 512 + g.pad_bottom == g.ny * 324 + 188
    assert g.num_tiles == 4


def test_min_tile_input_single_tile_cover():
    from unetseg_tpu.infer.tiling import min_tile_input
    from unetseg_tpu.models.shapes import output_size

    t = min_tile_input(512)
    assert t == 700 and output_size(t) == 516  # one tile covers a 512 frame
    g = plan_tiles(512, 512, t)
    assert (g.ny, g.nx) == (1, 1)
    # strictly less input oversampling than the 4x 512->324 grid
    assert t * t / (512 * 512) < 4 * 512 * 512 / (512 * 512)
    t2 = min_tile_input(1024)
    assert output_size(t2) >= 1024


def test_plan_tiles_1024():
    g = plan_tiles(1024, 1024, tile_in=512)
    assert (g.ny, g.nx) == (4, 4)


def test_plan_tiles_non_square():
    g = plan_tiles(300, 700, tile_in=512)
    assert g.ny == 1 and g.nx == 3
    assert g.pad_top + 300 + g.pad_bottom == 324 + 188


def test_extract_and_stitch_roundtrip_identity():
    """With an identity 'network' (crop center tile_out of each tile),
    tiling + stitching must reproduce the original image exactly — the
    seamlessness property of the overlap-tile strategy."""
    rs = np.random.RandomState(0)
    img = rs.rand(100, 130).astype(np.float32)
    g = plan_tiles(100, 130, tile_in=188)  # tile_out = 4
    padded = mirror_pad(jnp.asarray(img), g)
    tiles = extract_tiles(padded, g)
    assert tiles.shape == (g.num_tiles, 188, 188)
    m0 = g.margin // 2
    centers = tiles[:, m0 : m0 + g.tile_out, m0 : m0 + g.tile_out]
    out = stitch(centers[..., None], g)[..., 0]
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


def test_tiled_apply_matches_direct_center_crop():
    """tiled_apply with the identity-crop tile_fn equals the raw image."""
    rs = np.random.RandomState(1)
    img = rs.rand(64, 80).astype(np.float32)
    g = plan_tiles(64, 80, tile_in=188)
    m0 = g.margin // 2

    def tile_fn(batch):
        return batch[:, m0 : m0 + g.tile_out, m0 : m0 + g.tile_out, None]

    out = tiled_apply(tile_fn, jnp.asarray(img), g, tile_batch=3)
    np.testing.assert_allclose(np.asarray(out)[..., 0], img, atol=1e-6)


def test_tiled_apply_chunking_invariance():
    rs = np.random.RandomState(2)
    img = rs.rand(40, 40).astype(np.float32)
    g = plan_tiles(40, 40, tile_in=188)
    m0 = g.margin // 2

    def tile_fn(batch):
        return batch[:, m0 : m0 + g.tile_out, m0 : m0 + g.tile_out, None] * 2.0

    a = tiled_apply(tile_fn, jnp.asarray(img), g, tile_batch=1)
    b = tiled_apply(tile_fn, jnp.asarray(img), g, tile_batch=7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_tiled_apply_on_8_device_mesh():
    """Tile axis sharded over the virtual 8-device CPU mesh."""
    mesh = make_mesh(MeshConfig(data_parallel=4, tile_parallel=2))
    rs = np.random.RandomState(3)
    img = rs.rand(30, 30).astype(np.float32)
    g = plan_tiles(30, 30, tile_in=188)  # 8x8 grid of 4px tiles = 64 tiles
    assert g.num_tiles == 64
    m0 = g.margin // 2

    def tile_fn(batch):
        return batch[:, m0 : m0 + g.tile_out, m0 : m0 + g.tile_out, None] + 1.0

    out = tiled_apply(tile_fn, jnp.asarray(img), g, tile_batch=16, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out)[..., 0], img + 1.0, atol=1e-6)


def test_mirror_pad_reflect_values():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    g = TileGrid(h=4, w=4, tile_in=8, tile_out=2, ny=2, nx=2,
                 pad_top=3, pad_left=3, pad_bottom=3, pad_right=3)
    p = np.asarray(mirror_pad(img, g))
    assert p.shape == (10, 10)
    # reflect: row -1 == row 1
    np.testing.assert_array_equal(p[2, 3:7], np.asarray(img)[1])
