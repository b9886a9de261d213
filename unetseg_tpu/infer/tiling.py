"""Overlap-tile inference engine.

The U-Net paper's "overlap-tile strategy" segments arbitrarily large images
seamlessly: mirror-pad by half the valid-conv margin, run the net on
overlapping input tiles, and concatenate the non-overlapping output tiles.
The reference README advertises this but ships no implementation — only
output artifacts exist (reference: images/old readme unet.txt Phase 4;
SURVEY.md §2 C7). This module is that missing engine, built TPU-first:

- the tile grid is static, so the whole batch of tiles compiles once;
- tiles are batched on a leading axis that shards over the device mesh's
  (data, tile) axes — the framework's "sequence parallelism" analogue
  (SURVEY.md §5 'Long-context');
- stitching is pure concatenation (outputs never overlap), a reshape.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unetseg_tpu.core.mesh import MeshSpec
from unetseg_tpu.models.shapes import output_size


@dataclass(frozen=True)
class TileGrid:
    """Geometry of one tiled run over an (h, w) image."""

    h: int
    w: int
    tile_in: int     # network input tile size (e.g. 512)
    tile_out: int    # network output tile size (e.g. 324)
    ny: int
    nx: int
    pad_top: int
    pad_left: int
    pad_bottom: int
    pad_right: int

    @property
    def margin(self) -> int:
        return self.tile_in - self.tile_out

    @property
    def num_tiles(self) -> int:
        return self.ny * self.nx


def min_tile_input(cover: int, levels: int = 5, search: int = 256) -> int:
    """Smallest valid network input size whose output covers `cover` pixels.

    Fewer, larger tiles are strictly cheaper per output pixel: the valid-conv
    margin (~190 px at these depths) is re-computed per tile, so a 512-frame
    segmented as four 512->324 tiles oversamples the input 4.0x, while one
    700->516 tile oversamples 1.87x — same math, ~2.1x less compute
    (reference: images/old readme unet.txt Phase 4 describes the strategy;
    the paper's Fig. 2 applies the net to the full mirror-padded image, which
    is exactly the single-tile case)."""
    for t in range(cover, cover + max(search, cover) + 1):
        try:
            if output_size(t, levels) >= cover:
                return t
        except ValueError:
            continue
    raise ValueError(f"no valid tile input covering {cover}px found")


def plan_tiles(h: int, w: int, tile_in: int = 512) -> TileGrid:
    """Plan the grid: outputs tile the image exactly (stride = tile_out);
    input context comes from mirror padding by margin/2 plus ragged-edge
    padding on the bottom/right."""
    tile_out = output_size(tile_in)
    margin = tile_in - tile_out
    ny = math.ceil(h / tile_out)
    nx = math.ceil(w / tile_out)
    pad_top = margin // 2
    pad_left = margin // 2
    pad_bottom = (ny * tile_out - h) + (margin - margin // 2)
    pad_right = (nx * tile_out - w) + (margin - margin // 2)
    return TileGrid(
        h=h, w=w, tile_in=tile_in, tile_out=tile_out, ny=ny, nx=nx,
        pad_top=pad_top, pad_left=pad_left,
        pad_bottom=pad_bottom, pad_right=pad_right,
    )


def mirror_pad(image: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """Reflect-pad (the paper's mirroring). Falls back to symmetric mode when
    the pad exceeds the image extent (reflect needs pad < dim)."""
    pads = ((grid.pad_top, grid.pad_bottom), (grid.pad_left, grid.pad_right))
    mode = "reflect"
    if max(grid.pad_top, grid.pad_bottom) >= image.shape[0] or max(
        grid.pad_left, grid.pad_right
    ) >= image.shape[1]:
        mode = "symmetric"
    return jnp.pad(image, pads, mode=mode)


def extract_tiles(padded: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """(ny*nx, tile_in, tile_in) overlapping input tiles, raster order. The
    grid is static, so this unrolls to `num_tiles` static slices under jit."""
    tiles = []
    for i in range(grid.ny):
        for j in range(grid.nx):
            y = i * grid.tile_out
            x = j * grid.tile_out
            tiles.append(
                jax.lax.dynamic_slice(
                    padded, (y, x), (grid.tile_in, grid.tile_in)
                )
            )
    return jnp.stack(tiles)


def stitch(outputs: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """(ny*nx, tile_out, tile_out, ...) -> (h, w, ...). Pure reshape/transpose
    since output tiles are disjoint, then a crop of the ragged edge."""
    o = grid.tile_out
    rest = outputs.shape[3:]
    grid_arr = outputs.reshape((grid.ny, grid.nx, o, o) + rest)
    full = grid_arr.transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(rest))))
    full = full.reshape((grid.ny * o, grid.nx * o) + rest)
    return full[: grid.h, : grid.w]


def pad_tile_count(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def make_tiled_fn(
    tile_fn: Callable,
    grid: TileGrid,
    tile_batch: Optional[int] = None,
    mesh: Optional[MeshSpec] = None,
    with_context: bool = False,
) -> Callable:
    """One jit-compiled program for the whole tiled run: mirror-pad ->
    extract -> per-chunk forward -> stitch. Eliminates per-op dispatch and
    lets XLA overlap tile extraction with compute. With a mesh, the tile axis
    carries a sharding constraint over (data, tile) so GSPMD splits chunks
    across devices and gathers the stitch over ICI.

    With `with_context=True`, `tile_fn(ctx, chunk)` and the returned function
    is `fn(ctx, image)` — use this to pass model variables as traced
    arguments instead of closure constants (closure capture inlines the
    weights into the compiled program)."""
    n = grid.num_tiles
    batch = tile_batch or n
    if mesh is not None:
        batch = pad_tile_count(batch, mesh.num_data * mesh.num_tile)
    n_padded = pad_tile_count(n, batch)

    def run_tiles(call, image: jnp.ndarray) -> jnp.ndarray:
        padded = mirror_pad(image, grid)
        tiles = extract_tiles(padded, grid)
        if n_padded > n:
            tiles = jnp.concatenate(
                [tiles, jnp.repeat(tiles[:1], n_padded - n, axis=0)]
            )
        outs = []
        for start in range(0, n_padded, batch):
            chunk = tiles[start : start + batch]
            if mesh is not None:
                chunk = jax.lax.with_sharding_constraint(
                    chunk, mesh.tile_sharding()
                )
            outs.append(call(chunk))
        outputs = jnp.concatenate(outs, axis=0)[:n]
        return stitch(outputs, grid)

    if with_context:
        return jax.jit(lambda ctx, image: run_tiles(lambda c: tile_fn(ctx, c), image))
    return jax.jit(lambda image: run_tiles(tile_fn, image))


#: test-time augmentation transforms: (forward, inverse) pairs on (H, W)
#: images / probability maps. Flips commute with the pad/tile/stitch
#: pipeline only when applied to the FULL frame and inverted on the full
#: stitched probabilities, which is how make_tiled_mask_batch_fn uses them.
def _t(x):
    """Transpose the trailing (H, W) axes (square frames only)."""
    return jnp.swapaxes(x, -2, -1)


TTA_TRANSFORMS = {
    "none": [(lambda x: x, lambda x: x)],
    "flips": [
        (lambda x: x, lambda x: x),
        (lambda x: x[..., ::-1, :], lambda x: x[..., ::-1, :]),
        (lambda x: x[..., :, ::-1], lambda x: x[..., :, ::-1]),
        (lambda x: x[..., ::-1, ::-1], lambda x: x[..., ::-1, ::-1]),
    ],
    # the full dihedral group D4 (flips x transpose) — SQUARE frames only;
    # inverse of (transpose then flip) is (unflip then transpose)
    "flips8": [
        (lambda x: x, lambda x: x),
        (lambda x: x[..., ::-1, :], lambda x: x[..., ::-1, :]),
        (lambda x: x[..., :, ::-1], lambda x: x[..., :, ::-1]),
        (lambda x: x[..., ::-1, ::-1], lambda x: x[..., ::-1, ::-1]),
        (_t, _t),
        (lambda x: _t(x)[..., ::-1, :], lambda x: _t(x[..., ::-1, :])),
        (lambda x: _t(x)[..., :, ::-1], lambda x: _t(x[..., :, ::-1])),
        (lambda x: _t(x)[..., ::-1, ::-1], lambda x: _t(x[..., ::-1, ::-1])),
    ],
}


def make_tiled_mask_batch_fn(
    tile_fn: Callable,
    grid: TileGrid,
    n_frames: int,
    threshold: float,
    tile_batch: Optional[int] = None,
    mesh: Optional[MeshSpec] = None,
    tta: str = "none",
    tta_merge: str = "mean",
) -> Callable:
    """Frame-BATCHED tiled binary segmentation as one jit program:
    fn(ctx, images (F, H, W) f32) -> (F, H, W) uint8.

    All frames' tiles are pooled into shared fixed-size forward chunks (at
    the 512^2 single-tile geometry a frame is ONE tile, so 8 frames fill an
    8-tile chunk that used to run 8 separate dispatches), the stitch runs
    per frame, and thresholding happens on device so only uint8 masks cross
    the device->host link (8x smaller than f32 probabilities — the remote
    tunnel makes sequence prediction fetch-bound). `tile_fn(ctx, chunk)`
    must return (B, o, o) foreground probabilities (the binary head) —
    the 3-class path keeps per-frame probs_tiled."""
    n = grid.num_tiles
    total = n_frames * n
    batch = tile_batch or total
    if mesh is not None:
        batch = pad_tile_count(batch, mesh.num_data * mesh.num_tile)
    n_padded = pad_tile_count(total, batch)

    if tta == "flips8" and grid.h != grid.w:
        raise ValueError(
            f"tta='flips8' transposes frames and needs square inputs; "
            f"got {grid.h}x{grid.w}"
        )
    transforms = TTA_TRANSFORMS[tta]

    def frame_probs(ctx, images: jnp.ndarray) -> jnp.ndarray:
        padded = jax.vmap(lambda im: mirror_pad(im, grid))(images)
        tiles = jax.vmap(lambda p: extract_tiles(p, grid))(padded)
        tiles = tiles.reshape(total, *tiles.shape[2:])
        if n_padded > total:
            tiles = jnp.concatenate(
                [tiles, jnp.repeat(tiles[:1], n_padded - total, axis=0)]
            )
        outs = []
        for start in range(0, n_padded, batch):
            chunk = tiles[start : start + batch]
            if mesh is not None:
                chunk = jax.lax.with_sharding_constraint(
                    chunk, mesh.tile_sharding()
                )
            outs.append(tile_fn(ctx, chunk))
        outputs = jnp.concatenate(outs, axis=0)[:total]
        assert outputs.ndim == 3, (
            "make_tiled_mask_batch_fn expects a binary (B, o, o) "
            f"foreground-probability head, got {outputs.shape}"
        )
        outputs = outputs.reshape(n_frames, n, *outputs.shape[1:])
        return jax.vmap(lambda o: stitch(o, grid))(outputs)

    def run(ctx, images: jnp.ndarray) -> jnp.ndarray:
        all_p = [
            inv_t(frame_probs(ctx, fwd_t(images))) for fwd_t, inv_t in transforms
        ]
        return merge_tta_probs(all_p, threshold, tta_merge)

    return jax.jit(run)


def merge_tta_probs(
    probs: list, threshold: float, merge: str = "mean"
) -> jnp.ndarray:
    """Combine per-transform foreground probabilities into a binary mask.

    The arithmetic "mean" smooths the thin low-probability membranes between
    touching cells (measured: seq-01 SEG 0.87 -> 0.82 with flips+mean,
    docs/RESULTS.md round-4 TTA table), so alternatives that preserve
    near-zero boundary evidence are offered:

    - "gmean": geometric mean — one near-zero vote keeps the pixel
      background, protecting separating membranes;
    - "vote": threshold each transform independently, keep pixels a strict
      majority (> half) call foreground — no probability smoothing at all;
    - "max": union over transforms — recall-maximizing.
    """
    n = len(probs)
    if merge == "mean":
        p = sum(probs) / n
        return (p > threshold).astype(jnp.uint8)
    if merge == "gmean":
        eps = jnp.float32(1e-7)
        logp = sum(jnp.log(p + eps) for p in probs) / n
        return (jnp.exp(logp) > threshold).astype(jnp.uint8)
    if merge == "vote":
        votes = sum((p > threshold).astype(jnp.int32) for p in probs)
        return (votes * 2 > n).astype(jnp.uint8)
    if merge == "max":
        p = jnp.stack(probs).max(axis=0)
        return (p > threshold).astype(jnp.uint8)
    raise ValueError(f"unknown tta_merge {merge!r}")


def tiled_apply(
    tile_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    grid: TileGrid,
    tile_batch: Optional[int] = None,
    mesh: Optional[MeshSpec] = None,
) -> jnp.ndarray:
    """Run `tile_fn` ((B, T, T) -> (B, o, o, C)) over all tiles of `image`
    and stitch. Tiles are processed in fixed-size chunks (`tile_batch`) so one
    compiled shape serves any image size; with a mesh, each chunk's leading
    axis is sharded over the (data, tile) axes and XLA gathers results over
    ICI.
    """
    padded = mirror_pad(image, grid)
    tiles = extract_tiles(padded, grid)
    n = grid.num_tiles

    if tile_batch is None:
        tile_batch = n
    if mesh is not None:
        devs = mesh.num_data * mesh.num_tile
        tile_batch = pad_tile_count(tile_batch, devs)

    outs = []
    for start in range(0, n, tile_batch):
        chunk = tiles[start : start + tile_batch]
        pad = tile_batch - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.repeat(chunk[:1], pad, axis=0)])
        if mesh is not None:
            chunk = jax.device_put(chunk, mesh.tile_sharding())
        out = tile_fn(chunk)
        if pad:
            out = out[: tile_batch - pad]
        outs.append(out)
    outputs = jnp.concatenate(outs, axis=0)
    return stitch(outputs, grid)
