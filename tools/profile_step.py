"""Per-op device-time attribution of the folded full-width forward
(in-context, batch 16 tiles) via jax.profiler.trace.

Parses the trace.json.gz device plane directly (tf_op / hlo_category args);
prints the top ops and a per-stage rollup keyed by layer name fragments.
Usage: python _profile_fwd.py [trainstep]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_forward(tmpdir, size=512, lanes=False):
    from unetseg_tpu.core.config import ModelConfig
    from unetseg_tpu.infer.folding import fold_batchnorm
    from unetseg_tpu.models.fast_init import fast_random_variables
    from unetseg_tpu.models.unet import UNet

    model = UNet(cfg=ModelConfig())
    variables = fast_random_variables(model, jax.random.key(0), input_size=size)
    fmodel, fvars = fold_batchnorm(ModelConfig(), variables)
    if lanes:
        from unetseg_tpu.infer.lanes_net import folded_forward_tier1

        @jax.jit
        def fwd(fv, x):
            return folded_forward_tier1(fv["params"], x, ModelConfig())
    else:
        @jax.jit
        def fwd(fv, x):
            return fmodel.apply(fv, x)

    x = jnp.asarray(np.random.RandomState(0).rand(16, size, size, 1), jnp.bfloat16)
    float(fwd(fvars, x).sum())  # compile+warm
    with jax.profiler.trace(tmpdir):
        for _ in range(3):
            float(fwd(fvars, x).sum())


def run_trainstep(tmpdir, augment=False):
    from unetseg_tpu.core.config import Config
    from unetseg_tpu.models.unet import UNet
    from unetseg_tpu.train.state import create_train_state
    from unetseg_tpu.train.steps import make_train_step

    cfg = Config()
    model = UNet(cfg=cfg.model)
    state = create_train_state(
        jax.random.key(0), model_cfg=cfg.model, input_size=512, model=model
    )
    # mirror the production step: lanes default (PROF_LANES=0 for the Flax
    # step) and, when augmenting, the best-recipe photometric settings
    lanes = os.environ.get("PROF_LANES", "1") == "1"
    aug_kw = dict(
        standardize=augment, aug_gamma=0.35 if augment else 0.0,
        aug_illum=0.15 if augment else 0.0, aug_noise=0.05 if augment else 0.0,
    )
    step = make_train_step(model, augment=augment, lanes=lanes, **aug_kw)
    b = cfg.train.batch_size
    imgs = jnp.asarray(np.random.RandomState(0).rand(b, 512, 512), jnp.float32)
    masks = jnp.asarray(
        np.random.RandomState(1).randint(0, 5, (b, 512, 512)), jnp.int32
    )
    wmaps = jnp.ones((b, 512, 512), jnp.float32)
    val = jnp.ones((b,), bool)
    key = jax.random.key(1)
    state, metrics = step(state, imgs, masks, wmaps, val, key)
    float(metrics["loss"])
    with jax.profiler.trace(tmpdir):
        for _ in range(3):
            state, metrics = step(state, imgs, masks, wmaps, val, key)
            float(metrics["loss"])


def run_bench_pipeline(tmpdir, size=512, frames=16):
    """Profile the FULL bench segment program (pad -> tile -> normalize ->
    lanes forward -> softmax -> threshold -> stitch) — the end-to-end
    pipeline runs at ~57 TF/s while the bare forward runs at ~106, and this
    mode attributes the difference per op."""
    from functools import partial

    from unetseg_tpu.core.config import ModelConfig
    from unetseg_tpu.infer.folding import fold_batchnorm
    from unetseg_tpu.infer.lanes_net import folded_forward_tier1, supports
    from unetseg_tpu.infer.tiling import (
        extract_tiles, min_tile_input, mirror_pad, plan_tiles, stitch,
    )
    from unetseg_tpu.models.fast_init import fast_random_variables

    from unetseg_tpu.models.unet import UNet

    tile_in = min_tile_input(size)
    model = UNet(cfg=ModelConfig())
    variables = fast_random_variables(model, jax.random.key(0), input_size=size)
    fmodel, fvars = fold_batchnorm(ModelConfig(), variables)
    use_lanes = jax.default_backend() == "tpu" and supports(ModelConfig(), tile_in)
    if use_lanes:
        apply_fn = lambda fv, x: folded_forward_tier1(
            fv["params"], x, ModelConfig(), dec_fuse="head",
        )
    else:
        apply_fn = lambda fv, x: fmodel.apply(fv, x)
    grid = plan_tiles(size, size, tile_in)
    n_tiles = frames * grid.num_tiles
    tile_chunk = 16

    @jax.jit
    def segment(fv, fr):
        with jax.named_scope("tile_extract"):
            tiles = jax.vmap(
                lambda im: extract_tiles(mirror_pad(im, grid), grid)
            )(fr)
            tiles = tiles.reshape(n_tiles, grid.tile_in, grid.tile_in)
            x = (tiles - 0.5) / 0.5
        outs = []
        for s in range(0, n_tiles, tile_chunk):
            logits = apply_fn(fv, x[s : s + tile_chunk, ..., None])
            with jax.named_scope("softmax_threshold"):
                outs.append(jax.nn.softmax(logits, -1)[..., 1] > 0.5)
        with jax.named_scope("stitch"):
            masks = jnp.concatenate(outs).reshape(
                frames, grid.num_tiles, grid.tile_out, grid.tile_out
            )
            masks = jax.vmap(lambda m: stitch(m[..., None], grid)[..., 0])(masks)
        return masks.astype(jnp.uint8)

    fr = jnp.asarray(
        np.random.RandomState(0).rand(frames, size, size).astype(np.float32)
    )
    np.asarray(segment(fvars, fr)).sum()  # compile+warm
    with jax.profiler.trace(tmpdir):
        for _ in range(3):
            np.asarray(segment(fvars, fr)).sum()


def parse(tmpdir, n_iters=3):
    paths = glob.glob(os.path.join(tmpdir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {tmpdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find device-plane pids (TensorFlow Op lines live under TPU device pids)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    by_op = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        args = e.get("args") or {}
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "")
        if not args.get("hlo_category") and (
            "run_id" in args or not args.get("tf_op")
        ):
            continue  # module-level envelope event (whole-program span; its
            # duration double-counts every op inside it)
        cat = args.get("hlo_category", "?")
        op = args.get("tf_op") or name
        by_op[(op, cat)] += dur
        by_cat[cat] += dur
        total += dur
    print(f"total device time: {total / n_iters:.3f} ms/iter over {n_iters} iters")
    print("\n-- by hlo_category (ms/iter) --")
    for c, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {c:36s} {t / n_iters:8.3f}")
    print("\n-- top 40 ops (ms/iter) --")
    for (op, cat), t in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {t / n_iters:8.3f}  [{cat}] {op[:110]}")
    # stage rollup by layer-name fragment
    frags = ["enc0", "enc1", "enc2", "enc3", "enc4",
             "dec0", "dec1", "dec2", "dec3", "up0", "up1", "up2", "up3", "outc"]
    by_stage = defaultdict(float)
    for (op, cat), t in by_op.items():
        for fr in frags:
            if fr in op:
                by_stage[fr] += t
                break
        else:
            by_stage["(other)"] += t
    print("\n-- by stage (ms/iter) --")
    for s, t in sorted(by_stage.items(), key=lambda kv: -kv[1]):
        print(f"  {s:10s} {t / n_iters:8.3f}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "forward"
    tmpdir = f"/tmp/prof_{mode}"
    os.system(f"rm -rf {tmpdir}")
    size = int(os.environ.get("PROF_SIZE", "512"))
    if mode == "trainstep":
        run_trainstep(tmpdir, augment=False)
    elif mode == "trainstep-aug":
        run_trainstep(tmpdir, augment=True)
    elif mode == "forward-lanes":
        run_forward(tmpdir, size=size, lanes=True)
    elif mode == "bench":
        run_bench_pipeline(tmpdir, size=size)
    else:
        run_forward(tmpdir, size=size)
    parse(tmpdir)
