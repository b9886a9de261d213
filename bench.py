#!/usr/bin/env python
"""Benchmark: 512x512 overlap-tile inference throughput (MPix/s per chip).

The BASELINE.json north-star metric. Runs the flagship full-width bf16 U-Net
through the overlap-tile engine on whatever accelerator JAX provides (the
real TPU chip under the driver), and prints ONE JSON line:

  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline compares against the reference-equivalent PyTorch U-Net's 512^2
eval forward measured on this host's CPU (baselines/torch_cpu.json — the
reference is cuda-if-available with no GPU in this environment, so its own
hardware here IS the host CPU).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import jax
    import numpy as np

    from unetseg_tpu.core.config import InferConfig, ModelConfig
    from unetseg_tpu.infer.engine import Predictor
    from unetseg_tpu.models.fast_init import fast_random_variables
    from unetseg_tpu.models.unet import UNet

    size = int(os.environ.get("BENCH_IMAGE_SIZE", "512"))
    tile_batch = int(os.environ.get("BENCH_TILE_BATCH", "4"))
    reps = int(os.environ.get("BENCH_REPS", "20"))

    model = UNet(cfg=ModelConfig())  # full width, bf16 policy
    variables = fast_random_variables(model, jax.random.key(0), input_size=size)
    pred = Predictor(
        model=model,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        cfg=InferConfig(tile_input=512, tile_batch=tile_batch),
    )

    img = np.random.RandomState(0).rand(size, size).astype(np.float32)
    pred.probs_tiled(img)  # compile + warm
    pred.probs_tiled(img)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = pred.probs_tiled(img)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    mpix = size * size / 1e6 / dt

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "baselines", "torch_cpu.json"
    )
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        vs = mpix / base["mpix_per_sec"]

    print(json.dumps({
        "metric": f"overlap-tile inference throughput, {size}x{size}, full-width bf16 U-Net",
        "value": round(mpix, 3),
        "unit": "MPix/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else 1.0,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
