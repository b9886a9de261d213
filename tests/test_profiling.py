"""Profiling utility tests (CPU backend)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from unetseg_tpu.utils.profiling import DeviceTimer, annotate, memory_stats, trace


def test_device_timer_blocks():
    t = DeviceTimer()
    x = jax.jit(lambda a: a @ a)(jnp.ones((128, 128)))
    dt = t.stop(x)
    assert dt > 0


def test_annotate_and_trace_noop():
    with trace(None):
        with annotate("step"):
            jnp.ones((4,)).sum()


def test_trace_writes_files(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        jax.jit(lambda a: a * 2)(jnp.ones((64, 64))).block_until_ready()
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert files, "profiler wrote nothing"


def test_memory_stats_shape():
    s = memory_stats()
    assert len(s) == jax.device_count()
