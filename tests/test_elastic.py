"""Elastic deformation: scipy-parity of each stage + determinism."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unetseg_tpu.ops.elastic import (
    elastic_deform,
    elastic_deform_batch,
    gaussian_blur_2d,
    gaussian_kernel1d,
    sample_2d,
)


def test_gaussian_kernel_matches_scipy_radius():
    # scipy radius = int(truncate*sigma + 0.5)
    k = gaussian_kernel1d(sigma=20.0, truncate=4.0)
    assert k.shape[0] == 2 * int(4.0 * 20 + 0.5) + 1
    assert abs(float(k.sum()) - 1.0) < 1e-6


def test_gaussian_blur_matches_scipy_constant_mode():
    from scipy.ndimage import gaussian_filter

    rs = np.random.RandomState(0)
    x = rs.rand(40, 50).astype(np.float32) * 2 - 1
    ours = np.asarray(gaussian_blur_2d(jnp.asarray(x), sigma=3.0))
    ref = gaussian_filter(x, 3.0, mode="constant", cval=0.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("order", [0, 1])
def test_map_coordinates_matches_scipy_reflect(order):
    from scipy.ndimage import map_coordinates

    rs = np.random.RandomState(1)
    img = rs.rand(30, 35).astype(np.float32)
    dy = rs.randn(30, 35).astype(np.float32) * 4
    dx = rs.randn(30, 35).astype(np.float32) * 4
    yy = np.arange(30, dtype=np.float32)[:, None] + dy
    xx = np.arange(35, dtype=np.float32)[None, :] + dx
    ours = np.asarray(sample_2d(jnp.asarray(img), jnp.asarray(yy), jnp.asarray(xx), order=order))
    ref = map_coordinates(
        img, [yy.reshape(-1), xx.reshape(-1)], order=order, mode="reflect"
    ).reshape(30, 35)
    if order == 0:
        # nearest-neighbour ties at .5 can legitimately differ; require
        # almost-everywhere agreement
        frac = np.mean(ours == ref)
        assert frac > 0.99
    else:
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_elastic_deform_deterministic_and_label_preserving():
    rs = np.random.RandomState(2)
    img = rs.rand(64, 64).astype(np.float32)
    mask = (rs.rand(64, 64) > 0.7).astype(np.int32) * 3  # labels {0,3}
    k = jax.random.key(42)
    i1, m1 = elastic_deform(k, jnp.asarray(img), jnp.asarray(mask), alpha=200.0, sigma=8.0)
    i2, m2 = elastic_deform(k, jnp.asarray(img), jnp.asarray(mask), alpha=200.0, sigma=8.0)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    # nearest sampling preserves the label set
    assert set(np.unique(np.asarray(m1))) <= {0, 3}
    # a different key gives a different field
    i3, _ = elastic_deform(jax.random.key(43), jnp.asarray(img), jnp.asarray(mask), alpha=200.0, sigma=8.0)
    assert not np.allclose(np.asarray(i1), np.asarray(i3))


def test_elastic_deform_actually_moves_pixels():
    img = np.zeros((64, 64), np.float32)
    img[20:40, 20:40] = 1.0
    out, _ = elastic_deform(
        jax.random.key(0), jnp.asarray(img), jnp.asarray(img.astype(np.int32)),
        alpha=500.0, sigma=8.0,
    )
    assert not np.allclose(np.asarray(out), img)


def test_blur_band_matrix_is_trace_time_constant():
    """The banded blur matrix depends only on static args, so it must enter
    traced programs as a literal constant — not be rebuilt per call. Built
    with jnp ops it lowered to a size² gather from the kernel taps inside
    the train step, re-executed every scanned iteration (~2 ms/step on the
    chip). Pin that the blur's jaxpr carries no gather/iota/exp — nothing
    but the two matmuls on a constant."""
    jaxpr = jax.make_jaxpr(lambda x: gaussian_blur_2d(x, sigma=3.0))(
        jnp.zeros((40, 50), jnp.float32)
    )
    prims = {eqn.primitive.name for eqn in jaxpr.eqns}
    assert "gather" not in prims and "exp" not in prims, prims
    # BOTH band matrices arrive as constants — (40,40) for rows, (50,50) for
    # cols. Anything weaker would let one of the two silently regress to a
    # rebuilt-per-trace matrix as long as it avoids gather/exp.
    const_shapes = sorted(tuple(c.shape) for c in jaxpr.consts)
    assert const_shapes == [(40, 40), (50, 50)], const_shapes
    # and the only heavy primitives are the two matmuls on those constants
    heavy = [n for n in prims if n in ("dot_general", "conv_general_dilated")]
    assert heavy == ["dot_general"], prims
    assert sum(e.primitive.name == "dot_general" for e in jaxpr.eqns) == 2


def test_elastic_deform_batch_per_item_keys():
    rs = np.random.RandomState(3)
    imgs = rs.rand(3, 48, 48).astype(np.float32)
    masks = (imgs > 0.5).astype(np.int32)
    out_i, out_m = elastic_deform_batch(
        jax.random.key(0), jnp.asarray(imgs), jnp.asarray(masks), alpha=300.0, sigma=6.0
    )
    assert out_i.shape == (3, 48, 48)
    # items get independent fields
    assert not np.allclose(np.asarray(out_i[0]), np.asarray(out_i[1]))
