"""Batched flat-take deformation matches the per-item map_coordinates path."""

import numpy as np
import jax
import jax.numpy as jnp

from unetseg_tpu.ops.elastic import (
    elastic_deform,
    elastic_deform_batch,
    reflect_index,
)


def test_reflect_index_scipy_semantics():
    # scipy 'reflect': (d c b a | a b c d | d c b a) for n=4
    idx = jnp.asarray([-2, -1, 0, 3, 4, 5, 8, -5])
    out = np.asarray(reflect_index(idx, 4))
    # -5 wraps into the second reflection copy: ... -5:d -4:d? no — pattern
    # left of 0 is a b c d then d c b a, so -5 -> d (3)
    np.testing.assert_array_equal(out, [1, 0, 0, 3, 3, 2, 0, 3])


def test_batch_matches_per_item_path():
    rs = np.random.RandomState(0)
    imgs = rs.rand(3, 48, 48).astype(np.float32)
    masks = (rs.rand(3, 48, 48) > 0.6).astype(np.int32) * 4
    key = jax.random.key(5)
    bi, bm = elastic_deform_batch(
        key, jnp.asarray(imgs), jnp.asarray(masks), alpha=300.0, sigma=6.0
    )
    keys = jax.random.split(key, 3)
    for k in range(3):
        si, sm = elastic_deform(
            keys[k], jnp.asarray(imgs[k]), jnp.asarray(masks[k]),
            alpha=300.0, sigma=6.0,
        )
        np.testing.assert_allclose(np.asarray(bi[k]), np.asarray(si), atol=1e-4)
        # nearest path can differ at exact .5 ties; require almost-everywhere
        agree = (np.asarray(bm[k]) == np.asarray(sm)).mean()
        assert agree > 0.995, agree


def test_batch_label_preservation():
    rs = np.random.RandomState(1)
    imgs = rs.rand(2, 40, 40).astype(np.float32)
    masks = (rs.rand(2, 40, 40) > 0.5).astype(np.int32) * 7
    _, bm = elastic_deform_batch(
        jax.random.key(0), jnp.asarray(imgs), jnp.asarray(masks),
        alpha=200.0, sigma=5.0,
    )
    assert set(np.unique(np.asarray(bm))) <= {0, 7}
