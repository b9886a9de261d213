"""Width-packed conv: exact equivalence with the direct 3x3 valid conv."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unetseg_tpu.ops.packed_conv import (
    pack_kernel_3x3,
    pack_width,
    packed_conv3x3_valid,
    should_pack,
    unpack_width,
)


def _direct(x, k, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID", dimension_numbers=dn)
    return y + b


@pytest.mark.parametrize("cin,cout", [(1, 4), (4, 4), (8, 4), (3, 5)])
def test_packed_equals_direct(cin, cout):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 10, 12, cin).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, cin, cout).astype(np.float32) * 0.2)
    b = jnp.asarray(rs.randn(cout).astype(np.float32) * 0.1)
    ours = packed_conv3x3_valid(x, k, b)
    ref = _direct(x, k, b)
    assert ours.shape == ref.shape == (2, 8, 10, cout)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_pack_unpack_roundtrip():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 3, 8, 4).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_width(pack_width(x))), np.asarray(x))


def test_pack_kernel_structure():
    rs = np.random.RandomState(2)
    k = jnp.asarray(rs.randn(3, 3, 2, 3).astype(np.float32))
    p = np.asarray(pack_kernel_3x3(k))
    assert p.shape == (3, 2, 4, 6)
    # b_out=0, kw=0, ci_blk=0 -> dx=0 slot holds K[:,0]
    np.testing.assert_array_equal(p[:, 0, 0:2, 0:3], np.asarray(k)[:, 0])
    # b_out=0, kw=1, ci_blk=1 -> dx=3 invalid -> zeros
    assert (p[:, 1, 2:4, 0:3] == 0).all()


def test_odd_width_rejected():
    x = jnp.zeros((1, 6, 7, 2))
    with pytest.raises(AssertionError):
        pack_width(x)
    assert not should_pack(7, 4, 2)
    assert should_pack(510, 64, 64)
    assert not should_pack(510, 128, 64)


def test_bf16_packed_matches_direct_coarsely():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 8, 8, 4).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rs.randn(3, 3, 4, 4).astype(np.float32) * 0.2).astype(jnp.bfloat16)
    b = jnp.zeros((4,), jnp.bfloat16)
    ours = packed_conv3x3_valid(x, k, b).astype(jnp.float32)
    ref = _direct(x, k, b).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=5e-2)
