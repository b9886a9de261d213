"""Training-mode lanes conv (ops/pallas/conv3x3_train.py): custom-VJP
gradients vs jax autodiff of lax.conv (interpret mode, f32)."""

import jax
import jax.numpy as jnp
import numpy as np

from unetseg_tpu.ops.pallas.conv3x3 import (
    from_lanes_p2,
    lane_stride,
    to_lanes_p2,
)
from unetseg_tpu.ops.pallas.conv3x3_train import make_conv_p2_train


def _setup(n=21, ci=8, co=16, seed=10):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.rand(2, n, n, ci).astype(np.float32))
    w = jnp.asarray((rs.rand(3, 3, ci, co) - 0.5).astype(np.float32) * 0.2)
    bb = jnp.asarray((rs.rand(co) - 0.5).astype(np.float32))
    ct = jnp.asarray(rs.rand(2, n - 2, n - 2, co).astype(np.float32))
    return x, w, bb, ct


def test_conv_p2_train_grads_match_lax():
    n = 21
    x, w, bb, ct = _setup(n)
    stride = lane_stride(-(-n // 2))
    conv = make_conv_p2_train(stride, h_valid=n, interpret=True)

    def loss_lanes(x, w, bb):
        z = conv(to_lanes_p2(x), w, bb)
        zv = from_lanes_p2(z[: n - 2], 2, n - 2)
        return jnp.sum(zv * ct)

    def loss_ref(x, w, bb):
        z = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bb
        return jnp.sum(z * ct)

    g_lanes = jax.grad(loss_lanes, argnums=(0, 1, 2))(x, w, bb)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bb)
    for got, ref, name, tol in zip(
        g_lanes, g_ref, ("dx", "dw", "db"), (2e-4, 3e-3, 3e-3)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=tol, rtol=1e-4,
            err_msg=name,
        )


def test_conv_p2_train_forward_matches_lax():
    n = 20  # even width: uneven phase lanes on the output
    x, w, bb, ct = _setup(n, seed=11)
    stride = lane_stride(-(-n // 2))
    conv = make_conv_p2_train(stride, h_valid=n, interpret=True)
    z = conv(to_lanes_p2(x), w, bb)
    got = from_lanes_p2(z[: n - 2], 2, n - 2)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bb
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_conv_p2_train_grads_with_garbage_tail():
    """Gradients are exact even when the input buffer carries garbage tail
    rows (the raw-rows protocol) — the masks must keep it out of dW."""
    n = 21
    x, w, bb, ct = _setup(n, seed=12)
    stride = lane_stride(-(-n // 2))
    conv = make_conv_p2_train(stride, h_valid=n, interpret=True)
    xl = to_lanes_p2(x)
    garbage = jnp.full((5, xl.shape[1], xl.shape[2]), jnp.nan, xl.dtype)
    xl_g = jnp.concatenate([xl, garbage], axis=0)

    def loss(w, bb):
        z = conv(xl_g, w, bb)
        zv = from_lanes_p2(z[: n - 2], 2, n - 2)
        return jnp.sum(zv * ct)

    dw, db = jax.grad(loss, argnums=(0, 1))(w, bb)
    assert np.isfinite(np.asarray(dw)).all()
    assert np.isfinite(np.asarray(db)).all()

    def loss_ref(w, bb):
        z = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bb
        return jnp.sum(z * ct)

    dw_ref, db_ref = jax.grad(loss_ref, argnums=(0, 1))(w, bb)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=3e-3,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), atol=3e-3,
                               rtol=1e-4)


# ----------------------------------------------------- dense-layout VJP
def test_conv_dense_train_grads_match_lax():
    from unetseg_tpu.ops.pallas.conv3x3 import from_lanes, to_lanes
    from unetseg_tpu.ops.pallas.conv3x3_train import make_conv_dense_train

    n = 21
    x, w, bb, ct = _setup(n, seed=13)
    stride = lane_stride(n)
    conv = make_conv_dense_train(stride, h_valid=n, interpret=True)

    def loss_lanes(x, w, bb):
        z = conv(to_lanes(x), w, bb)
        zv = from_lanes(z[: n - 2], 2, n - 2)
        return jnp.sum(zv * ct)

    def loss_ref(x, w, bb):
        z = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bb
        return jnp.sum(z * ct)

    g_lanes = jax.grad(loss_lanes, argnums=(0, 1, 2))(x, w, bb)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bb)
    for got, ref, name, tol in zip(
        g_lanes, g_ref, ("dx", "dw", "db"), (2e-4, 3e-3, 3e-3)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=tol, rtol=1e-4,
            err_msg=name,
        )


def test_conv_dense_train_grads_with_garbage_tail():
    from unetseg_tpu.ops.pallas.conv3x3 import from_lanes, to_lanes
    from unetseg_tpu.ops.pallas.conv3x3_train import make_conv_dense_train

    n = 21
    x, w, bb, ct = _setup(n, seed=14)
    stride = lane_stride(n)
    conv = make_conv_dense_train(stride, h_valid=n, interpret=True)
    xl = to_lanes(x)
    garbage = jnp.full((5, xl.shape[1], xl.shape[2]), jnp.nan, xl.dtype)
    xl_g = jnp.concatenate([xl, garbage], axis=0)

    def loss(w, bb):
        z = conv(xl_g, w, bb)
        zv = from_lanes(z[: n - 2], 2, n - 2)
        return jnp.sum(zv * ct)

    dw, db = jax.grad(loss, argnums=(0, 1))(w, bb)
    assert np.isfinite(np.asarray(dw)).all()

    def loss_ref(w, bb):
        z = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bb
        return jnp.sum(z * ct)

    dw_ref, db_ref = jax.grad(loss_ref, argnums=(0, 1))(w, bb)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=3e-3,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), atol=3e-3,
                               rtol=1e-4)


def test_dec0_fused_train_matches_lax():
    """Fused decoder-entry conv (crop+concat folded into the kernels):
    forward and ALL gradients vs jax autodiff of the NHWC composition."""
    from unetseg_tpu.ops.pallas.conv3x3_train import make_dec0_p2_train

    ns, nu, cis, ciu, co = 20, 12, 8, 8, 16
    row_off = (ns - nu) // 2   # 4 (even; lane_off = 2)
    rs = np.random.RandomState(3)
    skip = jnp.asarray(rs.rand(2, ns, ns, cis).astype(np.float32))
    up = jnp.asarray(rs.rand(2, nu, nu, ciu).astype(np.float32))
    w = jnp.asarray((rs.rand(3, 3, cis + ciu, co) - 0.5).astype(np.float32))
    bb = jnp.asarray((rs.rand(co) - 0.5).astype(np.float32))
    ct = jnp.asarray(rs.rand(2, nu - 2, nu - 2, co).astype(np.float32))
    stride = lane_stride(-(-ns // 2))
    fused = make_dec0_p2_train(
        stride, up_w=nu, row_off=row_off, lane_off=row_off // 2,
        interpret=True,
    )

    def loss_lanes(skip, up, w, bb):
        z = fused(to_lanes_p2(skip), to_lanes_p2(up), w, bb)
        zv = from_lanes_p2(z[: nu - 2], 2, nu - 2)
        return jnp.sum(zv * ct)

    def loss_ref(skip, up, w, bb):
        crop = skip[:, row_off : row_off + nu, row_off : row_off + nu]
        cat = jnp.concatenate([crop, up], axis=-1)
        z = jax.lax.conv_general_dilated(
            cat, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bb
        return jnp.sum(z * ct)

    v_lanes = loss_lanes(skip, up, w, bb)
    v_ref = loss_ref(skip, up, w, bb)
    np.testing.assert_allclose(float(v_lanes), float(v_ref), rtol=1e-5)
    g_lanes = jax.grad(loss_lanes, argnums=(0, 1, 2, 3))(skip, up, w, bb)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(skip, up, w, bb)
    for got, ref, name, tol in zip(
        g_lanes, g_ref, ("dskip", "dup", "dw", "db"),
        (2e-4, 2e-4, 3e-3, 3e-3),
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=tol, rtol=1e-4,
            err_msg=name,
        )


def test_dec0_fused_train_garbage_up_rows():
    """The up operand rides raw-rows tconv buffers whose tail rows can be
    uninitialized (NaN) — gradients must stay exact."""
    from unetseg_tpu.ops.pallas.conv3x3_train import make_dec0_p2_train

    ns, nu, cis, ciu, co = 20, 12, 8, 8, 16
    row_off = (ns - nu) // 2
    rs = np.random.RandomState(4)
    skip = jnp.asarray(rs.rand(2, ns, ns, cis).astype(np.float32))
    up = jnp.asarray(rs.rand(2, nu, nu, ciu).astype(np.float32))
    w = jnp.asarray((rs.rand(3, 3, cis + ciu, co) - 0.5).astype(np.float32))
    bb = jnp.asarray((rs.rand(co) - 0.5).astype(np.float32))
    ct = jnp.asarray(rs.rand(2, nu - 2, nu - 2, co).astype(np.float32))
    stride = lane_stride(-(-ns // 2))
    fused = make_dec0_p2_train(
        stride, up_w=nu, row_off=row_off, lane_off=row_off // 2,
        interpret=True,
    )
    up_l = to_lanes_p2(up)
    garbage = jnp.full((6, up_l.shape[1], up_l.shape[2]), jnp.nan, up_l.dtype)
    up_lg = jnp.concatenate([up_l, garbage], axis=0)

    def loss(skip, w, bb):
        z = fused(to_lanes_p2(skip), up_lg, w, bb)
        zv = from_lanes_p2(z[: nu - 2], 2, nu - 2)
        return jnp.sum(zv * ct)

    def loss_ref(skip, w, bb):
        crop = skip[:, row_off : row_off + nu, row_off : row_off + nu]
        cat = jnp.concatenate([crop, up], axis=-1)
        z = jax.lax.conv_general_dilated(
            cat, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bb
        return jnp.sum(z * ct)

    g = jax.grad(loss, argnums=(0, 1, 2))(skip, w, bb)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(skip, w, bb)
    for got, ref, name in zip(g, g_ref, ("dskip", "dw", "db")):
        assert np.isfinite(np.asarray(got)).all(), name
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-3, rtol=1e-4,
            err_msg=name,
        )


def test_dec0_dense_fused_train_matches_lax():
    """Fused DENSE decoder-entry conv (tier-2 dec2): forward + all grads
    vs lax autodiff of the NHWC composition, odd crop offset allowed."""
    from unetseg_tpu.ops.pallas.conv3x3 import from_lanes, to_lanes
    from unetseg_tpu.ops.pallas.conv3x3_train import make_dec0_dense_train

    ns, nu, cis, ciu, co = 21, 12, 8, 8, 16
    row_off = 3  # odd: dense layout has no parity constraint
    rs = np.random.RandomState(5)
    skip = jnp.asarray(rs.rand(2, ns, ns, cis).astype(np.float32))
    up = jnp.asarray(rs.rand(2, nu, nu, ciu).astype(np.float32))
    w = jnp.asarray((rs.rand(3, 3, cis + ciu, co) - 0.5).astype(np.float32))
    bb = jnp.asarray((rs.rand(co) - 0.5).astype(np.float32))
    ct = jnp.asarray(rs.rand(2, nu - 2, nu - 2, co).astype(np.float32))
    stride = lane_stride(ns)
    fused = make_dec0_dense_train(
        stride, up_w=nu, row_off=row_off, lane_off=row_off,
        skip_rows_valid=ns, skip_w_valid=ns, interpret=True,
    )

    def pad_lanes(x):  # dense to_lanes pads width to the stride
        return to_lanes(jnp.pad(x, ((0, 0), (0, 0), (0, stride - x.shape[2]), (0, 0))))

    def loss_lanes(skip, up, w, bb):
        z = fused(pad_lanes(skip), pad_lanes(up), w, bb)
        zv = from_lanes(z[: nu - 2], 2, nu - 2)
        return jnp.sum(zv * ct)

    def loss_ref(skip, up, w, bb):
        crop = skip[:, row_off : row_off + nu, row_off : row_off + nu]
        cat = jnp.concatenate([crop, up], axis=-1)
        z = jax.lax.conv_general_dilated(
            cat, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bb
        return jnp.sum(z * ct)

    np.testing.assert_allclose(
        float(loss_lanes(skip, up, w, bb)), float(loss_ref(skip, up, w, bb)),
        rtol=1e-5,
    )
    g_lanes = jax.grad(loss_lanes, argnums=(0, 1, 2, 3))(skip, up, w, bb)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(skip, up, w, bb)
    for got, ref, name, tol in zip(
        g_lanes, g_ref, ("dskip", "dup", "dw", "db"),
        (2e-4, 2e-4, 3e-3, 3e-3),
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=tol, rtol=1e-4,
            err_msg=name,
        )
