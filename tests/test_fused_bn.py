"""Fused custom-VJP BatchNorm+ReLU (ops/fused_bn.py) parity vs the
autodiff'd reference composition in models/lanes_train.py.

Each variant must match the existing helper in value AND in every input
gradient (z, gamma, beta, running mean/var), including through the
new-running-stats outputs, with NaN garbage rows and finite garbage lanes
present. The DP test checks the shard_map psum path reproduces the
single-device global gradient exactly (the transpose-of-psum convention
the module relies on)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu.models import lanes_train as lt
from unetseg_tpu.ops.fused_bn import (
    make_bn_relu_dense,
    make_bn_relu_nhwc,
    make_bn_relu_p2,
)

H_BUF, H_VALID = 12, 9
W_VALID = 6
STRIDE = 8
N_ITEMS = 3
NCH = 5
MOM, EPS = 0.99, 1e-5


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def _p2_inputs(masked, dtype=jnp.float32, nan_rows=True):
    k = jax.random.split(jax.random.key(0), 8)
    z = _rand(k[0], (H_BUF, 2 * NCH, N_ITEMS * STRIDE), dtype)
    if nan_rows:  # garbage rows must be invisible everywhere
        z = z.at[H_VALID:].set(jnp.nan)
    # garbage lanes: finite but large (excluded from stats, visible in y)
    z = z.at[:H_VALID, :, W_VALID:STRIDE].multiply(7.0)
    gamma = _rand(k[1], (NCH,)) * 0.5 + 1.0
    beta = _rand(k[2], (NCH,))
    rm = _rand(k[3], (NCH,))
    rv = jnp.abs(_rand(k[4], (NCH,))) + 0.5
    im = jnp.array([True, False, True]) if masked else None
    return z, gamma, beta, rm, rv, im


def _loss_weights(y_shape, key=7):
    k = jax.random.split(jax.random.key(key), 3)
    return (
        _rand(k[0], y_shape),
        _rand(k[1], (NCH,)),
        _rand(k[2], (NCH,)),
    )


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("relu", [True, False])
def test_p2_matches_reference(masked, relu):
    z, gamma, beta, rm, rv, im = _p2_inputs(masked)
    wy, wm, wv = _loss_weights(z.shape)

    def ref_loss(z, gamma, beta, rm, rv):
        y, st = lt._bn_relu_lanes(
            z, {"scale": gamma, "bias": beta}, {"mean": rm, "var": rv},
            H_VALID, W_VALID, im, STRIDE, MOM, EPS, relu=relu,
        )
        return (
            jnp.sum(wy * jnp.nan_to_num(y))
            + jnp.sum(wm * st["mean"])
            + jnp.sum(wv * st["var"])
        )

    fn = make_bn_relu_p2(
        NCH, H_VALID, W_VALID, STRIDE, MOM, EPS, relu=relu, masked=masked
    )
    imf = im if im is not None else jnp.ones((N_ITEMS,), bool)

    def fused_loss(z, gamma, beta, rm, rv):
        y, nm, nv = fn(z, gamma, beta, rm, rv, imf)
        return (
            jnp.sum(wy * jnp.nan_to_num(y))
            + jnp.sum(wm * nm)
            + jnp.sum(wv * nv)
        )

    lr = ref_loss(z, gamma, beta, rm, rv)
    lf = fused_loss(z, gamma, beta, rm, rv)
    np.testing.assert_allclose(lf, lr, rtol=2e-6)

    gr = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(z, gamma, beta, rm, rv)
    gf = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4))(z, gamma, beta, rm, rv)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.nan_to_num(np.asarray(a)), np.nan_to_num(np.asarray(b)),
            rtol=2e-5, atol=2e-6,
        )


@pytest.mark.parametrize("masked", [False, True])
def test_dense_matches_reference(masked):
    z, gamma, beta, rm, rv, im = _p2_inputs(masked)
    z = z[:, :NCH]  # dense: single phase
    wy, wm, wv = _loss_weights(z.shape)

    def ref_loss(z, gamma, beta, rm, rv):
        y, st = lt._bn_relu_lanes_dense(
            z, {"scale": gamma, "bias": beta}, {"mean": rm, "var": rv},
            H_VALID, W_VALID, im, STRIDE, MOM, EPS,
        )
        return (
            jnp.sum(wy * jnp.nan_to_num(y))
            + jnp.sum(wm * st["mean"])
            + jnp.sum(wv * st["var"])
        )

    fn = make_bn_relu_dense(
        H_VALID, W_VALID, STRIDE, MOM, EPS, masked=masked
    )
    imf = im if im is not None else jnp.ones((N_ITEMS,), bool)

    def fused_loss(z, gamma, beta, rm, rv):
        y, nm, nv = fn(z, gamma, beta, rm, rv, imf)
        return (
            jnp.sum(wy * jnp.nan_to_num(y))
            + jnp.sum(wm * nm)
            + jnp.sum(wv * nv)
        )

    np.testing.assert_allclose(
        fused_loss(z, gamma, beta, rm, rv),
        ref_loss(z, gamma, beta, rm, rv), rtol=2e-6,
    )
    gr = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(z, gamma, beta, rm, rv)
    gf = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4))(z, gamma, beta, rm, rv)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.nan_to_num(np.asarray(a)), np.nan_to_num(np.asarray(b)),
            rtol=2e-5, atol=2e-6,
        )


@pytest.mark.parametrize("masked", [False, True])
def test_nhwc_matches_reference(masked, monkeypatch):
    # This synthetic loss differentiates through the RUNNING STATS, where
    # the conv bias has a real gradient; the shipped default stop-grads the
    # pre-BN bias (its gradient through the training loss — which never
    # reads stats — is exactly zero). Compare in faithful mode; the sg
    # default is covered by test_bias_stop_gradient_default.
    monkeypatch.setenv("UNETSEG_BIAS_SG", "0")
    k = jax.random.split(jax.random.key(1), 8)
    B, HH, WW = 4, 5, 6
    x = _rand(k[0], (B, HH + 2, WW + 2, 3))
    kern = _rand(k[1], (3, 3, 3, NCH)) * 0.2
    bias = _rand(k[2], (NCH,)) * 0.1
    gamma = _rand(k[3], (NCH,)) * 0.5 + 1.0
    beta = _rand(k[4], (NCH,))
    rm = _rand(k[5], (NCH,))
    rv = jnp.abs(_rand(k[6], (NCH,))) + 0.5
    im = jnp.array([True, False, True, True]) if masked else None
    wy = _rand(k[7], (B, HH, WW, NCH))
    wm = _rand(jax.random.key(8), (NCH,))
    wv = _rand(jax.random.key(9), (NCH,))

    def ref_loss(x, kern, bias, gamma, beta, rm, rv):
        y, st = lt._conv_bn_relu_nhwc(
            x, {"kernel": kern, "bias": bias},
            {"scale": gamma, "bias": beta}, {"mean": rm, "var": rv},
            im, MOM, EPS, jnp.float32,
        )
        return (
            jnp.sum(wy * y) + jnp.sum(wm * st["mean"]) + jnp.sum(wv * st["var"])
        )

    fn = make_bn_relu_nhwc(MOM, EPS, masked=masked)
    imf = im if im is not None else jnp.ones((B,), bool)

    def fused_loss(x, kern, bias, gamma, beta, rm, rv):
        z = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + bias
        y, nm, nv = fn(z, gamma, beta, rm, rv, imf)
        return jnp.sum(wy * y) + jnp.sum(wm * nm) + jnp.sum(wv * nv)

    args = (x, kern, bias, gamma, beta, rm, rv)
    np.testing.assert_allclose(
        fused_loss(*args), ref_loss(*args), rtol=2e-6
    )
    gr = jax.grad(ref_loss, argnums=tuple(range(7)))(*args)
    gf = jax.grad(fused_loss, argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=4e-5, atol=4e-6
        )


def test_p2_dp_matches_reference_dp():
    """shard_map over 2 devices with axis_name: the fused VJP's psum
    placement must reproduce the autodiff'd reference under the SAME mesh
    and shard split (this isolates the transpose-of-psum convention from
    f32 reduction-order noise, which already costs ~1e-4 between DP and
    single-device in the reference itself)."""
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()[:2]
    n_dev = len(devs)
    if n_dev < 2:
        pytest.skip("needs >=2 devices")
    z, gamma, beta, rm, rv, _ = _p2_inputs(False, nan_rows=False)
    # garbage rows large-finite here (NaN hygiene is covered by the
    # single-device tests; the theta-scale path below would turn masked
    # NaN x 0 into NaN in the theta gradient)
    z = z.at[H_VALID:].set(1e3)
    # duplicate items so the batch splits evenly across 2 shards
    z = jnp.concatenate([z, z * 0.5 + 0.1], axis=2)
    wy, wm, wv = _loss_weights(z.shape)

    mesh = Mesh(np.array(devs), ("d",))
    fn_s = make_bn_relu_p2(
        NCH, H_VALID, W_VALID, STRIDE, MOM, EPS, axis_name="d"
    )

    def fused_shard_loss(z_sh, wy_sh, gamma, beta):
        im_sh = jnp.ones((z_sh.shape[2] // STRIDE,), bool)
        y, nm, nv = fn_s(z_sh, gamma, beta, rm, rv, im_sh)
        # stats outputs are replicated; weight them once per shard / n_dev
        return (
            jnp.sum(wy_sh * jnp.nan_to_num(y))
            + (jnp.sum(wm * nm) + jnp.sum(wv * nv)) / n_dev
        )

    def ref_shard_loss(z_sh, wy_sh, gamma, beta):
        y, st = lt._bn_relu_lanes(
            z_sh, {"scale": gamma, "bias": beta}, {"mean": rm, "var": rv},
            H_VALID, W_VALID, None, STRIDE, MOM, EPS, axis_name="d",
        )
        return (
            jnp.sum(wy_sh * jnp.nan_to_num(y))
            + (jnp.sum(wm * st["mean"]) + jnp.sum(wv * st["var"])) / n_dev
        )

    def dp_grads(loss):
        # the production pattern (parallel/sharding.py): params enter the
        # shard_map body as replicated ARGUMENTS, value_and_grad runs per
        # shard, grads are explicitly psummed. theta scales the BN input —
        # a parameter-path gradient that must see the cross-shard stats
        # terms through the psums.
        def body(z_sh, wy_sh, theta, gamma, beta):
            def wrapped(theta, gamma, beta):
                return loss(theta * z_sh, wy_sh, gamma, beta)

            gt, gg, gb = jax.grad(wrapped, argnums=(0, 1, 2))(
                theta, gamma, beta
            )
            return jax.lax.psum((gt, gg, gb), "d")

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(None, None, "d"), P(None, None, "d"), P(), P(), P()),
            out_specs=(P(), P(), P()),
            # production semantics (parallel/sharding.py): with vma
            # tracking ON, shard_map AD inserts its own psums on replicated
            # -input cotangents and the explicit grad psum would double-
            # count; the production step runs check_vma=False, where
            # transpose-of-psum is psum and the explicit grad psum is the
            # correct (and required) completion.
            check_vma=False,
        )(z, wy, jnp.float32(1.0), gamma, beta)

    # single-device global truth (fused == reference single-device is
    # covered by the exactness tests above)
    def global_loss(theta, gamma, beta):
        y, st = lt._bn_relu_lanes(
            theta * z, {"scale": gamma, "bias": beta},
            {"mean": rm, "var": rv},
            H_VALID, W_VALID, None, STRIDE, MOM, EPS,
        )
        return (
            jnp.sum(wy * jnp.nan_to_num(y))
            + jnp.sum(wm * st["mean"]) + jnp.sum(wv * st["var"])
        )

    truth = jax.grad(global_loss, argnums=(0, 1, 2))(
        jnp.float32(1.0), gamma, beta
    )
    got = dp_grads(fused_shard_loss)
    want = dp_grads(ref_shard_loss)
    for a, b, tr in zip(got, want, truth):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(tr), rtol=1e-3, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(tr), rtol=1e-3, atol=1e-5,
        )


def test_bias_stop_gradient_default():
    """Default mode pins the pre-BN conv bias: zero gradient, and every
    OTHER gradient matches faithful mode through a training-style loss
    (which reads only y, never the running stats — where the true bias
    gradient is exactly zero)."""
    import os

    k = jax.random.split(jax.random.key(2), 8)
    B, HH, WW = 4, 5, 6
    x = _rand(k[0], (B, HH + 2, WW + 2, 3))
    kern = _rand(k[1], (3, 3, 3, NCH)) * 0.2
    bias = _rand(k[2], (NCH,)) * 0.1
    gamma = _rand(k[3], (NCH,)) * 0.5 + 1.0
    beta = _rand(k[4], (NCH,))
    rm = _rand(k[5], (NCH,))
    rv = jnp.abs(_rand(k[6], (NCH,))) + 0.5
    wy = _rand(k[7], (B, HH, WW, NCH))

    def loss(x, kern, bias, gamma, beta):
        y, _ = lt._conv_bn_relu_nhwc(
            x, {"kernel": kern, "bias": bias},
            {"scale": gamma, "bias": beta}, {"mean": rm, "var": rv},
            None, MOM, EPS, jnp.float32,
        )
        return jnp.sum(wy * y)

    args = (x, kern, bias, gamma, beta)
    old = os.environ.get("UNETSEG_BIAS_SG")
    try:
        os.environ["UNETSEG_BIAS_SG"] = "1"
        g_sg = jax.grad(loss, argnums=tuple(range(5)))(*args)
        os.environ["UNETSEG_BIAS_SG"] = "0"
        g_ff = jax.grad(loss, argnums=tuple(range(5)))(*args)
    finally:
        if old is None:
            os.environ.pop("UNETSEG_BIAS_SG", None)
        else:
            os.environ["UNETSEG_BIAS_SG"] = old
    np.testing.assert_array_equal(np.asarray(g_sg[2]), 0.0)
    # the faithful bias grad through y is float NOISE around the exact 0
    assert float(np.abs(np.asarray(g_ff[2])).max()) < 1e-4
    for i in (0, 1, 3, 4):  # x, kernel, gamma, beta identical
        np.testing.assert_allclose(
            np.asarray(g_sg[i]), np.asarray(g_ff[i]), rtol=2e-5, atol=2e-6
        )


@pytest.mark.parametrize("variant", ["p2", "dense", "nhwc"])
def test_tie_from_y_matches_pre_recompute(variant, monkeypatch):
    """UNETSEG_BN_TIE=y (ReLU gate from the saved forward output) must
    reproduce the default pre-recompute backward exactly on generic data —
    the modes differ only at exact pre == 0 ties, measure-zero here. The
    default path is autodiff-parity-tested above, so equality transfers.
    The env flag is read at TRACE time, so each grad is evaluated (untraced
    jax.grad) with the flag set around the call."""
    z, gamma, beta, rm, rv, im = _p2_inputs(True)
    if variant == "p2":
        fn = make_bn_relu_p2(NCH, H_VALID, W_VALID, STRIDE, MOM, EPS,
                             relu=True, masked=True)
    elif variant == "dense":
        z = z[:, :NCH]
        fn = make_bn_relu_dense(H_VALID, W_VALID, STRIDE, MOM, EPS,
                                masked=True)
    else:
        z = jax.random.normal(jax.random.key(3), (N_ITEMS, 4, 5, NCH))
        im = jnp.array([True, False, True])
        fn = make_bn_relu_nhwc(MOM, EPS, masked=True)
    wy, wm, wv = _loss_weights(z.shape)

    def loss(z, gamma, beta, rm, rv):
        y, nm, nv = fn(z, gamma, beta, rm, rv, im)
        return (jnp.sum(wy * jnp.nan_to_num(y))
                + jnp.sum(wm * nm) + jnp.sum(wv * nv))

    grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
    monkeypatch.setenv("UNETSEG_BN_TIE", "")
    g_pre = grad(z, gamma, beta, rm, rv)
    monkeypatch.setenv("UNETSEG_BN_TIE", "y")
    g_tie = grad(z, gamma, beta, rm, rv)
    for a, b in zip(g_tie, g_pre):
        np.testing.assert_array_equal(
            np.nan_to_num(np.asarray(a)), np.nan_to_num(np.asarray(b))
        )
