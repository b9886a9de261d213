"""Train/eval step tests on a tiny net + SGD-momentum parity vs torch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unetseg_tpu.core.config import ModelConfig, TrainConfig
from unetseg_tpu.models.unet import UNet
from unetseg_tpu.train.state import create_train_state, make_optimizer
from unetseg_tpu.train.steps import make_eval_step, make_train_step

TINY = ModelConfig(compute_dtype="float32", base_features=4)
SIZE = 188  # smallest valid U-Net input; output 4x4


@pytest.fixture(scope="module")
def tiny_state():
    model = UNet(cfg=TINY)
    state = create_train_state(
        jax.random.key(0), model_cfg=TINY, train_cfg=TrainConfig(),
        input_size=SIZE, model=model,
    )
    return model, state


def _batch(b=2):
    rs = np.random.RandomState(0)
    images = rs.rand(b, SIZE, SIZE).astype(np.float32)
    masks = (rs.rand(b, SIZE, SIZE) > 0.6).astype(np.int32) * 5
    weights = (rs.rand(b, SIZE, SIZE).astype(np.float32) + 0.5)
    valid = np.ones((b,), bool)
    return images, masks, weights, valid


def test_train_step_reduces_loss(tiny_state):
    model, state = tiny_state
    step = make_train_step(model, augment=False, donate=False)
    images, masks, weights, valid = _batch()
    losses = []
    for i in range(8):
        state, m = step(state, images, masks, weights, valid, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_train_step_with_augmentation_runs(tiny_state):
    model, state = tiny_state
    step = make_train_step(
        model, augment=True, elastic_alpha=300.0, elastic_sigma=10.0, donate=False
    )
    images, masks, weights, valid = _batch()
    state, m = step(state, images, masks, weights, valid, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_padded_items_do_not_affect_loss(tiny_state):
    """A padded (invalid) item must not change the loss value."""
    model, state = tiny_state
    step = make_train_step(model, augment=False, donate=False)
    images, masks, weights, valid = _batch(2)
    # batch of 2 valid
    _, m2 = step(state, images, masks, weights, valid, jax.random.key(0))
    # same 2 + 2 garbage pad items marked invalid
    pad_img = np.concatenate([images, images * 0 + 0.777])
    pad_mask = np.concatenate([masks, masks * 0 + 1])
    pad_w = np.concatenate([weights, weights * 0 + 9.0])
    pad_valid = np.array([True, True, False, False])
    _, m4 = step(state, pad_img, pad_mask, pad_w, pad_valid, jax.random.key(0))
    assert abs(float(m2["loss"]) - float(m4["loss"])) < 1e-6


def test_eval_step_metrics(tiny_state):
    model, state = tiny_state
    estep = make_eval_step(model)
    images, masks, _, valid = _batch()
    m = estep(state, images, masks, valid)
    assert set(m) == {"val_loss", "val_acc", "val_iou"}
    assert 0.0 <= float(m["val_acc"]) <= 1.0
    assert 0.0 <= float(m["val_iou"]) <= 1.0


def test_sgd_momentum_matches_torch():
    """optax.sgd(momentum=0.99) must track torch.optim.SGD exactly
    (reference: scripts/train.py:97)."""
    torch = pytest.importorskip("torch")
    import optax

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array(g, np.float32) for g in ([0.1, -0.2, 0.3], [0.5, 0.1, -0.4], [-0.3, 0.2, 0.1])]

    tx = make_optimizer(TrainConfig(learning_rate=0.1, momentum=0.99))
    p = jnp.asarray(w0)
    opt_state = tx.init(p)
    for g in grads:
        upd, opt_state = tx.update(jnp.asarray(g), opt_state, p)
        p = optax.apply_updates(p, upd)

    pt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([pt], lr=0.1, momentum=0.99)
    for g in grads:
        opt.zero_grad()
        pt.grad = torch.from_numpy(g.copy())
        opt.step()

    np.testing.assert_allclose(np.asarray(p), pt.detach().numpy(), atol=1e-6)


def test_assume_valid_matches_masked_when_all_valid():
    """assume_valid=True drops BN item masking statically; with an all-true
    valid vector the step must be numerically equivalent (same stats, same
    gradients) to the masked step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unetseg_tpu.core.config import ModelConfig
    from unetseg_tpu.models.unet import UNet
    from unetseg_tpu.train.state import create_train_state
    from unetseg_tpu.train.steps import make_train_step

    tiny = ModelConfig(compute_dtype="float32", base_features=4)
    model = UNet(cfg=tiny)
    state = create_train_state(
        jax.random.key(0), model_cfg=tiny, input_size=188, model=model
    )
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(2, 188, 188), jnp.float32)
    msks = jnp.asarray((rs.rand(2, 188, 188) > 0.6).astype(np.int32))
    wms = jnp.ones((2, 188, 188), jnp.float32)
    valid = jnp.ones((2,), bool)
    key = jax.random.key(3)

    sa = make_train_step(model, augment=False, donate=False,
                         assume_valid=True)
    sm = make_train_step(model, augment=False, donate=False)
    st_a, m_a = sa(state, imgs, msks, wms, valid, key)
    st_m, m_m = sm(state, imgs, msks, wms, valid, key)
    # jnp.mean vs masked-sum/n differ only in reduction order (~1e-6 ulp)
    assert abs(float(m_a["loss"]) - float(m_m["loss"])) < 1e-5
    for pa, pm in zip(jax.tree.leaves(st_a.params), jax.tree.leaves(st_m.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pm), atol=1e-5)
    for ba, bm in zip(
        jax.tree.leaves(st_a.batch_stats), jax.tree.leaves(st_m.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(ba), np.asarray(bm), atol=1e-5)
