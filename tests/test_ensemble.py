"""Deep-ensemble Predictor (params/batch_stats as lists): the averaged
program must equal the mean of the members' probabilities exactly, through
both the direct and overlap-tile paths, and the sequence writer must work
end-to-end. Tiny real U-Net on CPU."""

import os

import numpy as np
import pytest

import jax

from unetseg_tpu.core.config import InferConfig, ModelConfig
from unetseg_tpu.infer.engine import Predictor
from unetseg_tpu.models.unet import UNet, init_unet

TINY = ModelConfig(compute_dtype="float32", base_features=4)
SIZE = 188  # net output 4
ICFG = InferConfig(
    image_size=SIZE, tile_input=SIZE, tile_batch=4, min_cell_size=1
)


@pytest.fixture(scope="module")
def nets():
    model = UNet(cfg=TINY)
    vs = [init_unet(model, jax.random.key(s), input_size=SIZE) for s in (0, 1)]
    members = [
        Predictor(model=model, params=v["params"],
                  batch_stats=v["batch_stats"], cfg=ICFG)
        for v in vs
    ]
    ens = Predictor(
        model=model,
        params=[v["params"] for v in vs],
        batch_stats=[v["batch_stats"] for v in vs],
        cfg=ICFG,
    )
    return members, ens


def test_probs_is_member_mean(nets):
    members, ens = nets
    imgs = np.random.RandomState(0).rand(2, SIZE, SIZE).astype(np.float32)
    want = np.mean([np.asarray(m.probs(imgs)) for m in members], axis=0)
    got = np.asarray(ens.probs(imgs))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_tiled_probs_is_member_mean(nets):
    # stitching selects/concats per-tile probabilities, so the mean commutes
    members, ens = nets
    img = np.random.RandomState(1).rand(50, 70).astype(np.float32)
    want = np.mean([m.probs_tiled(img) for m in members], axis=0)
    got = ens.probs_tiled(img)
    assert got.shape == (50, 70)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_predict_sequence_ensemble(nets, tmp_path):
    from PIL import Image

    _, ens = nets
    seq = tmp_path / "01"
    seq.mkdir()
    rng = np.random.RandomState(2)
    for t in range(2):
        Image.fromarray(
            (rng.rand(SIZE, SIZE) * 255).astype(np.uint8)
        ).save(seq / f"t{t:03d}.tif")
    out_m = tmp_path / "masks"
    out_i = tmp_path / "inst"
    written = ens.predict_sequence(str(seq), str(out_m), str(out_i))
    assert len(written) == 4
    assert all(os.path.exists(p) for p in written)


def test_single_dir_list_falls_back(nets):
    # from_checkpoints with one dir must behave as from_checkpoint; here we
    # just pin the constructor-level ensemble detection
    members, _ = nets
    assert not isinstance(members[0]._variables, (list, tuple))


def test_ensemble_merge_gmean_and_vote(nets):
    """gmean == exp(mean(log p)) of members; vote == pixel majority of
    per-member thresholded masks (exact, not approximate)."""
    import dataclasses

    members, ens = nets
    imgs = np.random.RandomState(3).rand(2, SIZE, SIZE).astype(np.float32)
    member_p = [np.asarray(m.probs(imgs)) for m in members]

    g = Predictor(
        model=ens.model, params=ens.params, batch_stats=ens.batch_stats,
        cfg=dataclasses.replace(ICFG, ensemble_merge="gmean"),
    )
    got = np.asarray(g.probs(imgs))
    want = np.exp(np.mean([np.log(p + 1e-7) for p in member_p], axis=0))
    np.testing.assert_allclose(got, want, atol=1e-5)

    v = Predictor(
        model=ens.model, params=ens.params, batch_stats=ens.batch_stats,
        cfg=dataclasses.replace(ICFG, ensemble_merge="vote"),
    )
    got_v = np.asarray(v.probs(imgs))
    votes = np.sum([p > ICFG.threshold for p in member_p], axis=0)
    want_v = (votes * 2 > len(member_p)).astype(np.float32)
    np.testing.assert_array_equal(got_v, want_v)
    # downstream threshold reproduces the member-majority mask
    assert set(np.unique(got_v)) <= {0.0, 1.0}
