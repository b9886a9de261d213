"""Shape algebra tests — the geometry facts every other module relies on.

Golden values from the reference's own trace (reference:
models/unet_model.py:148-223) and artifacts (324x324 m000.tif)."""

import pytest

from unetseg_tpu.models import shapes


def test_paper_572_to_388():
    sh = shapes.unet_shapes(572)
    assert sh.output_size == 388
    assert sh.margin == 184
    assert sh.encoder == (568, 280, 136, 64, 28)
    assert sh.decoder == (52, 100, 196, 388)
    assert sh.crops == (56, 104, 200, 392)


def test_512_to_324_with_floor_pooling():
    sh = shapes.unet_shapes(512)
    assert sh.output_size == 324
    assert sh.margin == 188  # scripts/predict1.py:45-46
    # 121 -> 60 floor at level 3 is the critical step
    assert sh.encoder == (508, 250, 121, 56, 24)
    assert sh.decoder == (44, 84, 164, 324)


def test_min_valid_input():
    m = shapes.min_valid_input()
    assert m == 188
    assert shapes.output_size(188) == 4
    assert not shapes.is_valid_input(187)


def test_input_for_output():
    t = shapes.input_for_output(324)
    assert shapes.output_size(t) >= 324
    assert t <= 512


def test_invalid_sizes_raise():
    with pytest.raises(ValueError):
        shapes.unet_shapes(100)


def test_center_crop_bounds():
    # reference crop: start = max(0, (s - t) // 2)
    assert shapes.center_crop_bounds(56, 48) == (4, 52)
    assert shapes.center_crop_bounds(121, 88) == (16, 104)
    assert shapes.center_crop_bounds(10, 10) == (0, 10)


@pytest.mark.parametrize("size", [188, 204, 220, 252, 316, 444, 512, 572, 700, 1024])
def test_margin_consistency(size):
    if shapes.is_valid_input(size):
        sh = shapes.unet_shapes(size)
        assert sh.margin == size - sh.output_size
        assert sh.margin in (184, 188)  # floor loss at pooling varies slightly
