"""Parity of ops.resize with torch F.interpolate / F.avg_pool2d semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from wseg_tpu.ops.resize import avg_pool2d, resize_bilinear


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((14, 14), (128, 128)), ((56, 56), (16, 16)), ((17, 23), (50, 31)), ((8, 8), (8, 8))],
)
def test_bilinear_matches_torch(align_corners, in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 5).astype(np.float32)
    got = np.asarray(resize_bilinear(x, out_hw, align_corners=align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        F.interpolate(xt, out_hw, mode="bilinear", align_corners=align_corners)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bilinear_rank3():
    rng = np.random.RandomState(1)
    x = rng.randn(10, 12, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(x, (20, 24), align_corners=False))
    assert got.shape == (20, 24, 3)


def test_avg_pool2d_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 32, 40, 21).astype(np.float32)
    got = np.asarray(avg_pool2d(x, 8))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.avg_pool2d(xt, 8, 8).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bicubic_matches_pil():
    import PIL.Image

    from wseg_tpu.ops.resize import resize_bicubic

    rng = np.random.RandomState(3)
    img = (rng.rand(120, 90, 3) * 255).astype(np.uint8)
    pil = PIL.Image.fromarray(img)
    for th, tw in [(60, 45), (240, 180), (97, 61)]:
        want = np.asarray(pil.resize((tw, th), PIL.Image.BICUBIC), np.float32)
        got = np.asarray(resize_bicubic(img.astype(np.float32), (th, tw)))
        assert np.abs(got - want).max() <= 2.0
        assert np.abs(got - want).mean() < 0.05


def test_resize_chain_equals_two_step():
    """Composed stride-8 -> mid (ac=True) -> out (ac=False) == sequential
    two-step application (same linear map, reassociated)."""
    import jax.numpy as jnp

    from wseg_tpu.ops.resize import resize_bilinear, resize_bilinear_chain

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 12, 16, 5).astype(np.float32))
    for mid, out in [((96, 128), (48, 64)), ((24, 32), (75, 93)), ((12, 16), (30, 40))]:
        want = resize_bilinear(
            resize_bilinear(x, mid, align_corners=True), out, align_corners=False
        )
        got = resize_bilinear_chain(x, mid, out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
