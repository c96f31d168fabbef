"""Parity of PCM and the affinity pair machinery with the reference math
(network/resnet38_contrast.py:63-75, tool/pyutils.py:125-159,
network/resnet38_aff.py:53-78, aff_infer.py:105-117)."""

import numpy as np
import torch
import torch.nn.functional as F

from wseg_tpu.ops.pairs import dense_affinity_matrix, pairwise_affinity, radius_pair_indices
from wseg_tpu.ops.pcm import pcm
from wseg_tpu.ops.random_walk import random_walk_refine


def torch_pcm(cam_nchw, f_nchw):
    n, c, h, w = f_nchw.size()
    cam = F.interpolate(cam_nchw, (h, w), mode="bilinear", align_corners=True).view(
        n, -1, h * w
    )
    f = f_nchw.view(n, -1, h * w)
    f = f / (torch.norm(f, dim=1, keepdim=True) + 1e-5)
    aff = F.relu(torch.matmul(f.transpose(1, 2), f))
    aff = aff / (torch.sum(aff, dim=1, keepdim=True) + 1e-5)
    return torch.matmul(cam, aff).view(n, -1, h, w)


def test_pcm_matches_torch():
    rng = np.random.RandomState(0)
    cam = rng.rand(2, 8, 8, 21).astype(np.float32)
    f = rng.randn(2, 8, 8, 24).astype(np.float32)
    got = np.asarray(pcm(cam, f))
    want = (
        torch_pcm(
            torch.from_numpy(np.transpose(cam, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(f, (0, 3, 1, 2))),
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def torch_pair_indices(radius, size):
    """Transcription of tool/pyutils.py:125-159 for parity checking."""
    search_dist = []
    for x in range(1, radius):
        search_dist.append((0, x))
    for y in range(1, radius):
        for x in range(-radius + 1, radius):
            if x * x + y * y < radius * radius:
                search_dist.append((y, x))
    radius_floor = radius - 1
    full = np.arange(size[0] * size[1], dtype=np.int64).reshape(size)
    ch = size[0] - radius_floor
    cw = size[1] - 2 * radius_floor
    ind_from = full[:-radius_floor, radius_floor:-radius_floor].reshape(-1)
    tos = [
        full[dy : dy + ch, radius_floor + dx : radius_floor + dx + cw].reshape(-1)
        for dy, dx in search_dist
    ]
    return ind_from, np.concatenate(tos)


def test_pair_indices():
    for radius, size in [(5, (56, 56)), (3, (10, 14))]:
        gf, gt = radius_pair_indices(radius, size)
        wf, wt = torch_pair_indices(radius, size)
        np.testing.assert_array_equal(gf, wf)
        np.testing.assert_array_equal(gt, wt)


def test_pairwise_affinity_and_dense():
    rng = np.random.RandomState(1)
    h = w = 12
    cdim = 6
    f = rng.randn(1, h * w, cdim).astype(np.float32)
    ind_from, ind_to = radius_pair_indices(5, (h, w))
    aff = np.asarray(pairwise_affinity(f, ind_from, ind_to))  # (1, D, P)

    # torch reference (network/resnet38_aff.py:53-63)
    ft_all = torch.from_numpy(np.transpose(f, (0, 2, 1)))  # (1, C, HW)
    ff = torch.index_select(ft_all, 2, torch.from_numpy(ind_from))
    ft = torch.index_select(ft_all, 2, torch.from_numpy(ind_to))
    ff = ff.unsqueeze(2)
    ft = ft.view(1, cdim, -1, ff.size(3))
    want = torch.exp(-torch.mean(torch.abs(ft - ff), dim=1)).numpy()
    np.testing.assert_allclose(aff, want, rtol=1e-5, atol=1e-6)

    # dense matrix (network/resnet38_aff.py:65-78)
    got_mat = np.asarray(dense_affinity_matrix(aff[0], ind_from, ind_to, h * w))
    area = h * w
    want_mat = np.zeros((area, area), np.float32)
    d, p = want_mat.shape[0], 0
    affv = want.reshape(-1)
    ind_from_exp = np.tile(ind_from, want.shape[1])
    np.add.at(want_mat, (ind_from_exp, ind_to), affv)
    np.add.at(want_mat, (ind_to, ind_from_exp), affv)
    want_mat[np.arange(area), np.arange(area)] += 1.0
    np.testing.assert_allclose(got_mat, want_mat, rtol=1e-5, atol=1e-6)

    # scatter-free banded construction: exactly the scatter result (the
    # addition is a disjoint placement, so the orders cannot differ)
    from wseg_tpu.ops.pairs import dense_affinity_matrix_banded

    got_banded = np.asarray(dense_affinity_matrix_banded(aff[0], 5, (h, w)))
    np.testing.assert_array_equal(got_banded, got_mat)

    # non-square grid + clamped radius (the small-feature-map path)
    h2, w2 = 10, 14
    f2 = rng.randn(1, h2 * w2, cdim).astype(np.float32)
    if2, it2 = radius_pair_indices(3, (h2, w2))
    aff2 = np.asarray(pairwise_affinity(f2, if2, it2))
    np.testing.assert_array_equal(
        np.asarray(dense_affinity_matrix_banded(aff2[0], 3, (h2, w2))),
        np.asarray(dense_affinity_matrix(aff2[0], if2, it2, h2 * w2)),
    )


def test_pairwise_affinity_sliced_matches_gather():
    """The slice-based formulation (no (N, D, P, C) gather temp) is exactly
    the gather formulation — same pairs, same op order."""
    from wseg_tpu.ops.pairs import pairwise_affinity_sliced

    rng = np.random.RandomState(3)
    for radius, (h, w) in [(5, (12, 16)), (3, (10, 14)), (5, (11, 11))]:
        f = rng.randn(2, h, w, 6).astype(np.float32)
        ind_from, ind_to = radius_pair_indices(radius, (h, w))
        want = np.asarray(pairwise_affinity(f.reshape(2, h * w, 6), ind_from, ind_to))
        got = np.asarray(pairwise_affinity_sliced(f, radius))
        np.testing.assert_array_equal(got, want)


def test_random_walk_refine():
    """Parity with aff_infer.py:105-119 on a tiny problem."""
    rng = np.random.RandomState(2)
    h = w = 16
    dh, dw = h // 8, w // 8
    cam = rng.rand(h, w, 21).astype(np.float32)
    aff = (rng.rand(dh * dw, dh * dw) + 0.1).astype(np.float32)
    aff = (aff + aff.T) / 2

    got = np.asarray(random_walk_refine(cam, aff, beta=8, logt=6))

    afft = torch.from_numpy(aff) ** 8
    trans = afft / torch.sum(afft, dim=0, keepdim=True)
    for _ in range(6):
        trans = torch.matmul(trans, trans)
    cam_t = torch.from_numpy(np.transpose(cam, (2, 0, 1)))
    cam_p = F.avg_pool2d(cam_t, 8, 8)
    cam_vec = cam_p.view(21, -1)
    cam_rw = torch.matmul(cam_vec, trans).view(1, 21, dh, dw)
    cam_rw = torch.nn.Upsample((h, w), mode="bilinear")(cam_rw)
    want = cam_rw[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sliced_small_radius_raises_like_gather():
    # ADVICE r3: the sliced path must reject radius<2 with the same
    # explanatory error as radius_pair_indices, not an opaque stack failure
    import jax.numpy as jnp
    import pytest

    from wseg_tpu.ops.pairs import pairwise_affinity_sliced, radius_pair_indices

    f = jnp.zeros((1, 4, 4, 8), jnp.float32)
    with pytest.raises(ValueError, match="empty pair set"):
        pairwise_affinity_sliced(f, 1)
    with pytest.raises(ValueError, match="empty pair set"):
        radius_pair_indices(1, (4, 4))


def test_refiner_gather_pair_impl_lowers_pixel_budget():
    # ADVICE r3: a gather-built model re-materializes the 9.6 GB pair temp;
    # the refiner must drop to the measured-safe gather budget by default
    from wseg_tpu.infer.rw import (
        MAX_WALK_PX,
        MAX_WALK_PX_GATHER,
        RandomWalkRefiner,
    )
    from wseg_tpu.models import build_model

    sliced = RandomWalkRefiner(build_model("affinity"), {})
    gather = RandomWalkRefiner(build_model("affinity", pair_impl="gather"), {})
    override = RandomWalkRefiner(
        build_model("affinity", pair_impl="gather"), {}, max_walk_px=123
    )
    assert sliced.max_walk_px == MAX_WALK_PX
    assert gather.max_walk_px == MAX_WALK_PX_GATHER
    assert override.max_walk_px == 123
    # ADVICE r4: an EXPLICIT max_walk_px equal to the default sentinel value
    # must be honored as-is, not silently demoted to the gather budget
    explicit_default = RandomWalkRefiner(
        build_model("affinity", pair_impl="gather"), {}, max_walk_px=MAX_WALK_PX
    )
    assert explicit_default.max_walk_px == MAX_WALK_PX


def test_random_walk_bf16_chain_tracks_f32():
    # the bf16 matrix-power option (ops/random_walk.py compute_dtype) stays
    # within a bounded envelope of f32 — measured on this synthetic config:
    # dense random affinity rel 10.0% / flip 1.9%; band-limited (walk-like,
    # radius-3 pair structure) rel 3.1% / flip 3.4%. These flip rates are
    # why bf16 is NOT the default (ROOFLINE.md 5d records the chip-side
    # promote/demote measurement); this test pins the option's behavior.
    import jax.numpy as jnp

    from wseg_tpu.ops.pairs import radius_pair_indices

    rng = np.random.RandomState(7)
    h = w = 64
    dh = dw = h // 8
    cam = rng.rand(h, w, 21).astype(np.float32)

    indf, indt = radius_pair_indices(3, (dh, dw))
    vals = rng.rand(len(indt) // len(indf), len(indf)).astype(np.float32)
    aff = np.asarray(dense_affinity_matrix(vals, indf, indt, dh * dw))

    f32 = np.asarray(random_walk_refine(cam, aff, beta=8, logt=6))
    bf16 = np.asarray(
        random_walk_refine(cam, aff, beta=8, logt=6, compute_dtype=jnp.bfloat16)
    )
    rel = np.abs(bf16 - f32).max() / (np.abs(f32).max() + 1e-12)
    assert rel < 0.15, rel
    flip = (bf16.argmax(-1) != f32.argmax(-1)).mean()
    assert flip < 0.08, flip
    # and the chain is not degenerate (bf16 actually computed a walk)
    assert np.isfinite(bf16).all() and bf16.max() > 0
