"""Golden parity of the stage-1 losses against torch implementations of the
reference formulas (contrast_train.py:16-32,159-172,182-281)."""

import jax
import numpy as np
import torch
import torch.nn.functional as F

from wseg_tpu.ops.losses import (
    adaptive_min_pooling_loss,
    ecr_loss,
    estimate_prototypes,
    info_nce,
    intra_view_nce,
    multilabel_soft_margin_loss,
    normalize_cam_for_prototypes,
    topk_mean,
)
from wseg_tpu.ops.cam import max_onehot


def test_multilabel_soft_margin():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 20).astype(np.float32)
    y = (rng.rand(4, 20) > 0.7).astype(np.float32)
    got = float(multilabel_soft_margin_loss(x, y))
    want = float(F.multilabel_soft_margin_loss(torch.from_numpy(x), torch.from_numpy(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_adaptive_min_pooling():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 16, 20).astype(np.float32)
    got = float(adaptive_min_pooling_loss(x))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    n, c, h, w = xt.size()
    k = h * w // 4
    m = torch.max(xt, dim=1)[0]
    y = torch.topk(m.view(n, -1), k=k, dim=-1, largest=False)[0]
    want = float(torch.sum(F.relu(y)) / (k * n))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ecr_topk():
    rng = np.random.RandomState(2)
    a = rng.rand(2, 8, 8, 21).astype(np.float32)
    b = rng.rand(2, 8, 8, 21).astype(np.float32)
    a_oh = np.asarray(max_onehot(a))
    got = float(ecr_loss(a_oh, b))
    at = torch.from_numpy(np.transpose(a_oh, (0, 3, 1, 2)))
    bt = torch.from_numpy(np.transpose(b, (0, 3, 1, 2)))
    ns = 2
    diff = torch.abs(at - bt)
    k = int(21 * 8 * 8 * 0.2)
    want = float(torch.mean(torch.topk(diff.reshape(ns, -1), k=k, dim=-1)[0]))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _torch_normalize_cam(cam_nchw, bg_threshold, e=1e-5):
    cam = F.relu(cam_nchw)
    n, c, h, w = cam.shape
    mx = torch.max(cam.view(n, c, -1), dim=-1)[0].view(n, c, 1, 1)
    mn = torch.min(cam.view(n, c, -1), dim=-1)[0].view(n, c, 1, 1)
    cam[cam < mn + e] = 0.0
    norm = (cam - mn - e) / (mx - mn + e)
    norm[:, 0, :, :] = bg_threshold
    return norm


def test_normalize_cam_for_prototypes():
    rng = np.random.RandomState(3)
    cam = rng.randn(2, 4, 4, 21).astype(np.float32)
    got = np.asarray(normalize_cam_for_prototypes(cam, 0.2))
    want = (
        _torch_normalize_cam(torch.from_numpy(np.transpose(cam, (0, 3, 1, 2))), 0.2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_estimate_prototypes():
    """Prototype pooling parity (contrast_train.py:195-209)."""
    rng = np.random.RandomState(4)
    n, h, w, cf = 2, 4, 4, 16
    fea = rng.randn(n, h, w, cf).astype(np.float32)
    cam = rng.randn(n, h, w, 21).astype(np.float32)
    label = np.zeros((n, 21), np.float32)
    label[:, 0] = 1
    label[0, 3] = 1
    label[1, 7] = 1
    norm_cam = np.asarray(normalize_cam_for_prototypes(cam, 0.2))
    protos, pl = estimate_prototypes(fea, norm_cam, label)

    # torch reference
    normt = torch.from_numpy(np.transpose(norm_cam, (0, 3, 1, 2)))
    labelt = torch.from_numpy(label).view(n, 21, 1, 1)
    scores = F.softmax(normt * labelt, dim=1)
    pseudo = scores.argmax(dim=1, keepdim=True).reshape(-1).numpy()
    feat = torch.from_numpy(fea).reshape(-1, cf)
    top_values, top_indices = torch.topk(
        normt.transpose(0, 1).reshape(21, -1), k=h * w // 8, dim=-1
    )
    want = torch.zeros(21, cf)
    for i in range(21):
        top_fea = feat[top_indices[i]]
        want[i] = torch.sum(top_values[i].unsqueeze(-1) * top_fea, dim=0) / torch.sum(
            top_values[i]
        )
    want = F.normalize(want, dim=-1).numpy()

    # NOTE: the reference flattens cam as (C, N*H*W) via transpose(0,1) of the
    # NCHW tensor; our NHWC flatten produces the same pixel order
    np.testing.assert_array_equal(np.asarray(pl), pseudo)
    # class 0 (bg) is constant bg_threshold after normalization, so its top-k
    # is an arbitrary tie-break in BOTH frameworks — compare fg classes only
    np.testing.assert_allclose(np.asarray(protos)[1:], want[1:], rtol=1e-4, atol=1e-5)


def test_info_nce():
    rng = np.random.RandomState(5)
    m, cf, c = 32, 16, 21
    f = rng.randn(m, cf).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    protos = rng.randn(c, cf).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    pl = rng.randint(0, c, size=(m,))
    got = float(info_nce(f, protos[pl], protos))
    ft = torch.from_numpy(f)
    pt = torch.from_numpy(protos)
    a1 = torch.exp(torch.sum(ft * pt[pl], dim=-1) / 0.1)
    a2 = torch.sum(torch.exp(torch.matmul(ft, pt.t()) / 0.1), dim=-1)
    want = float(torch.mean(-torch.log(a1 / a2)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_intra_view_nce_against_reference_loop():
    """Full parity of the masked-rank formulation with a torch transcription
    of contrast_train.py:283-334, with the random half-sample fixed to the
    same selection in both (we feed the uniform keys into the torch loop)."""
    rng = np.random.RandomState(6)
    m, cf, c = 64, 8, 21
    f = rng.randn(m, cf).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    protos = rng.randn(c, cf).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    pl = rng.randint(0, 5, size=(m,))  # only classes 0..4 present

    key = jax.random.PRNGKey(0)
    got = float(intra_view_nce(f, protos, pl, key))

    # reproduce the uniform keys our implementation uses for the random half
    u = np.asarray(jax.random.uniform(key, (m,)))

    ft = torch.from_numpy(f)
    pt = torch.from_numpy(protos)
    plt = torch.from_numpy(pl)
    pos = pt[plt]
    sim = (torch.sum(ft * pos, dim=-1) + 1) / 2.0
    a1 = torch.exp(torch.sum(ft * pos, dim=-1) / 0.1)
    neg_scores = torch.matmul(ft, pt.t())
    _, lower_idx = torch.topk(neg_scores, k=13, largest=True, dim=-1)
    lower_idx = lower_idx[:, 3:]
    negs = torch.cat([pos.unsqueeze(1), pt[lower_idx]], dim=1)
    a2 = torch.sum(
        torch.exp(torch.matmul(ft.unsqueeze(1), negs.transpose(1, 2)).squeeze(1) / 0.1),
        dim=-1,
    )
    loss = torch.zeros(1)
    cnt = 0
    for i_ in range(c):
        mask = (plt == i_).numpy()
        if mask.sum() == 0:
            continue
        cnt += 1
        idx = np.where(mask)[0]
        n_c = len(idx)
        if n_c < 2:
            continue
        a1_c = a1[idx]
        a2_c = a2[idx]
        sim_c = sim[idx]
        # random half via the same uniform keys (smallest n_c//2)
        rand_sel = np.argsort(u[idx])[: n_c // 2]
        _, low = torch.topk(sim_c, k=int(n_c * 0.6), largest=False)
        low = low[int(n_c * 0.6) - n_c // 2 :]
        a1_cat = torch.cat([a1_c[rand_sel], a1_c[low]])
        a2_cat = torch.cat([a2_c[rand_sel], a2_c[low]])
        loss += torch.mean(-torch.log(a1_cat / a2_cat))
    want = float(loss / cnt)
    np.testing.assert_allclose(got, want, rtol=1e-4)
