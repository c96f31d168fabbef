"""Golden parity of the FULL stage-1 loss assembly (contrast_losses) against
a torch transcription of contrast_train.py:130-395, random-sampling paths
pinned to the same selections. Covers ordering subtleties the per-op tests
can't: bg completion before/after ER, max_norm+label masking, detach
boundaries, prototype resize chain."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from wseg_tpu.train.contrast import contrast_losses


def _to_t(x_nhwc):
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))


def torch_max_norm(p, e=1e-5):
    n, c, h, w = p.size()
    p = F.relu(p)
    mx = torch.max(p.view(n, c, -1), dim=-1)[0].view(n, c, 1, 1)
    mn = torch.min(p.view(n, c, -1), dim=-1)[0].view(n, c, 1, 1)
    return F.relu(p - mn - e) / (mx - mn + e)


def torch_adaptive_min_pool(x):
    n, c, h, w = x.size()
    k = h * w // 4
    m = torch.max(x, dim=1)[0]
    y = torch.topk(m.view(n, -1), k=k, dim=-1, largest=False)[0]
    return torch.sum(F.relu(y)) / (k * n)


def torch_max_onehot(x):
    x = x.clone()
    mx = torch.max(x[:, 1:], dim=1, keepdim=True)[0]
    x[:, 1:][x[:, 1:] != mx] = 0
    return x


def torch_losses(out1, out2, label21, u1, u2, bg_threshold=0.2, low=32,
                 pin_bg_protos=None, pin_protos=None):
    """Transcription of contrast_train.py:130-395 with view sizes (2*low,
    low) and the random 50% pixel sampling driven by the uniform keys u1/u2
    (smallest n//2 ranks = sample w/o replacement).

    pin_bg_protos: optional (bg1, bg2) vectors to substitute for the
    background prototypes — the bg CAM channel is a constant, so its top-k is
    an ARBITRARY tie-break in both frameworks; pinning removes the one
    non-deterministic ingredient from the comparison.

    Accepts either numpy NHWC outputs (value-parity use) or LIVE torch NCHW
    tensors straight from the reference model — the latter keeps the autograd
    chain intact so `total.backward()` yields reference gradients
    (tests/test_gradient_parity.py)."""
    if torch.is_tensor(out1[0]):
        cam1, cam_rv1, f_proj1, cam_rv1_down = out1
        cam2, cam_rv2, f_proj2, cam_rv2_down = out2
    else:
        cam1, cam_rv1, f_proj1, cam_rv1_down = [_to_t(o) for o in out1]
        cam2, cam_rv2, f_proj2, cam_rv2_down = [_to_t(o) for o in out2]
    label = torch.from_numpy(np.asarray(label21)).view(-1, 21, 1, 1)
    n = cam1.shape[0]

    label1 = F.adaptive_avg_pool2d(cam1, (1, 1))
    loss_rvmin1 = torch_adaptive_min_pool((cam_rv1 * label)[:, 1:])
    cam1n = F.interpolate(torch_max_norm(cam1), (low, low), mode="bilinear",
                          align_corners=True) * label
    cam_rv1n = F.interpolate(torch_max_norm(cam_rv1), (low, low), mode="bilinear",
                             align_corners=True) * label
    label2 = F.adaptive_avg_pool2d(cam2, (1, 1))
    loss_rvmin2 = torch_adaptive_min_pool((cam_rv2 * label)[:, 1:])
    cam2n = torch_max_norm(cam2) * label
    cam_rv2n = torch_max_norm(cam_rv2) * label
    loss_cls1 = F.multilabel_soft_margin_loss(label1[:, 1:, :, :], label[:, 1:, :, :])
    loss_cls2 = F.multilabel_soft_margin_loss(label2[:, 1:, :, :], label[:, 1:, :, :])

    ns, cs, hs, ws = cam2n.size()
    loss_er = torch.mean(torch.abs(cam1n[:, 1:] - cam2n[:, 1:]))
    cam1n[:, 0] = 1 - torch.max(cam1n[:, 1:], dim=1)[0]
    cam2n[:, 0] = 1 - torch.max(cam2n[:, 1:], dim=1)[0]
    t1 = torch.abs(torch_max_onehot(cam2n.detach()) - cam_rv1n)
    t2 = torch.abs(torch_max_onehot(cam1n.detach()) - cam_rv2n)
    k = int(21 * hs * ws * 0.2)
    loss_ecr = (torch.mean(torch.topk(t1.reshape(ns, -1), k=k, dim=-1)[0])
                + torch.mean(torch.topk(t2.reshape(ns, -1), k=k, dim=-1)[0]))
    loss_cls = (loss_cls1 + loss_cls2) / 2 + (loss_rvmin1 + loss_rvmin2) / 2

    # contrast block
    ds = low // 8
    f_proj1 = F.interpolate(f_proj1, (ds, ds), mode="bilinear", align_corners=True)
    cam_rv1_down = F.interpolate(cam_rv1_down, (ds, ds), mode="bilinear",
                                 align_corners=True)

    def proto(fea_t, cam_rv_t):
        fea = fea_t.detach()
        c_fea = fea.shape[1]
        cam_rv = F.relu(cam_rv_t.detach())
        nn_, c1, h1, w1 = cam_rv.shape
        mx = torch.max(cam_rv.view(nn_, c1, -1), dim=-1)[0].view(nn_, c1, 1, 1)
        mn = torch.min(cam_rv.view(nn_, c1, -1), dim=-1)[0].view(nn_, c1, 1, 1)
        cam_rv[cam_rv < mn + 1e-5] = 0
        norm = (cam_rv - mn - 1e-5) / (mx - mn + 1e-5)
        norm[:, 0] = bg_threshold
        scores = F.softmax(norm * label, dim=1)
        pseudo = scores.argmax(dim=1, keepdim=True).reshape(-1)
        feaf = fea.permute(0, 2, 3, 1).reshape(-1, c_fea)
        tv, ti = torch.topk(norm.transpose(0, 1).reshape(c1, -1), k=h1 * w1 // 8, dim=-1)
        protos = torch.zeros(c1, c_fea)
        for i in range(c1):
            tf = feaf[ti[i]]
            protos[i] = torch.sum(tv[i].unsqueeze(-1) * tf, dim=0) / torch.sum(tv[i])
        return F.normalize(protos, dim=-1), pseudo

    protos1, pl1 = proto(f_proj1, cam_rv1_down)
    protos2, pl2 = proto(f_proj2, cam_rv2_down)
    if pin_protos is not None:
        # prototypes are detached CONSTANTS in both frameworks' graphs; their
        # top-k pixel selection tie-breaks on floats that differ by ~1e-5
        # across frameworks (a flip shifts a prototype by O(1/k)). Pinning
        # the full matrices to the jax side's values makes gradient
        # comparison well-posed without touching any differentiated path
        # (tests/test_gradient_parity.py).
        protos1 = torch.from_numpy(np.ascontiguousarray(pin_protos[0]))
        protos2 = torch.from_numpy(np.ascontiguousarray(pin_protos[1]))
    elif pin_bg_protos is not None:
        protos1 = protos1.clone()
        protos2 = protos2.clone()
        protos1[0] = torch.from_numpy(np.asarray(pin_bg_protos[0]))
        protos2[0] = torch.from_numpy(np.asarray(pin_bg_protos[1]))

    def flat_norm(f):
        c_f = f.shape[1]
        f = f.permute(0, 2, 3, 1).reshape(-1, c_f)
        return F.normalize(f, dim=-1)

    f1 = flat_norm(f_proj1)
    f2 = flat_norm(f_proj2)

    def nce(f, pos, negs):
        a1 = torch.exp(torch.sum(f * pos, dim=-1) / 0.1)
        a2 = torch.sum(torch.exp(torch.matmul(f, negs.t()) / 0.1), dim=-1)
        return torch.mean(-torch.log(a1 / a2))

    loss_cross_nce = 0.1 * (nce(f1, protos2[pl1], protos2) + nce(f2, protos1[pl2], protos1)) / 2
    loss_cross_nce2 = 0.1 * (nce(f1, protos1[pl2], protos1) + nce(f2, protos2[pl1], protos2)) / 2

    def intra(f, protos, pl, u):
        pos = protos[pl]
        sim = (torch.sum(f * pos, dim=-1) + 1) / 2
        a1 = torch.exp(torch.sum(f * pos, dim=-1) / 0.1)
        neg_scores = torch.matmul(f, protos.t())
        _, li = torch.topk(neg_scores, k=13, largest=True, dim=-1)
        li = li[:, 3:]
        negs = torch.cat([pos.unsqueeze(1), protos[li]], dim=1)
        a2 = torch.sum(torch.exp(
            torch.matmul(f.unsqueeze(1), negs.transpose(1, 2)).squeeze(1) / 0.1), dim=-1)
        loss = torch.zeros(())
        cnt = 0
        for i_ in range(21):
            mask = (pl == i_).numpy()
            if mask.sum() == 0:
                continue
            cnt += 1
            idx = np.where(mask)[0]
            nc = len(idx)
            if nc < 2:
                continue
            rand_sel = idx[np.argsort(np.asarray(u)[idx])[: nc // 2]]
            sim_c = sim[idx]
            _, low_i = torch.topk(sim_c, k=int(nc * 0.6), largest=False)
            low_i = low_i[int(nc * 0.6) - nc // 2 :]
            a1c = torch.cat([a1[rand_sel], a1[idx][low_i]])
            a2c = torch.cat([a2[rand_sel], a2[idx][low_i]])
            loss = loss + torch.mean(-torch.log(a1c / a2c))
        return loss / cnt

    loss_intra = 0.1 * (intra(f1, protos1, pl1, u1) + intra(f2, protos2, pl2, u2)) / 2
    loss_nce = loss_cross_nce + loss_cross_nce2 + loss_intra
    total = loss_cls + loss_er + loss_ecr + loss_nce
    return {
        "loss": total, "loss_cls": loss_cls, "loss_er": loss_er,
        "loss_ecr": loss_ecr, "loss_nce": loss_nce,
        "loss_cross_nce": loss_cross_nce, "loss_cross_nce2": loss_cross_nce2,
        "loss_intra_nce": loss_intra,
    }


def test_full_loss_assembly_matches_reference_math():
    rng = np.random.RandomState(0)
    n, low = 2, 32
    hi = 2 * low  # view-1 resolution
    ds8 = hi // 8, low // 8

    def mk(shape):
        return rng.randn(*shape).astype(np.float32)

    out1 = (mk((n, hi, hi, 21)), mk((n, hi, hi, 21)),
            np.abs(mk((n, hi // 8, hi // 8, 16))), mk((n, hi // 8, hi // 8, 21)))
    out2 = (mk((n, low, low, 21)), mk((n, low, low, 21)),
            np.abs(mk((n, low // 8, low // 8, 16))), mk((n, low // 8, low // 8, 21)))
    label21 = np.zeros((n, 21), np.float32)
    label21[:, 0] = 1
    label21[0, 3] = 1
    label21[1, 7] = 1
    label21[1, 12] = 1

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    got = contrast_losses(
        tuple(jnp.asarray(o) for o in out1),
        tuple(jnp.asarray(o) for o in out2),
        jnp.asarray(label21), (k1, k2), bg_threshold=0.2, low_res=low,
    )

    m = n * (low // 8) ** 2
    u1 = np.asarray(jax.random.uniform(k1, (m,)))
    u2 = np.asarray(jax.random.uniform(k2, (m,)))

    # recover OUR bg prototypes to pin the torch oracle's arbitrary bg tie-break
    from wseg_tpu.ops.losses import estimate_prototypes, normalize_cam_for_prototypes
    from wseg_tpu.ops.resize import resize_bilinear

    ds = low // 8
    f1r = resize_bilinear(jnp.asarray(out1[2]), (ds, ds), align_corners=True)
    c1r = resize_bilinear(jnp.asarray(out1[3]), (ds, ds), align_corners=True)
    p1, _ = estimate_prototypes(
        f1r, normalize_cam_for_prototypes(c1r, 0.2), jnp.asarray(label21)
    )
    p2, _ = estimate_prototypes(
        jnp.asarray(out2[2]),
        normalize_cam_for_prototypes(jnp.asarray(out2[3]), 0.2),
        jnp.asarray(label21),
    )
    want = torch_losses(out1, out2, label21, u1, u2, low=low,
                        pin_bg_protos=(np.asarray(p1[0]), np.asarray(p2[0])))

    for key in ["loss_cls", "loss_er", "loss_ecr", "loss_cross_nce",
                "loss_cross_nce2", "loss_intra_nce", "loss_nce", "loss"]:
        np.testing.assert_allclose(
            float(got[key]), float(want[key]), rtol=2e-3,
            err_msg=key,
        )
