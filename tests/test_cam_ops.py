"""Golden parity of CAM ops against the reference's torch formulas
(tool/visualization.py:54-83, contrast_train.py:28-32,
network/resnet38_contrast.py:41-48, contrast_infer.py:75-80)."""

import numpy as np
import torch
import torch.nn.functional as F

from wseg_tpu.ops.cam import cam_bg_complete, fuse_msf_cams, max_norm, max_onehot


def torch_max_norm(p, e=1e-5):
    n, c, h, w = p.size()
    p = F.relu(p)
    max_v = torch.max(p.view(n, c, -1), dim=-1)[0].view(n, c, 1, 1)
    min_v = torch.min(p.view(n, c, -1), dim=-1)[0].view(n, c, 1, 1)
    return F.relu(p - min_v - e) / (max_v - min_v + e)


def torch_max_onehot(x):
    x = x.clone()
    x_max = torch.max(x[:, 1:, :, :], dim=1, keepdim=True)[0]
    x[:, 1:, :, :][x[:, 1:, :, :] != x_max] = 0
    return x


def torch_cam_bg_complete(cam, e=1e-5):
    cam_d = F.relu(cam)
    n, c, h, w = cam_d.size()
    cam_d_max = torch.max(cam_d.view(n, c, -1), dim=-1)[0].view(n, c, 1, 1) + e
    cam_d_norm = F.relu(cam_d - e) / cam_d_max
    cam_d_norm[:, 0, :, :] = 1 - torch.max(cam_d_norm[:, 1:, :, :], dim=1)[0]
    cam_max = torch.max(cam_d_norm[:, 1:, :, :], dim=1, keepdim=True)[0]
    cam_d_norm[:, 1:, :, :][cam_d_norm[:, 1:, :, :] < cam_max] = 0
    return cam_d_norm


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


def test_max_norm():
    x = np.random.RandomState(0).randn(2, 7, 9, 21).astype(np.float32)
    got = np.asarray(max_norm(x))
    want = _to_nhwc(torch_max_norm(_nchw(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_max_onehot():
    x = np.random.RandomState(1).rand(2, 5, 6, 21).astype(np.float32)
    got = np.asarray(max_onehot(x))
    want = _to_nhwc(torch_max_onehot(_nchw(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cam_bg_complete():
    x = np.random.RandomState(2).randn(3, 8, 8, 21).astype(np.float32)
    got = np.asarray(cam_bg_complete(x))
    want = _to_nhwc(torch_cam_bg_complete(_nchw(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fuse_msf_cams():
    # reference numpy math, contrast_infer.py:75-80
    sum_cam = np.random.RandomState(3).randn(20, 11, 13).astype(np.float32)
    got = np.asarray(fuse_msf_cams(sum_cam))
    ref = sum_cam.copy()
    ref[ref < 0] = 0
    cam_max = np.max(ref, (1, 2), keepdims=True)
    cam_min = np.min(ref, (1, 2), keepdims=True)
    ref[ref < cam_min + 1e-5] = 0
    want = (ref - cam_min - 1e-5) / (cam_max - cam_min + 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
