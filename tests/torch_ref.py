"""Compact torch oracle of the reference architectures for golden parity
tests. Written from the architecture description in SURVEY.md §2.1/§3.2 (NOT
copied from the reference): a config-table-driven dilated WideResNet-38 with
pre-activation blocks and frozen BN, plus the contrast head. Used only in
tests to validate the JAX models numerically on random weights.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn

# (name, kind, in, mid, out, stride, first_dilation, dilation, dropout)
RESNET38_BLOCKS = [
    ("b2", "basic", 64, 128, 128, 2, None, 1),
    ("b2_1", "basic", 128, 128, 128, 1, None, 1),
    ("b2_2", "basic", 128, 128, 128, 1, None, 1),
    ("b3", "basic", 128, 256, 256, 2, None, 1),
    ("b3_1", "basic", 256, 256, 256, 1, None, 1),
    ("b3_2", "basic", 256, 256, 256, 1, None, 1),
    ("b4", "basic", 256, 512, 512, 2, None, 1),
    ("b4_1", "basic", 512, 512, 512, 1, None, 1),
    ("b4_2", "basic", 512, 512, 512, 1, None, 1),
    ("b4_3", "basic", 512, 512, 512, 1, None, 1),
    ("b4_4", "basic", 512, 512, 512, 1, None, 1),
    ("b4_5", "basic", 512, 512, 512, 1, None, 1),
    ("b5", "basic", 512, 512, 1024, 1, 1, 2),
    ("b5_1", "basic", 1024, 512, 1024, 1, None, 2),
    ("b5_2", "basic", 1024, 512, 1024, 1, None, 2),
    ("b6", "bot", 1024, None, 2048, 1, None, 4),
    ("b7", "bot", 2048, None, 4096, 1, None, 4),
]
TAPS = {"b4": "conv3", "b5": "conv4", "b6": "conv5"}


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cmid, cout, stride, first_dil, dil):
        super().__init__()
        fd = dil if first_dil is None else first_dil
        self.pre_bn = nn.BatchNorm2d(cin)
        self.reshape = not (cin == cout and stride == 1)
        if self.reshape:
            self.proj = nn.Conv2d(cin, cout, 1, stride, bias=False)
        self.c1 = nn.Conv2d(cin, cmid, 3, stride, padding=fd, dilation=fd, bias=False)
        self.mid_bn = nn.BatchNorm2d(cmid)
        self.c2 = nn.Conv2d(cmid, cout, 3, padding=dil, dilation=dil, bias=False)

    def forward(self, x):
        pre = F.relu(self.pre_bn(x))
        shortcut = self.proj(pre) if self.reshape else x
        h = self.c2(F.relu(self.mid_bn(self.c1(pre))))
        return shortcut + h, pre


class TorchBotBlock(nn.Module):
    def __init__(self, cin, cout, dil):
        super().__init__()
        self.pre_bn = nn.BatchNorm2d(cin)
        self.proj = nn.Conv2d(cin, cout, 1, bias=False)
        self.c1 = nn.Conv2d(cin, cout // 4, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout // 4)
        self.c2 = nn.Conv2d(cout // 4, cout // 2, 3, padding=dil, dilation=dil, bias=False)
        self.bn2 = nn.BatchNorm2d(cout // 2)
        self.c3 = nn.Conv2d(cout // 2, cout, 1, bias=False)

    def forward(self, x):
        pre = F.relu(self.pre_bn(x))
        h = F.relu(self.bn1(self.c1(pre)))
        h = F.relu(self.bn2(self.c2(h)))
        return self.proj(pre) + self.c3(h), pre


class TorchResNet38(nn.Module):
    """Stride-8 dilated WideResNet-38 returning the conv3/4/5/6 taps.
    Dropout omitted (eval-mode parity only)."""

    def __init__(self):
        super().__init__()
        self.stem = nn.Conv2d(3, 64, 3, padding=1, bias=False)
        self.blocks = nn.ModuleDict()
        for name, kind, cin, cmid, cout, stride, fd, dil in RESNET38_BLOCKS:
            if kind == "basic":
                self.blocks[name] = TorchBasicBlock(cin, cmid, cout, stride, fd, dil)
            else:
                self.blocks[name] = TorchBotBlock(cin, cout, dil)
        self.top_bn = nn.BatchNorm2d(4096)

    def forward(self, x):
        taps = {}
        h = self.stem(x)
        for name, *_ in RESNET38_BLOCKS:
            h, pre = self.blocks[name](h)
            if name in TAPS:
                taps[TAPS[name]] = pre
        taps["conv6"] = F.relu(self.top_bn(h))
        return taps


class TorchContrastNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet38()
        self.cam_head = nn.Conv2d(4096, 21, 1, bias=False)
        self.proj_head = nn.Conv2d(4096, 128, 1, bias=False)
        self.low = nn.Conv2d(512, 64, 1, bias=False)
        self.high = nn.Conv2d(1024, 128, 1, bias=False)
        self.mix = nn.Conv2d(195, 192, 1, bias=False)

    def forward(self, x):
        n, _, hin, win = x.shape
        taps = self.backbone(x)
        fea = taps["conv6"]  # dropout is identity in eval
        f_proj = F.relu(self.proj_head(fea))
        cam = self.cam_head(fea)
        h, w = cam.shape[2:]

        with torch.no_grad():
            c = F.relu(cam)
            cmax = c.flatten(2).max(-1)[0][..., None, None] + 1e-5
            cnorm = F.relu(c - 1e-5) / cmax
            bg = 1 - cnorm[:, 1:].max(1, keepdim=True)[0]
            fg = cnorm[:, 1:]
            fg = torch.where(fg < fg.max(1, keepdim=True)[0], torch.zeros_like(fg), fg)
            cam_seed = torch.cat([bg, fg], 1)

        lo = F.relu(self.low(taps["conv4"].detach()))
        hi = F.relu(self.high(taps["conv5"].detach()))
        img_small = F.interpolate(x, (h, w), mode="bilinear", align_corners=True)
        feat = self.mix(torch.cat([img_small, lo, hi], 1))

        # PCM
        fv = feat.flatten(2)
        fv = fv / (fv.norm(dim=1, keepdim=True) + 1e-5)
        aff = F.relu(torch.bmm(fv.transpose(1, 2), fv))
        aff = aff / (aff.sum(1, keepdim=True) + 1e-5)
        cam_rv_down = torch.bmm(cam_seed.flatten(2), aff).reshape(n, 21, h, w)

        cam_rv = F.interpolate(cam_rv_down, (hin, win), mode="bilinear", align_corners=True)
        cam_up = F.interpolate(cam, (hin, win), mode="bilinear", align_corners=True)
        return cam_up, cam_rv, f_proj, cam_rv_down


def export_state_dict_reference_names(model: TorchContrastNet) -> dict:
    """Rename our oracle's params to the reference state_dict key space, so
    `convert_torch_state_dict` can ingest them."""
    out = {}
    sd = model.state_dict()
    block_layer = {
        "pre_bn": "bn_branch2a", "proj": "conv_branch1", "c1": "conv_branch2a",
        "mid_bn": "bn_branch2b1", "c2": "conv_branch2b1",
        "bn1": "bn_branch2b1", "bn2": "bn_branch2b2", "c3": "conv_branch2b2",
    }
    bot_c1 = "conv_branch2a"
    head = {"cam_head": "fc8", "proj_head": "fc_proj", "low": "f8_3",
            "high": "f8_4", "mix": "f9"}
    for k, v in sd.items():
        toks = k.split(".")
        if toks[0] == "stem":
            out[f"conv1a.{toks[-1]}"] = v
        elif toks[0] == "backbone" and toks[1] == "stem":
            out[f"conv1a.{toks[-1]}"] = v
        elif "blocks" in toks:
            bidx = toks.index("blocks")
            bname = toks[bidx + 1]
            layer = toks[bidx + 2]
            is_bot = bname in ("b6", "b7")
            lname = bot_c1 if (is_bot and layer == "c1") else block_layer[layer]
            if is_bot and layer == "c2":
                lname = "conv_branch2b1"
            out[f"{bname}.{lname}.{toks[-1]}"] = v
        elif toks[0] == "top_bn" or (toks[0] == "backbone" and toks[1] == "top_bn"):
            out[f"bn7.{toks[-1]}"] = v
        elif toks[0] in head:
            out[f"{head[toks[0]]}.{toks[-1]}"] = v
        else:
            raise KeyError(k)
    return out
