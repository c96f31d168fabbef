"""Simple (image, mask) segmentation dataset — rebuild of
`tool/torchutils.py:84-134` (`SegmentationDataset`), which the reference's
main pipeline never uses. Its `mask = img.resize(...)` typo (:114, rescaling
the IMAGE as the mask) is fixed here; masks resize with NEAREST and are
subsampled 8x to the backbone's stride like the original intends.
Emits HWC float32 + (H/8, W/8) int masks.
"""

from __future__ import annotations

import os
import random

import numpy as np
import PIL.Image

from wseg_tpu.data import transforms as T
from wseg_tpu.data.voc12 import load_img_name_list


class SegmentationDataset:
    def __init__(self, img_name_list_path: str, img_dir: str, label_dir: str,
                 rescale=None, cropsize: int | None = None, flip: bool = False):
        self.img_name_list = load_img_name_list(img_name_list_path)
        self.img_dir = img_dir
        self.label_dir = label_dir
        self.rescale = rescale
        self.cropsize = cropsize
        self.flip = flip
        self.normalize = T.Normalize()

    def __len__(self):
        return len(self.img_name_list)

    def __getitem__(self, idx: int):
        name = self.img_name_list[idx]
        img = PIL.Image.open(os.path.join(self.img_dir, name + ".jpg")).convert("RGB")
        mask = PIL.Image.open(os.path.join(self.label_dir, name + ".png"))

        if self.rescale is not None:
            s = self.rescale[0] + random.random() * (self.rescale[1] - self.rescale[0])
            adj = (round(img.size[0] * s / 8) * 8, round(img.size[1] * s / 8) * 8)
            img = img.resize(adj, resample=PIL.Image.BICUBIC)
            mask = mask.resize(adj, resample=PIL.Image.NEAREST)

        arr = self.normalize(img)
        mask_np = np.asarray(mask, np.float32)

        if self.cropsize is not None:
            crop = T.RandomCrop(self.cropsize)
            box = crop.get_box(*arr.shape[:2])
            arr = crop.apply(arr, box)
            ct, cl, it_, il, ch, cw = box
            m = np.full((self.cropsize, self.cropsize), 255.0, np.float32)
            m[ct : ct + ch, cl : cl + cw] = mask_np[it_ : it_ + ch, il : il + cw]
            mask_np = m

        mask_np = mask_np[::8, ::8]  # stride-8 nearest subsample

        if self.flip and bool(random.getrandbits(1)):
            arr = np.fliplr(arr).copy()
            mask_np = np.fliplr(mask_np).copy()

        return name, arr, mask_np.astype(np.int32)
