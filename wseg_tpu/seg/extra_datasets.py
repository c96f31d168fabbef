"""Additional segmentation datasets: Cityscapes, ADE20K, COCO, PascalContext.

The reference carries these under `segmentation/lib/datasets/` but comments
them out of its registry (`datasets/__init__.py:2-5`), so its experiments can
only use VOC. Here they are registered and usable: each subclass supplies
the directory layout / name discovery / label mapping, and the shared
`GenericSegDataset` reuses the VOC weak-augment + multiscale pipeline
(`wseg_tpu/seg/dataset.py`).
"""

from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from wseg_tpu.seg.config import SegConfig
from wseg_tpu.seg.dataset import VOCSegDataset
from wseg_tpu.utils.registry import DATASETS


class GenericSegDataset(VOCSegDataset):
    """Shares the transform pipeline; subclasses set dirs/names/num classes.
    Pixel-label remapping (e.g. Cityscapes trainIds) hooks via
    `remap_segmentation`."""

    NUM_CLASSES = 21

    def __init__(self, cfg: SegConfig, period: str, transform: str = "none",
                 datalist: str = "", det_seed: int | None = None):
        # same deterministic-augmentation contract as VOCSegDataset
        self.det_seed = det_seed
        self._epoch = 0
        self.cfg = cfg
        self.period = period
        self.transform = transform
        self.rst_dir = os.path.join(cfg.ROOT_DIR, "results", type(self).__name__)
        self.pseudo_gt_dir = cfg.DATA_PSEUDO_GT
        self.num_categories = self.NUM_CLASSES
        self.mean = np.asarray(cfg.DATA_MEAN, np.float32)
        self.std = np.asarray(cfg.DATA_STD, np.float32)
        self._setup_dirs(cfg, period)
        if datalist:
            self.name_list = [
                l.strip() for l in open(datalist).read().splitlines() if l.strip()
            ]
        else:
            self.name_list = self._discover_names()

    # --- subclass hooks -----------------------------------------------------
    def _setup_dirs(self, cfg: SegConfig, period: str):
        raise NotImplementedError

    def _discover_names(self) -> list[str]:
        raise NotImplementedError

    def _img_path(self, name: str) -> str:
        return os.path.join(self.img_dir, name + self.IMG_EXT)

    def _seg_path(self, name: str) -> str:
        return os.path.join(self.seg_dir, name + self.SEG_EXT)

    def remap_segmentation(self, seg: np.ndarray) -> np.ndarray:
        return seg

    # --- pipeline overrides ---------------------------------------------------
    def load_image(self, name: str) -> np.ndarray:
        return np.array(Image.open(self._img_path(name)).convert("RGB"))

    def load_segmentation(self, name: str) -> np.ndarray:
        if self.pseudo_gt_dir and "train" in self.period:
            path = os.path.join(self.pseudo_gt_dir, name.replace("/", "_") + ".png")
        else:
            path = self._seg_path(name)
        return self.remap_segmentation(np.array(Image.open(path)))

    def save_result(self, result_list, model_id: str):
        folder = os.path.join(self.rst_dir, f"{model_id}_{self.period}")
        os.makedirs(folder, exist_ok=True)
        for sample in result_list:
            Image.fromarray(sample["predict"].astype(np.uint8)).save(
                os.path.join(folder, sample["name"].replace("/", "_") + ".png")
            )


@DATASETS.register("CityscapesDataset")
class CityscapesDataset(GenericSegDataset):
    """leftImg8bit/<split>/<city>/*_leftImg8bit.png + gtFine labelTrainIds
    (19 classes, 255 ignore)."""

    NUM_CLASSES = 19
    IMG_EXT = "_leftImg8bit.png"
    SEG_EXT = "_gtFine_labelTrainIds.png"

    def _setup_dirs(self, cfg, period):
        split = {"train": "train", "val": "val", "test": "test"}[period]
        self.img_dir = os.path.join(cfg.DATA_ROOT, "leftImg8bit", split)
        self.seg_dir = os.path.join(cfg.DATA_ROOT, "gtFine", split)

    def _discover_names(self):
        files = sorted(glob.glob(os.path.join(self.img_dir, "*", "*_leftImg8bit.png")))
        prefix = self.img_dir.rstrip("/") + "/"
        return [f[len(prefix):][: -len(self.IMG_EXT)] for f in files]


@DATASETS.register("ADE20KDataset")
class ADE20KDataset(GenericSegDataset):
    """ADEChallengeData2016: images/<split>/*.jpg, annotations/<split>/*.png
    (150 classes, label 0 = ignore -> shifted to 255)."""

    NUM_CLASSES = 150
    IMG_EXT = ".jpg"
    SEG_EXT = ".png"

    def _setup_dirs(self, cfg, period):
        split = {"train": "training", "val": "validation"}.get(period, period)
        self.img_dir = os.path.join(cfg.DATA_ROOT, "images", split)
        self.seg_dir = os.path.join(cfg.DATA_ROOT, "annotations", split)

    def _discover_names(self):
        files = sorted(glob.glob(os.path.join(self.img_dir, "*.jpg")))
        return [os.path.splitext(os.path.basename(f))[0] for f in files]

    def remap_segmentation(self, seg):
        seg = seg.astype(np.int32) - 1  # 0 = unlabeled -> -1
        seg[seg < 0] = 255
        return seg.astype(np.uint8)


@DATASETS.register("COCODataset")
class COCODataset(GenericSegDataset):
    """COCO-Stuff-style layout: images/<split>2017/*.jpg +
    annotations/<split>2017/*.png label maps (255 ignore)."""

    NUM_CLASSES = 171
    IMG_EXT = ".jpg"
    SEG_EXT = ".png"

    def _setup_dirs(self, cfg, period):
        split = {"train": "train2017", "val": "val2017"}.get(period, period)
        self.img_dir = os.path.join(cfg.DATA_ROOT, "images", split)
        self.seg_dir = os.path.join(cfg.DATA_ROOT, "annotations", split)

    def _discover_names(self):
        files = sorted(glob.glob(os.path.join(self.img_dir, "*.jpg")))
        return [os.path.splitext(os.path.basename(f))[0] for f in files]


@DATASETS.register("ContextDataset")
class ContextDataset(GenericSegDataset):
    """PASCAL-Context (60-way) with VOC-style JPEGImages + label pngs in
    SegmentationClassContext."""

    NUM_CLASSES = 60
    IMG_EXT = ".jpg"
    SEG_EXT = ".png"

    def _setup_dirs(self, cfg, period):
        self.img_dir = os.path.join(cfg.DATA_ROOT, "JPEGImages")
        self.seg_dir = os.path.join(cfg.DATA_ROOT, "SegmentationClassContext")
        self._set_file = os.path.join(
            cfg.DATA_ROOT, "ImageSets", "SegmentationContext", period + ".txt"
        )

    def _discover_names(self):
        return [
            l.strip() for l in open(self._set_file).read().splitlines() if l.strip()
        ]
