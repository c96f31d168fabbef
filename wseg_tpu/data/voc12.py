"""PASCAL VOC 2012 data layer (host-side).

Rebuild of `voc12/data.py`: name-list parsing, image-level multi-hot labels,
the classification / MSF / affinity datasets. Differences from the reference
are deliberate TPU-first choices:

* labels are parsed from the VOC XML annotations on first use and cached to
  an .npy next to the list file (the reference ships a pregenerated
  `voc12/cls_labels.npy`, loader voc12/data.py:40-44); an existing
  cls_labels.npy of the reference's dict format is also accepted.
* datasets yield HWC float32 numpy (NHWC device layout), not CHW tensors.
* iteration/batching happens in `wseg_tpu.data.loader` (thread prefetch)
  instead of torch DataLoader worker processes.
"""

from __future__ import annotations

import os

import numpy as np
import PIL.Image

from wseg_tpu.data import transforms as T

IMG_FOLDER_NAME = "JPEGImages"
ANNOT_FOLDER_NAME = "Annotations"

CAT_LIST = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]
CAT_NAME_TO_NUM = {c: i for i, c in enumerate(CAT_LIST)}
CATEGORIES_WITH_BG = ["background"] + CAT_LIST


def get_img_path(img_name: str, voc12_root: str) -> str:
    return os.path.join(voc12_root, IMG_FOLDER_NAME, img_name + ".jpg")


def load_img_name_list(dataset_path: str) -> list[str]:
    """Parse a list file. Accepts both the reference's
    '/JPEGImages/<id>.jpg /SegmentationClassAug/<id>.png' format (image id =
    chars [-15:-4] of the jpg path, voc12/data.py:49-55) and bare-name lines
    ('2007_000032')."""
    lines = open(dataset_path).read().splitlines()
    names = []
    for line in lines:
        if not line.strip():
            continue
        first = line.split(" ")[0]
        if first.endswith(".jpg"):
            names.append(first[-15:-4])
        else:
            names.append(first.strip())
    return names


def load_image_label_from_xml(img_name: str, voc12_root: str) -> np.ndarray:
    from xml.dom import minidom

    path = os.path.join(voc12_root, ANNOT_FOLDER_NAME, img_name + ".xml")
    elems = minidom.parse(path).getElementsByTagName("name")
    lab = np.zeros(20, np.float32)
    for el in elems:
        cat = el.firstChild.data
        if cat in CAT_NAME_TO_NUM:
            lab[CAT_NAME_TO_NUM[cat]] = 1.0
    return lab


def load_image_label_list(
    img_name_list: list[str], voc12_root: str, cls_labels_path: str | None = None
) -> list[np.ndarray]:
    """Multi-hot labels for each image, from (in order of preference) an
    explicit cls_labels.npy, a cached one next to the VOC root, or the XML
    annotations (then cached)."""
    candidates = [cls_labels_path] if cls_labels_path else []
    candidates += [
        os.path.join(voc12_root, "cls_labels.npy"),
        os.path.join("voc12", "cls_labels.npy"),
    ]
    for cand in candidates:
        if cand and os.path.exists(cand):
            d = np.load(cand, allow_pickle=True).item()
            if all(n in d for n in img_name_list):
                return [np.asarray(d[n], np.float32) for n in img_name_list]
    labels = {n: load_image_label_from_xml(n, voc12_root) for n in img_name_list}
    try:
        np.save(os.path.join(voc12_root, "cls_labels.npy"), labels)  # cache
    except OSError:
        pass
    return [labels[n] for n in img_name_list]


class VOC12ImageDataset:
    def __init__(self, img_name_list_path: str, voc12_root: str, transform=None):
        self.img_name_list = load_img_name_list(img_name_list_path)
        self.voc12_root = voc12_root
        self.transform = transform

    def __len__(self):
        return len(self.img_name_list)

    def _load(self, idx: int) -> tuple[str, PIL.Image.Image]:
        name = self.img_name_list[idx]
        img = PIL.Image.open(get_img_path(name, self.voc12_root)).convert("RGB")
        return name, img

    def __getitem__(self, idx: int):
        name, img = self._load(idx)
        if self.transform:
            img = self.transform(img)
        return name, img


class VOC12ClsDataset(VOC12ImageDataset):
    def __init__(self, img_name_list_path, voc12_root, transform=None, cls_labels_path=None):
        super().__init__(img_name_list_path, voc12_root, transform)
        self.label_list = load_image_label_list(
            self.img_name_list, voc12_root, cls_labels_path
        )

    def __getitem__(self, idx: int):
        name, img = super().__getitem__(idx)
        return name, img, self.label_list[idx]


class ContrastTrainDataset(VOC12ClsDataset):
    """The stage-1 training pipeline (contrast_train.py:64-75):
    RandomResizeLong(448,768) -> flip -> ColorJitter -> normalize ->
    RandomCrop(crop) — emitting HWC float32.

    det_seed: when set, sample idx in epoch e is augmented by a private
    `random.Random((det_seed, e, idx))` — bit-reproducible across processes
    and thread schedules (the kill-and-resume equivalence guarantee; the
    epoch index comes from `set_epoch`, called by DataLoader). None = global
    random stream (reference-style)."""

    def __init__(self, img_name_list_path, voc12_root, crop_size=448,
                 min_long=448, max_long=768, cls_labels_path=None,
                 det_seed: int | None = None):
        super().__init__(img_name_list_path, voc12_root, None, cls_labels_path)
        self.resize = T.RandomResizeLong(min_long, max_long)
        self.flip = T.RandomHorizontalFlip()
        self.jitter = T.ColorJitter(0.3, 0.3, 0.3, 0.1)
        self.normalize = T.Normalize()
        self.crop = T.RandomCrop(crop_size)
        self.det_seed = det_seed
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __getitem__(self, idx: int):
        import random as _random

        rng = (
            _random.Random(f"{self.det_seed}:{self._epoch}:{idx}")
            if self.det_seed is not None else None
        )
        name, img = self._load(idx)
        img = self.resize(img, rng)
        img = self.flip(img, rng)
        if isinstance(img, np.ndarray):
            img = PIL.Image.fromarray(img)
        img = self.jitter(img, rng)
        arr = self.crop(self.normalize(img), rng)
        return name, arr, self.label_list[idx]


class VOC12ClsDatasetMSF(VOC12ClsDataset):
    """Multi-scale + flip views (voc12/data.py:92-121): for each scale,
    PIL-bicubic resize then [orig, flipped], normalized HWC float32."""

    def __init__(self, img_name_list_path, voc12_root, scales=(0.5, 1.0, 1.5, 2.0),
                 unit=1, cls_labels_path=None):
        super().__init__(img_name_list_path, voc12_root, None, cls_labels_path)
        self.scales = scales
        self.unit = unit
        self.normalize = T.Normalize()

    def __getitem__(self, idx: int):
        name, img = self._load(idx)
        views = T.msf_views(img, self.scales, self.unit)
        views = [self.normalize(v) for v in views]
        return name, views, self.label_list[idx], (img.size[1], img.size[0])


class VOC12ClsDatasetMS(VOC12ClsDataset):
    """Multi-scale views WITHOUT flips (voc12/data.py:123-147)."""

    def __init__(self, img_name_list_path, voc12_root, scales=(0.5, 1.0, 1.5, 2.0),
                 unit=1, cls_labels_path=None):
        super().__init__(img_name_list_path, voc12_root, None, cls_labels_path)
        self.scales = scales
        self.unit = unit
        self.normalize = T.Normalize()

    def __getitem__(self, idx: int):
        name, img = self._load(idx)
        views = T.msf_views(img, self.scales, self.unit)[::2]  # drop flips
        views = [self.normalize(v) for v in views]
        return name, views, self.label_list[idx], (img.size[1], img.size[0])


class VOC12SaliencyDataset(VOC12ClsDataset):
    """Classification dataset with an aligned saliency map channel — the
    `eps` branch's dataset variant (voc12/voc_saliency.py:59-86). Saliency
    maps are grayscale pngs in `saliency_root`; the same geometric transforms
    are applied jointly to image and map."""

    def __init__(self, img_name_list_path, voc12_root, saliency_root,
                 crop_size=448, min_long=448, max_long=768, cls_labels_path=None):
        super().__init__(img_name_list_path, voc12_root, None, cls_labels_path)
        self.saliency_root = saliency_root
        self.crop = T.RandomCrop(crop_size)
        self.jitter = T.ColorJitter(0.3, 0.3, 0.3, 0.1)
        self.normalize = T.Normalize()
        self.min_long = min_long
        self.max_long = max_long

    def __getitem__(self, idx: int):
        import random as _random

        import PIL.Image

        name, img = self._load(idx)
        sal = PIL.Image.open(
            os.path.join(self.saliency_root, name + ".png")
        ).convert("L")

        target_long = _random.randint(self.min_long, self.max_long)
        w, h = img.size
        if w < h:
            shape = (int(round(w * target_long / h)), target_long)
        else:
            shape = (target_long, int(round(h * target_long / w)))
        img = img.resize(shape, PIL.Image.BICUBIC)
        sal = sal.resize(shape, PIL.Image.BICUBIC)

        if bool(_random.getrandbits(1)):
            img = img.transpose(PIL.Image.FLIP_LEFT_RIGHT)
            sal = sal.transpose(PIL.Image.FLIP_LEFT_RIGHT)
        img = self.jitter(img)

        arr = self.normalize(img)
        sal_arr = np.asarray(sal, np.float32)[..., None] / 255.0
        box = self.crop.get_box(*arr.shape[:2])
        arr = self.crop.apply(arr, box)
        sal_arr = self.crop.apply(sal_arr, box)
        return name, arr, sal_arr, self.label_list[idx]


class VOC12AffGtDataset(VOC12ImageDataset):
    """AffinityNet samples from ground-truth (or pseudo) mask pngs
    (voc12/data.py:263-304): image + label png -> joint crop/flip -> 8x
    nearest-subsampled label -> radius-pair affinity targets."""

    def __init__(self, img_name_list_path, label_dir, voc12_root,
                 cropsize=448, radius=5):
        super().__init__(img_name_list_path, voc12_root, None)
        from wseg_tpu.data.affinity_labels import ExtractAffinityLabelInRadius

        self.label_dir = label_dir
        self.jitter = T.ColorJitter(0.3, 0.3, 0.3, 0.1)
        self.normalize = T.Normalize()
        self.crop = T.RandomCrop(cropsize)
        self.extract = ExtractAffinityLabelInRadius(cropsize // 8, radius)

    def __getitem__(self, idx: int):
        import random as _random

        import PIL.Image

        name, img = self._load(idx)
        label = np.asarray(
            PIL.Image.open(os.path.join(self.label_dir, name + ".png"))
        ).astype(np.float32)[..., None]

        img = self.jitter(img)
        raw = np.asarray(img, np.float32)
        box = self.crop.get_box(*raw.shape[:2])
        # pad regions get label 255 (ignore)
        ct, cl, it_, il, ch, cw = box
        lab = np.full((self.crop.cropsize, self.crop.cropsize, 1), 255.0, np.float32)
        lab[ct : ct + ch, cl : cl + cw] = label[it_ : it_ + ch, il : il + cw]
        raw = self.crop.apply(raw, box)
        arr = self.normalize(raw)
        if bool(_random.getrandbits(1)):
            arr = np.fliplr(arr).copy()
            lab = np.fliplr(lab).copy()
        # nearest 8x subsample of the hard labels
        lab8 = lab[::8, ::8, 0].astype(np.uint8)
        bg_pos, fg_pos, neg = self.extract(lab8)
        return arr, (bg_pos, fg_pos, neg)


class VOC12AffDataset(VOC12ImageDataset):
    """AffinityNet training samples (voc12/data.py:201-261): image + fused
    la/ha CRF pseudo label -> joint aug -> 8x pooled label -> radius-pair
    affinity targets (bg_pos, fg_pos, neg)."""

    def __init__(self, img_name_list_path, label_la_dir, label_ha_dir, voc12_root,
                 cropsize=448, radius=5, det_seed: int | None = None):
        super().__init__(img_name_list_path, voc12_root, None)
        from wseg_tpu.data.affinity_labels import ExtractAffinityLabelInRadius

        self.label_la_dir = label_la_dir
        self.label_ha_dir = label_ha_dir
        self.jitter = T.ColorJitter(0.3, 0.3, 0.3, 0.1)
        self.normalize = T.Normalize()
        self.crop = T.RandomCrop(cropsize)
        self.label_pool = T.AvgPool2d(8)
        self.extract = ExtractAffinityLabelInRadius(cropsize // 8, radius)
        # same epoch-indexed determinism contract as ContrastTrainDataset
        self.det_seed = det_seed
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __getitem__(self, idx: int):
        import random as _random

        rng = (
            _random.Random(f"{self.det_seed}:{self._epoch}:{idx}")
            if self.det_seed is not None else None
        )
        name, img = self._load(idx)
        label_la = np.load(os.path.join(self.label_la_dir, name + ".npy"), allow_pickle=True)
        label_ha = np.load(os.path.join(self.label_ha_dir, name + ".npy"), allow_pickle=True)
        if hasattr(label_la, "item") and label_la.dtype == object:
            label_la = np.array(list(label_la.item().values()))
            label_ha = np.array(list(label_ha.item().values()))
        label = np.concatenate([label_la, label_ha], axis=0)  # (42, h, w)
        label = np.transpose(label, (1, 2, 0))

        # reference order (aff_train.py:42-60): jitter -> joint RandomCrop on
        # the RAW uint8 image (pad pixels are black and only then normalized,
        # so padding = normalize(0), not 0) -> normalize -> joint flip
        img = self.jitter(img, rng)
        raw = np.asarray(img, np.float32)
        box = self.crop.get_box(*raw.shape[:2], rng=rng)
        raw = self.crop.apply(raw, box)
        label = self.crop.apply(label.astype(np.float32), box)
        arr = self.normalize(raw)
        if bool((rng or _random).getrandbits(1)):
            arr = np.fliplr(arr).copy()
            label = np.fliplr(label).copy()

        label = self.label_pool(label)

        # la/ha fusion (voc12/data.py:251-258)
        no_score = np.max(label, -1) < 1e-5
        la, ha = np.array_split(label, 2, axis=-1)
        la = np.argmax(la, axis=-1).astype(np.uint8)
        ha = np.argmax(ha, axis=-1).astype(np.uint8)
        fused = la.copy()
        fused[la == 0] = 255  # low-alpha bg -> ignore
        fused[ha == 0] = 0  # high-alpha bg -> confident bg
        fused[no_score] = 255
        bg_pos, fg_pos, neg = self.extract(fused)
        return arr, (bg_pos, fg_pos, neg)
