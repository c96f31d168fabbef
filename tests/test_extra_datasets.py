"""Registered non-VOC segmentation datasets over synthetic directory trees."""

import numpy as np
import PIL.Image

import wseg_tpu.seg  # noqa: F401  (registers datasets)
from wseg_tpu.seg.config import SegConfig
from wseg_tpu.seg.dataset import generate_dataset


def test_cityscapes_layout(tmp_path):
    root = tmp_path
    img_dir = root / "leftImg8bit" / "val" / "frankfurt"
    seg_dir = root / "gtFine" / "val" / "frankfurt"
    img_dir.mkdir(parents=True)
    seg_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    name = "frankfurt_000000_000294"
    PIL.Image.fromarray((rng.rand(64, 128, 3) * 255).astype(np.uint8)).save(
        img_dir / f"{name}_leftImg8bit.png"
    )
    PIL.Image.fromarray(rng.randint(0, 19, (64, 128)).astype(np.uint8)).save(
        seg_dir / f"{name}_gtFine_labelTrainIds.png"
    )
    cfg = SegConfig(DATA_NAME="CityscapesDataset", DATA_ROOT=str(root),
                    DATA_RANDOMCROP=32, MODEL_NUM_CLASSES=19)
    ds = generate_dataset(cfg, period="val", transform="weak")
    assert len(ds) == 1
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["segmentation"].shape == (32, 32)


def test_ade20k_layout_and_remap(tmp_path):
    root = tmp_path
    (root / "images" / "validation").mkdir(parents=True)
    (root / "annotations" / "validation").mkdir(parents=True)
    rng = np.random.RandomState(1)
    PIL.Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
        root / "images" / "validation" / "ADE_val_00000001.jpg"
    )
    seg = rng.randint(0, 5, (48, 48)).astype(np.uint8)  # 0 = unlabeled
    PIL.Image.fromarray(seg).save(
        root / "annotations" / "validation" / "ADE_val_00000001.png"
    )
    cfg = SegConfig(DATA_NAME="ADE20KDataset", DATA_ROOT=str(root),
                    DATA_RANDOMCROP=32, MODEL_NUM_CLASSES=150)
    ds = generate_dataset(cfg, period="val", transform="weak")
    s = ds[0]
    remapped = ds.load_segmentation("ADE_val_00000001")
    assert remapped[seg == 0].max(initial=255) == 255  # unlabeled -> ignore
    assert (remapped[seg == 3] == 2).all()  # shifted by -1
