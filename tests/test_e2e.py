"""End-to-end smoke test of the 3-stage pipeline file contracts on a tiny
synthetic VOC root (SURVEY.md §4d): CAM npy dicts -> CRF label npys ->
affinity targets -> random-walk pseudo-mask pngs -> seg dataset batch.
Runs on the CPU test platform with small shapes."""

import os

import numpy as np
import pytest
import PIL.Image


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("VOC2012")
    (root / "JPEGImages").mkdir()
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    rng = np.random.RandomState(0)
    xml = "<annotation><object><name>{c}</name></object></annotation>"
    names = ["2007_000101", "2007_000102"]
    for name, c in zip(names, ["dog", "cat"]):
        img = (rng.rand(56, 72, 3) * 255).astype(np.uint8)
        PIL.Image.fromarray(img).save(root / "JPEGImages" / f"{name}.jpg")
        (root / "Annotations" / f"{name}.xml").write_text(xml.format(c=c))
        seg = rng.randint(0, 3, (56, 72)).astype(np.uint8)
        PIL.Image.fromarray(seg).save(root / "SegmentationClass" / f"{name}.png")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text("\n".join(names) + "\n")
    list_file = root / "list.txt"
    list_file.write_text("\n".join(names) + "\n")
    return root, names


@pytest.mark.slow
def test_full_pipeline_contracts(voc_root, tmp_path):
    import jax
    import jax.numpy as jnp

    root, names = voc_root
    out = tmp_path

    # ---- stage 1: MSF CAM inference -> npy dict + pred png ----
    from wseg_tpu.data.voc12 import VOC12ClsDatasetMSF
    from wseg_tpu.infer.cam import CamInferencer, save_cam_dict, save_cam_pred
    from wseg_tpu.models import build_model

    model = build_model("contrast")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    dataset = VOC12ClsDatasetMSF(str(root / "list.txt"), str(root), scales=(0.5, 1.0))
    inferencer = CamInferencer(model, variables, scales=(0.5, 1.0), bucket=32)

    cam_dir = out / "cam"
    for idx in range(len(dataset)):
        name, views, label, orig_hw = dataset[idx]
        norm_cam = inferencer.infer_one(views, np.asarray(label), orig_hw)
        assert norm_cam.shape == (20, 56, 72)
        d = save_cam_dict(str(cam_dir), name, norm_cam, label)
        assert set(d) and all(v.shape == (56, 72) for v in d.values())
        save_cam_pred(str(out / "pred"), name, norm_cam)

    # contract: npy dict keyed by 0-based class idx of PRESENT classes only
    d = np.load(cam_dir / f"{names[0]}.npy", allow_pickle=True).item()
    assert list(d.keys()) == [11]  # dog
    png = np.array(PIL.Image.open(out / "pred" / f"{names[0]}.png"))
    assert png.dtype == np.uint8 and png.shape == (56, 72)

    # ---- stage 2a: CRF label prep (native permutohedral) ----
    from wseg_tpu.infer.crf_post import crf_with_alpha

    la_dir = out / "la"
    ha_dir = out / "ha"
    la_dir.mkdir()
    ha_dir.mkdir()
    for name in names:
        cam_dict = np.load(cam_dir / f"{name}.npy", allow_pickle=True).item()
        crf4 = crf_with_alpha(cam_dict, str(root / "JPEGImages" / f"{name}.jpg"), 4, t=2)
        crf24 = crf_with_alpha(cam_dict, str(root / "JPEGImages" / f"{name}.jpg"), 24, t=2)
        assert crf4.shape == (21, 56, 72)
        np.save(la_dir / f"{name}.npy", crf4)
        np.save(ha_dir / f"{name}.npy", crf24)

    # ---- stage 2b: affinity dataset consumes the la/ha arrays ----
    from wseg_tpu.data.voc12 import VOC12AffDataset

    aff_ds = VOC12AffDataset(
        str(root / "list.txt"), str(la_dir), str(ha_dir), str(root),
        cropsize=40, radius=3,
    )
    img, (bg_pos, fg_pos, neg) = aff_ds[0]
    assert img.shape == (40, 40, 3)
    assert bg_pos.shape == fg_pos.shape == neg.shape

    # ---- stage 2c: random-walk refinement -> pseudo-mask png ----
    from wseg_tpu.infer.rw import RandomWalkRefiner
    from wseg_tpu.models import build_model as bm

    aff_model = bm("affinity")
    aff_vars = aff_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.float32))
    refiner = RandomWalkRefiner(aff_model, aff_vars, beta=2, logt=2, bucket=32)
    from wseg_tpu.data.transforms import Normalize

    rw_dir = out / "rw"
    rw_dir.mkdir()
    for name in names:
        img = np.array(PIL.Image.open(root / "JPEGImages" / f"{name}.jpg"))
        cam_dict = np.load(cam_dir / f"{name}.npy", allow_pickle=True).item()
        cam_full = np.zeros((56, 72, 21), np.float32)
        for k, v in cam_dict.items():
            cam_full[..., k + 1] = v
        cam_full[..., 0] = 0.27
        pred = refiner.refine_one(Normalize()(img), cam_full)
        assert pred.shape == (56, 72) and pred.dtype == np.uint8
        PIL.Image.fromarray(pred).save(rw_dir / f"{name}.png")

    # ---- stage 3: seg dataset trains from the pseudo masks ----
    from wseg_tpu.seg.config import SegConfig
    from wseg_tpu.seg.dataset import generate_dataset

    cfg = SegConfig(
        DATA_ROOT=str(root), DATA_PSEUDO_GT=str(rw_dir), DATA_AUG=False,
        DATA_RANDOMCROP=32,
    )
    seg_ds = generate_dataset(cfg, period="val", transform="weak")
    sample = seg_ds[0]
    assert sample["image"].shape == (32, 32, 3)
    assert sample["segmentation"].shape == (32, 32)

    # ---- eval contract over the rw pngs ----
    from wseg_tpu.eval.miou import do_python_eval

    loglist = do_python_eval(
        str(rw_dir), str(root / "SegmentationClass"), names, num_workers=2
    )
    assert "mIoU" in loglist
