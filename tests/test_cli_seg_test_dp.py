"""Data-parallel stage-3 TTA from the CLI: `seg_test.main()` over the
8-virtual-device CPU mesh must produce the same predictions as per-view
EXACT-SHAPE forwards (no padding anywhere) — i.e. the bucketed, batched,
mesh-sharded path is reference-semantics exact end to end
(tests/test_seg_bucket.py proves the model level; this drives the CLI)."""

import os

import numpy as np
import pytest


def _make_seg_root(tmp_path, sizes):
    from PIL import Image

    root = tmp_path / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.RandomState(0)
    names = []
    for i, (h, w) in enumerate(sizes):
        name = f"2007_{i:06d}"
        names.append(name)
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            root / "JPEGImages" / f"{name}.jpg"
        )
        Image.fromarray(rng.randint(0, 4, (h, w)).astype(np.uint8)).save(
            root / "SegmentationClass" / f"{name}.png"
        )
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "\n".join(names) + "\n"
    )
    return str(root), names


@pytest.mark.slow
def test_cli_seg_test_data_parallel_matches_exact_shapes(tmp_path):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    assert len(jax.devices()) == 8  # conftest CPU mesh

    from wseg_tpu.cli import seg_test
    from wseg_tpu.ops.resize import _resize_weights_np
    from wseg_tpu.seg.config import EXPERIMENTS
    from wseg_tpu.seg.dataset import generate_dataset
    from wseg_tpu.seg.deeplab import generate_net
    from wseg_tpu.utils.checkpoint import save_checkpoint

    sizes = [(75, 93), (70, 90), (66, 95)]
    root, names = _make_seg_root(tmp_path, sizes)

    cfg = EXPERIMENTS["SEAM_deeplabv1_resnet38"].replace(DATA_ROOT=root)
    model = generate_net(cfg)
    k = jax.random.PRNGKey(0)
    variables = dict(model.init(
        {"params": k, "dropout": k}, jnp.zeros((1, 64, 64, 3), jnp.float32)
    ))
    # randomized BN running stats: the pad-contamination carriers
    r = np.random.RandomState(42)

    def rand_stats(path, leaf):
        arr = np.asarray(leaf)
        if path[-1].key == "mean":
            return jnp.asarray(r.normal(0, 0.5, arr.shape).astype(np.float32))
        return jnp.asarray(r.uniform(0.5, 2.0, arr.shape).astype(np.float32))

    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        rand_stats, variables["batch_stats"]
    )
    ckpt = str(tmp_path / "seg.ckpt")
    save_checkpoint(ckpt, variables)

    cwd = os.getcwd()
    os.chdir(tmp_path)  # results/ and log/ land in tmp
    try:
        seg_test.main([
            "--exp", "SEAM_deeplabv1_resnet38", "--data_root", root,
            "--ckpt", ckpt, "--period", "val", "--no_crf",
            # explicit: the 0=auto default is now 4/device = 32, which pads
            # this 3-image set 10x on the slow CPU mesh
            "--batch_size", "8",
        ])
    finally:
        os.chdir(cwd)

    # exact-shape comparator: per view, NO padding anywhere
    fwd = jax.jit(lambda v, x: model.apply(v, x, raw_logits=True))

    def up(logits, out_hw):
        wh = _resize_weights_np(logits.shape[0], out_hw[0], True)
        ww = _resize_weights_np(logits.shape[1], out_hw[1], True)
        return np.einsum("oh,hwc->owc", wh, np.einsum("pw,hwc->hpc", ww, logits))

    dataset = generate_dataset(cfg, period="val", transform="none")
    for idx, name in enumerate(names):
        sample = dataset[idx]
        h, w = sample["row"], sample["col"]
        acc = np.zeros((h, w, cfg.MODEL_NUM_CLASSES), np.float32)
        for rate in cfg.TEST_MULTISCALE:
            img = sample["image_%f" % rate]
            for j, view in enumerate([img, np.flip(img, axis=1).copy()]):
                lg8 = np.asarray(fwd(variables, jnp.asarray(view[None])))[0]
                lg = up(up(lg8, view.shape[:2]), (h, w))
                if j == 1:
                    lg = lg[:, ::-1]
                acc += lg
        want = np.argmax(acc, axis=-1).astype(np.uint8)
        got = np.array(Image.open(
            tmp_path / "results" / "Segmentation"
            / f"{cfg.MODEL_NAME}_val" / f"{name}.png"
        ))
        assert got.shape == want.shape
        # softmax then argmax == argmax of mean logits; allow <=0.2% of
        # pixels to flip on float near-ties between the batched-padded and
        # exact-shape programs
        agree = (got == want).mean()
        assert agree >= 0.998, agree


@pytest.mark.slow
def test_cli_seg_test_pixel_cap_chunking_matches_uncapped(tmp_path, monkeypatch):
    """A tiny MAX_TTA_PX forces every scale's dispatch through the row-chunk
    path (cap = n_devices rows per dispatch); predictions must match the
    single-dispatch run — the OOM-safety chunking is semantics-free."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from wseg_tpu.cli import seg_test
    from wseg_tpu.seg.config import EXPERIMENTS
    from wseg_tpu.seg.deeplab import generate_net
    from wseg_tpu.utils.checkpoint import save_checkpoint

    sizes = [(75, 93), (70, 90), (66, 95)]
    root, names = _make_seg_root(tmp_path, sizes)

    cfg = EXPERIMENTS["SEAM_deeplabv1_resnet38"].replace(DATA_ROOT=root)
    model = generate_net(cfg)
    k = jax.random.PRNGKey(0)
    variables = dict(model.init(
        {"params": k, "dropout": k}, jnp.zeros((1, 64, 64, 3), jnp.float32)
    ))
    ckpt = str(tmp_path / "seg.ckpt")
    save_checkpoint(ckpt, variables)

    def run(sub):
        d = tmp_path / sub
        d.mkdir()
        cwd = os.getcwd()
        os.chdir(d)
        try:
            seg_test.main([
                "--exp", "SEAM_deeplabv1_resnet38", "--data_root", root,
                "--ckpt", ckpt, "--period", "val", "--no_crf",
                "--batch_size", "8",
            ])
        finally:
            os.chdir(cwd)
        return {
            n: np.array(Image.open(
                d / "results" / "Segmentation"
                / f"{cfg.MODEL_NAME}_val" / f"{n}.png"
            ))
            for n in names
        }

    whole = run("uncapped")  # batch 8 -> one 16-row dispatch per scale
    monkeypatch.setattr(seg_test, "MAX_TTA_PX", 1)  # cap -> 8-row chunks
    capped = run("capped")
    for n in names:
        agree = (capped[n] == whole[n]).mean()
        assert agree >= 0.998, (n, agree)
