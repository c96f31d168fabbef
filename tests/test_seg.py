"""Stage-3 segmentation tests: nets, CE loss, param labels, train step, BN sync."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from wseg_tpu.seg.config import EXPERIMENTS, SegConfig
from wseg_tpu.seg.deeplab import generate_net, seg_param_labels
from wseg_tpu.train.seg import SegTrainState, cross_entropy_ignore, make_seg_train_step


def test_cross_entropy_ignore_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 8, 21).astype(np.float32)
    labels = rng.randint(0, 21, (2, 8, 8))
    labels[0, :2] = 255
    got = float(cross_entropy_ignore(logits, labels))
    lt = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    want = float(
        torch.nn.CrossEntropyLoss(ignore_index=255)(lt, torch.from_numpy(labels).long())
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize(
    "name", ["deeplabv1", "deeplabv1_caffe", "deeplabv2", "deeplabv3", "deeplabv3plus"]
)
def test_deeplab_heads_forward(name):
    cfg = SegConfig(MODEL_NAME=name, MODEL_BACKBONE="resnet50",
                    MODEL_ASPP_OUTDIM=64, MODEL_ASPP_HASGLOBAL=True)
    model = generate_net(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x)
    out = model.apply(variables, x)
    assert out.shape == (1, 64, 64, 21)


def test_deeplabv1_resnet38_and_param_labels():
    cfg = EXPERIMENTS["SEAM_deeplabv1_resnet38"]
    model = generate_net(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x)
    out = model.apply(variables, x)
    assert out.shape == (1, 64, 64, 21)

    labels = seg_param_labels(variables["params"])
    assert labels["cls_conv"]["kernel"] == "scratch_w"
    assert labels["cls_conv"]["bias"] == "scratch_b"
    assert labels["conv_fov"]["kernel"] == "scratch_w"
    assert labels["bn_fov"]["scale"] == "frozen"
    # backbone convs are pretrained group
    flat = jax.tree_util.tree_leaves_with_path(labels)
    backbone_labels = {
        jax.tree_util.keystr(p): v for p, v in flat if "backbone" in jax.tree_util.keystr(p)
    }
    assert any(v == "pretrained_w" for v in backbone_labels.values())
    assert all(v in ("pretrained_w", "pretrained_b", "frozen") for v in backbone_labels.values())


def test_seg_train_step_updates_and_bn_stats():
    from wseg_tpu.train.optim import poly_sgd

    cfg = SegConfig(MODEL_BACKBONE="resnet18", MODEL_ASPP_OUTDIM=32)
    model = generate_net(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x)
    params, stats = variables["params"], variables["batch_stats"]
    tx = poly_sgd(0.001, 5e-4, max_step=101, momentum=0.9,
                  labels=seg_param_labels(params))
    # snapshot before the step — the jitted step donates its input state
    before_cls = np.asarray(params["cls_conv"]["kernel"]).copy()
    before_bn_scale = np.asarray(params["bn_fov"]["scale"]).copy()
    before_bn_mean = np.asarray(stats["bn_fov"]["mean"]).copy()

    state = SegTrainState(params, tx.init(params), stats, rng)
    step = make_seg_train_step(model, tx)
    seg = np.random.RandomState(1).randint(0, 21, (2, 64, 64)).astype(np.int32)
    new_state, metrics = step(state, x, jnp.asarray(seg))
    assert np.isfinite(float(metrics["loss"]))
    # cls_conv updated; BN affine untouched; BN running stats moved
    assert not np.allclose(np.asarray(new_state.params["cls_conv"]["kernel"]), before_cls)
    np.testing.assert_array_equal(
        np.asarray(new_state.params["bn_fov"]["scale"]), before_bn_scale
    )
    assert not np.allclose(np.asarray(new_state.batch_stats["bn_fov"]["mean"]), before_bn_mean)


def test_global_batch_bn_is_sync_bn():
    """BN stats computed under jit with a batch-sharded input must equal the
    single-device full-batch stats — the property the reference needs ~800
    LoC of SyncBN for (sync_batchnorm/batchnorm.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wseg_tpu.models.layers import BatchNorm2d
    from wseg_tpu.parallel.mesh import make_mesh

    bn = BatchNorm2d(4, frozen=False, momentum=0.1)
    x = np.random.RandomState(0).randn(8, 4, 4, 4).astype(np.float32)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def fwd(v, x):
        out, new = bn.apply(v, x, use_running_average=False, mutable=["batch_stats"])
        return out, new["batch_stats"]

    # single device reference
    out_ref, stats_ref = jax.jit(fwd)(variables, jnp.asarray(x))

    mesh = make_mesh(jax.devices()[:8])
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    out_sh, stats_sh = jax.jit(fwd)(vs, xs)

    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_sh), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats_ref["mean"]), np.asarray(stats_sh["mean"]), atol=1e-6
    )


def test_xception_backbone_forward():
    from wseg_tpu.seg.xception import Xception

    model = Xception()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    l1, l2, l4 = model.apply(variables, x)
    assert l1.shape == (1, 16, 16, 256)   # os 8: stride 4 tap
    assert l4.shape == (1, 8, 8, 2048)


def test_deeplabv3plus_xception():
    cfg = SegConfig(MODEL_NAME="deeplabv3plus", MODEL_BACKBONE="xception",
                    MODEL_ASPP_OUTDIM=64, MODEL_ASPP_HASGLOBAL=True)
    model = generate_net(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x)
    out = model.apply(variables, x)
    assert out.shape == (1, 64, 64, 21)
