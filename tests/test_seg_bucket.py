"""Bucketed (zero-padded) stage-3 inference must match exact-shape forwards.

Measured before the fix: seg_test's bucket-64 padding gave only ~85% argmax
agreement with exact shapes (with randomized BN running stats) — the dilated
receptive field spreads the pad-halo BN bias over the whole image. The fix
mirrors the stage-1 mechanism (models/resnet38.py): `valid_hw` re-zeroes the
halo after every bn+relu through the seg backbones and heads, the ASPP
global branch averages over the valid region only, and `raw_logits=True`
lets the caller crop the valid stride-8 region and upsample host-side with
exact-shape weights (cli/seg_test.py).
"""

import numpy as np
import pytest


def _randomized_variables(model, rng_key=0):
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(rng_key)
    variables = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    r = np.random.RandomState(42)

    def rand_stats(path, leaf):
        name = path[-1].key
        arr = np.asarray(leaf)
        if name == "mean":
            return jnp.asarray(r.normal(0, 0.5, arr.shape).astype(np.float32))
        return jnp.asarray(r.uniform(0.5, 2.0, arr.shape).astype(np.float32))

    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        rand_stats, variables["batch_stats"]
    )
    return variables


def _check_exact(model, pad_hw=(128, 128), hw=(75, 93)):
    import jax
    import jax.numpy as jnp

    variables = _randomized_variables(model)
    rng = np.random.RandomState(0)
    h, w = hw
    x = rng.rand(1, h, w, 3).astype(np.float32)

    exact = np.asarray(
        jax.jit(lambda v, a: model.apply(v, a, raw_logits=True))(
            variables, jnp.asarray(x)
        )
    )[0]

    xp = np.zeros((1, pad_hw[0], pad_hw[1], 3), np.float32)
    xp[:, :h, :w] = x
    valid = jnp.asarray([[h, w]], jnp.int32)
    padded = np.asarray(
        jax.jit(
            lambda v, a, vd: model.apply(v, a, valid_hw=vd, raw_logits=True)
        )(variables, jnp.asarray(xp), valid)
    )[0][: exact.shape[0], : exact.shape[1]]

    np.testing.assert_allclose(padded, exact, atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(padded.argmax(-1), exact.argmax(-1))


@pytest.mark.slow
def test_deeplabv1_resnet38_bucketed_equals_exact():
    from wseg_tpu.seg.config import EXPERIMENTS
    from wseg_tpu.seg.deeplab import generate_net

    _check_exact(generate_net(EXPERIMENTS["SEAM_deeplabv1_resnet38"]))


@pytest.mark.slow
def test_deeplabv2_resnet18_global_aspp_bucketed_equals_exact():
    """Exercises DilatedResNet (BasicBlock) + ASPP with the global-pool
    branch — the branch whose unmasked mean contaminates EVERY pixel."""
    from wseg_tpu.seg.config import SegConfig
    from wseg_tpu.seg.deeplab import generate_net

    cfg = SegConfig(
        MODEL_NAME="deeplabv2", MODEL_BACKBONE="resnet18",
        MODEL_ASPP_HASGLOBAL=True,
    )
    _check_exact(generate_net(cfg))


@pytest.mark.slow
def test_deeplabv3_resnet50_bucketed_equals_exact():
    """Bottleneck blocks (mask_in path) + v3 ASPP."""
    from wseg_tpu.seg.config import SegConfig
    from wseg_tpu.seg.deeplab import generate_net

    cfg = SegConfig(
        MODEL_NAME="deeplabv3", MODEL_BACKBONE="resnet50",
        MODEL_ASPP_HASGLOBAL=True,
    )
    _check_exact(generate_net(cfg))


@pytest.mark.slow
def test_deeplabv2_xception_bucketed_equals_exact():
    """Xception-65 path: masking happens before every depthwise conv (the
    only neighbor-reading op; 1x1 pointwise keeps halo garbage in halo
    lanes), plus the exposed hook taps and exit features."""
    from wseg_tpu.seg.config import SegConfig
    from wseg_tpu.seg.deeplab import generate_net

    cfg = SegConfig(
        MODEL_NAME="deeplabv2", MODEL_BACKBONE="xception",
        MODEL_ASPP_HASGLOBAL=True,
    )
    _check_exact(generate_net(cfg))


@pytest.mark.slow
def test_deeplabv1_bucketed_awkward_pad_shape():
    """Padded heights where round(ph / ceil(ph/8)) != 8 (e.g. 65 -> 9
    features -> round() says stride 7): the mask stride must come from the
    backbone's declared output stride, not be derived from shapes — shape
    derivation is ambiguous exactly here. Regression for a round-3 review
    finding."""
    from wseg_tpu.seg.config import EXPERIMENTS
    from wseg_tpu.seg.deeplab import generate_net

    model = generate_net(EXPERIMENTS["SEAM_deeplabv1_resnet38"])
    _check_exact(model, pad_hw=(65, 105), hw=(57, 97))
