"""Bucketed (zero-padded) inference must match exact-shape inference.

VERDICT r1 weak #2: `CamInferencer.infer_one` pads views up to `--bucket` and
crops after the forward; without masking, the BN pad halo contaminates the
backbone and PCM's column-normalized affinity mixes pad features into every
valid pixel. With `valid_hw` masking (models/resnet38.py valid_mask,
ops/pcm.py mask) the valid region is exactly the exact-shape forward.
"""

import numpy as np
import pytest


def _realistic_variables(model, rng_seed=0):
    """Init + randomized frozen-BN stats/affine (the contamination carriers)."""
    import jax
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(rng_seed), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    rng = np.random.RandomState(42)

    def rand_stats(path, leaf):
        name = path[-1].key
        arr = np.asarray(leaf)
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.5, arr.shape).astype(np.float32))
        return jnp.asarray(rng.uniform(0.5, 2.0, arr.shape).astype(np.float32))

    def rand_bn_affine(path, leaf):
        names = [getattr(k, "key", "") for k in path]
        arr = np.asarray(leaf)
        if any(str(n).startswith("bn") for n in names) and arr.ndim == 1:
            if names[-1] == "scale":
                return jnp.asarray(rng.normal(1.0, 0.2, arr.shape).astype(np.float32))
            return jnp.asarray(rng.normal(0.0, 0.2, arr.shape).astype(np.float32))
        return leaf

    stats = jax.tree_util.tree_map_with_path(rand_stats, variables["batch_stats"])
    params = jax.tree_util.tree_map_with_path(rand_bn_affine, variables["params"])
    return {"params": params, "batch_stats": stats}


@pytest.mark.slow
def test_masked_padded_forward_equals_exact():
    """Raw stride-8 forward: zero-pad to a bucket + valid_hw == exact shape."""
    import jax.numpy as jnp

    from wseg_tpu.models import build_model

    model = build_model("contrast")
    variables = _realistic_variables(model)

    for (h, w) in [(75, 93), (41, 127)]:
        x = np.random.RandomState(h).randn(1, h, w, 3).astype(np.float32) * 0.5
        ph, pw = -(-h // 64) * 64, -(-w // 64) * 64
        xp = np.pad(x, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))

        cam_e, rv_e = model.apply(variables, jnp.asarray(x), raw_cam=True)
        cam_p, rv_p = model.apply(
            variables, jnp.asarray(xp), raw_cam=True,
            valid_hw=jnp.asarray([[h, w]], jnp.int32),
        )
        he, we = cam_e.shape[1:3]
        np.testing.assert_allclose(
            np.asarray(cam_p)[:, :he, :we], np.asarray(cam_e), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(rv_p)[:, :he, :we], np.asarray(rv_e), atol=1e-5
        )
        # the pad halo of the output must be exactly zero (mask applied)
        assert np.abs(np.asarray(rv_p)[:, he:, :]).max() == 0.0


@pytest.mark.slow
def test_infer_one_bucketed_equals_exact():
    """Full MSF fusion: infer_one(bucket=64) == infer_one(bucket=None) on odd
    sizes, and the seed argmax (bg alpha 0.26) is identical."""
    from PIL import Image

    from wseg_tpu.data import transforms as T
    from wseg_tpu.infer.cam import CamInferencer
    from wseg_tpu.models import build_model

    model = build_model("contrast")
    variables = _realistic_variables(model)
    norm = T.Normalize()
    rng = np.random.RandomState(0)

    for (h0, w0) in [(75, 93), (97, 130)]:
        img = Image.fromarray((rng.rand(h0, w0, 3) * 255).astype(np.uint8))
        views = [norm(v) for v in T.msf_views(img, (0.5, 1.0, 1.5, 2.0), 1)]
        label = np.zeros(20, np.float32)
        label[[3, 7, 11]] = 1.0

        exact = CamInferencer(model, variables, bucket=None).infer_one(
            views, label, (h0, w0)
        )
        bucketed = CamInferencer(model, variables, bucket=64).infer_one(
            views, label, (h0, w0)
        )
        np.testing.assert_allclose(bucketed, exact, atol=1e-4)
        bg = np.ones((1, h0, w0)) * 0.26
        pred_e = np.argmax(np.concatenate([bg, exact]), 0)
        pred_b = np.argmax(np.concatenate([bg, bucketed]), 0)
        np.testing.assert_array_equal(pred_b, pred_e)


@pytest.mark.slow
def test_random_walk_bucketed_equals_reference_pad():
    """aff_infer's bucket-64 padding produces the SAME pseudo mask as the
    reference's pad-to-/8 (aff_infer.py:88-91). This holds structurally:
    pad pixels carry zero CAM mass (no source leakage through the walk), and
    the transition matrix's column normalization scales every class at a
    target pixel by the same factor, so the argmax is invariant to the pad
    halo's extra affinity mass. Verified with randomized frozen-BN stats
    (the contamination carriers in the CAM-path tests above)."""
    from wseg_tpu.infer.rw import RandomWalkRefiner
    from wseg_tpu.models import build_model

    model = build_model("affinity")
    variables = _realistic_variables(model)
    rng = np.random.RandomState(0)

    h, w = 70, 90
    img = rng.rand(h, w, 3).astype(np.float32)
    cam = np.zeros((h, w, 21), np.float32)
    cam[..., 0] = 0.27
    cam[..., 5] = rng.rand(h, w)
    cam[..., 9] = rng.rand(h, w)

    ref = RandomWalkRefiner(model, variables, beta=2, logt=2, bucket=8).refine_one(img, cam)
    for bucket in (32, 64):
        got = RandomWalkRefiner(model, variables, beta=2, logt=2, bucket=bucket).refine_one(img, cam)
        np.testing.assert_array_equal(got, ref)
