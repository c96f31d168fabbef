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


@pytest.mark.slow
def test_refine_batch_pixel_cap_chunking_is_exact():
    """refine_batch caps each dispatch at `max_walk_px` padded pixels
    (ROOFLINE.md 5d: b64 at 384x512 is the measured working-set limit, so
    larger buckets get smaller chunks). Chunked dispatches must produce the
    same masks as one unchunked dispatch and as per-image refine_one."""
    from wseg_tpu.infer.rw import RandomWalkRefiner
    from wseg_tpu.models import build_model

    model = build_model("affinity")
    variables = _realistic_variables(model)
    rng = np.random.RandomState(1)

    items = []
    for i in range(5):
        h, w = 60 + 2 * i, 62
        img = rng.rand(h, w, 3).astype(np.float32)
        cam = np.zeros((h, w, 21), np.float32)
        cam[..., 0] = 0.27
        cam[..., 3] = rng.rand(h, w)
        items.append((img, cam))

    # all 5 pad to the same (64, 64) bucket; cap at 2 images per dispatch
    kw = dict(beta=2, logt=2, bucket=64)
    chunked = RandomWalkRefiner(
        model, variables, max_walk_px=2 * 64 * 64, **kw
    ).refine_batch(items)
    whole = RandomWalkRefiner(model, variables, **kw).refine_batch(items)
    one = RandomWalkRefiner(model, variables, **kw)
    for i, (img, cam) in enumerate(items):
        np.testing.assert_array_equal(chunked[i], whole[i])
        np.testing.assert_array_equal(chunked[i], one.refine_one(img, cam))


@pytest.mark.slow
def test_view_chunking_is_exact():
    """Per-dispatch pixel caps (infer/cam.py MAX_VIEW_PX) split big-scale
    batches into chunks — lax.map inside make_fused_msf_fn's per-scale
    program, several device calls in infer_batch. Both must be numerically
    identical to the unchunked dispatch."""
    import jax.numpy as jnp

    from wseg_tpu.data import transforms as T
    from wseg_tpu.infer.cam import CamInferencer, _view_chunks, make_fused_msf_fn
    from wseg_tpu.models import build_model
    from PIL import Image

    cap = 2 * 24 * 768 * 1024
    assert _view_chunks(32, 768, 1024, cap) == 2
    assert _view_chunks(16, 768, 1024, cap) == 1
    assert _view_chunks(24, 768, 1024, cap) == 1
    # non-dividing start count walks up to the next divisor
    assert _view_chunks(9, 768, 1024, 2 * 4 * 768 * 1024) == 3
    # a single flip pair over the cap terminates (whole-batch fallback)
    assert _view_chunks(1, 4400, 4400, cap) == 1
    # mesh multiples: walk UP to the first divisor whose chunk is a mesh
    # multiple, never widen a chunk past the cap
    assert _view_chunks(56, 768, 1024, cap, 8) == 7   # chunks of 8
    assert _view_chunks(184, 768, 1024, cap, 8) == 23  # chunks of 8
    assert _view_chunks(32, 768, 1024, cap, 8) == 2   # chunks of 16
    # over-cap even at one-image-per-device: smallest mesh-legal chunking
    assert _view_chunks(8, 4400, 4400, cap, 8) == 1

    model = build_model("contrast")
    variables = _realistic_variables(model)
    rng = np.random.RandomState(1)

    # fused fixed-size path: cap that forces 2 chunks at scale 2.0 only
    h0, w0 = 48, 64
    scales = (1.0, 2.0)
    b = 4
    views = tuple(
        jnp.asarray(rng.rand(b, 2, round(h0 * s), round(w0 * s), 3), jnp.float32)
        for s in scales
    )
    label = jnp.asarray((rng.rand(b, 20) > 0.5).astype(np.float32))
    full = make_fused_msf_fn(model, (h0, w0), scales=scales)(variables, views, label)
    cap = 2 * 2 * round(h0 * 2.0) * round(w0 * 2.0)  # 2 images of the big view
    chunked = make_fused_msf_fn(model, (h0, w0), scales=scales, max_view_px=cap)(
        variables, views, label
    )
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-5)

    # bucketed variable-size path: chunked infer_batch == per-image infer_one
    norm = T.Normalize()
    items = []
    for i, (h, w) in enumerate([(50, 61), (43, 70), (62, 55), (57, 57)]):
        img = Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
        vs = [norm(v) for v in T.msf_views(img, scales, 1)]
        lbl = np.zeros(20, np.float32)
        lbl[[i, i + 4]] = 1.0
        items.append((vs, lbl, (h, w)))
    inf = CamInferencer(model, variables, scales=scales, bucket=32)
    want = [inf.infer_one(vs, lbl, hw) for vs, lbl, hw in items]
    inf_chunked = CamInferencer(
        model, variables, scales=scales, bucket=32,
        max_view_px=2 * 2 * 160 * 160,  # forces 2 chunks on the scale-2 bucket
    )
    got = inf_chunked.infer_batch(items)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(g, w_, atol=1e-4)


@pytest.mark.slow
def test_view_chunking_exact_on_mesh():
    """infer_batch's per-dispatch pixel cap with a multi-device mesh: chunk
    sizes stay mesh-multiples (the divisibility walk at infer/cam.py
    infer_batch) and outputs equal per-image infer_one."""
    import jax
    import jax.numpy as jnp  # noqa: F401 — platform already forced by conftest

    from wseg_tpu.data import transforms as T
    from wseg_tpu.infer.cam import CamInferencer
    from wseg_tpu.models import build_model
    from wseg_tpu.parallel.mesh import make_mesh
    from PIL import Image

    assert len(jax.devices()) == 8  # conftest CPU mesh
    model = build_model("contrast")
    variables = _realistic_variables(model)
    rng = np.random.RandomState(7)
    scales = (1.0, 2.0)
    norm = T.Normalize()
    items = []
    for i in range(16):
        h, w = 40 + (i % 3) * 7, 50 + (i % 2) * 9
        img = Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
        vs = [norm(v) for v in T.msf_views(img, scales, 1)]
        lbl = np.zeros(20, np.float32)
        lbl[[i % 20, (i + 5) % 20]] = 1.0
        items.append((vs, lbl, (h, w)))

    inf_one = CamInferencer(model, variables, scales=scales, bucket=32)
    want = [inf_one.infer_one(vs, lbl, hw) for vs, lbl, hw in items]

    mesh = make_mesh()
    # cap sized so the scale-2 bucket (<=128x128 padded view) needs 2 chunks
    # of 8 images each — exactly one mesh row per chunk
    inf = CamInferencer(
        model, variables, scales=scales, bucket=32, mesh=mesh,
        max_view_px=2 * 8 * 128 * 128,
    )
    got = inf.infer_batch(items)
    assert len(got) == len(items)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(g, w_, atol=1e-4)
