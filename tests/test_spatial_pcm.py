"""Spatially-sharded PCM equals the single-device op on an 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from wseg_tpu.ops.pcm import pcm
from wseg_tpu.parallel.mesh import make_mesh
from wseg_tpu.parallel.spatial import pcm_spatial


def test_pcm_spatial_matches_single_device():
    mesh = make_mesh(jax.devices()[:8], axis_name="space")
    rng = np.random.RandomState(0)
    n, h, w, cf, c = 1, 16, 16, 48, 21  # hw = 256, divisible by 8
    f = jnp.asarray(rng.randn(n, h, w, cf), jnp.float32)
    cam = jnp.asarray(rng.rand(n, h, w, c), jnp.float32)

    want = np.asarray(pcm(cam, f))  # (N, H, W, C)

    got = jax.jit(
        lambda cam, f: pcm_spatial(cam, f, mesh, axis="space")
    )(cam.reshape(n, h * w, c), f.reshape(n, h * w, cf))
    got = np.asarray(got).reshape(n, h, w, c)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_msf_inference_data_parallel():
    """The MSF CAM inference pipeline under a data mesh: batch sharded over 8
    virtual chips produces the same fused CAMs as single-device."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wseg_tpu.infer.cam import make_fused_msf_fn
    from wseg_tpu.models import build_model

    model = build_model("contrast")
    rng = np.random.RandomState(0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))

    h0 = w0 = 48
    b = 8
    scales = (0.5, 1.0)
    views = tuple(
        jnp.asarray(rng.rand(b, 2, round(h0 * s), round(w0 * s), 3), jnp.float32)
        for s in scales
    )
    label = jnp.asarray((rng.rand(b, 20) > 0.5).astype(np.float32))
    fn = make_fused_msf_fn(model, (h0, w0), scales=scales)

    want = np.asarray(fn(variables, views, label))

    mesh = make_mesh(jax.devices()[:8])
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    views_sh = tuple(jax.device_put(v, data) for v in views)
    label_sh = jax.device_put(label, data)
    vars_sh = jax.device_put(variables, repl)
    got = np.asarray(fn(vars_sh, views_sh, label_sh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
