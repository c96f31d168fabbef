"""Model forward-shape and numerics smoke tests (tiny inputs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wseg_tpu.models import build_model


@pytest.fixture(scope="module")
def contrast_setup():
    model = build_model("contrast")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x

def test_contrast_forward_shapes(contrast_setup):
    model, variables, x = contrast_setup
    cam, cam_rv, f_proj, cam_rv_down = model.apply(variables, x)
    assert cam.shape == (1, 64, 64, 21)
    assert cam_rv.shape == (1, 64, 64, 21)
    assert f_proj.shape == (1, 8, 8, 128)  # stride 8
    assert cam_rv_down.shape == (1, 8, 8, 21)
    assert np.isfinite(np.asarray(cam)).all()


def test_contrast_param_shapes(contrast_setup):
    _, variables, _ = contrast_setup
    p = variables["params"]
    assert p["fc8"]["kernel"].shape == (1, 1, 4096, 21)
    assert p["fc_proj"]["kernel"].shape == (1, 1, 4096, 128)
    assert p["f9"]["kernel"].shape == (1, 1, 195, 192)
    bb = p["backbone"]
    assert bb["conv1a"]["kernel"].shape == (3, 3, 3, 64)
    assert bb["b7"]["conv_branch2b2"]["kernel"].shape == (1, 1, 2048, 4096)
    # frozen BN stats exist
    assert variables["batch_stats"]["backbone"]["bn7"]["mean"].shape == (4096,)


def test_contrast_train_mode_dropout(contrast_setup):
    model, variables, x = contrast_setup
    out1 = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    out2 = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    # dropout active -> different CAMs
    assert not np.allclose(np.asarray(out1[0]), np.asarray(out2[0]))


def test_seam_forward():
    model = build_model("seam")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    cam, cam_rv = model.apply(variables, x)
    assert cam.shape == (1, 64, 64, 21)
    assert cam_rv.shape == (1, 64, 64, 21)


def test_affinity_forward():
    model = build_model("affinity")
    x = jnp.asarray(np.random.RandomState(1).randn(1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    aff = model.apply(variables, x)
    # 8x8 feature map, radius min((8-1)//2, 5)=3
    from wseg_tpu.ops.pairs import radius_pair_indices, search_offsets

    ind_from, ind_to = radius_pair_indices(3, (8, 8))
    d = len(search_offsets(3))
    assert aff.shape == (1, d, ind_from.shape[0])
    # exp(-mean|diff|) in [0, 1] (0 via f32 underflow for distant features)
    assert (np.asarray(aff) >= 0).all() and (np.asarray(aff) <= 1).all()

    mat = model.apply(variables, x, to_dense=True)
    assert mat.shape == (64, 64)
    m = np.asarray(mat)
    np.testing.assert_allclose(m, m.T, rtol=1e-5)
    np.testing.assert_allclose(np.diag(m), 1.0, rtol=1e-6)
