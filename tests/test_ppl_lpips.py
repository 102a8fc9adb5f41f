"""PPL / LPIPS / VGG16 / interpolation tests (random-init weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastfourierconvolution_tpu.eval import (
    batch_lerp,
    batch_slerp_any,
    batch_slerp_unit,
    calculate_ppl,
)
from fastfourierconvolution_tpu.eval.lpips import (
    VGG16,
    _adaptive_avg_matrix,
    create_lpips,
    resize_bilinear_area_or_bilinear,
)
from fastfourierconvolution_tpu.eval.pipeline import GenerativeModel


def test_lerp_and_slerp():
    a = jnp.asarray([[1.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0]])
    np.testing.assert_allclose(batch_lerp(a, b, 0.5), [[0.5, 0.5]])
    mid = batch_slerp_unit(a, b, 0.5)
    np.testing.assert_allclose(
        np.asarray(mid), [[np.sqrt(0.5), np.sqrt(0.5)]], atol=1e-6
    )
    # slerp_any at t=0/1 returns endpoints
    s0 = batch_slerp_any(a, b, 0.0)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(a), atol=1e-6)
    # collinear vectors fall back to lerp
    c = batch_slerp_any(a, a * 2.0, 0.5)
    np.testing.assert_allclose(np.asarray(c), [[1.5, 0.0]], atol=1e-5)


def test_area_resize_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 16, 16).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), (7, 7), mode="area"
    ).numpy()
    got = resize_bilinear_area_or_bilinear(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), (7, 7)
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-5
    )


@pytest.mark.slow
def test_lpips_zero_for_identical_and_positive_for_different():
    module, variables = create_lpips(resize=16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 255)
    d_same = module.apply(variables, x, x)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-8)
    y = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 255)
    d_diff = module.apply(variables, x, y)
    assert (np.asarray(d_diff) > 0).all()


def test_vgg16_extractor_shapes():
    m = VGG16(features_list=("fc2", "fc2_relu"))
    x = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out["fc2"].shape == (2, 4096)
    assert out["fc2_relu"].shape == (2, 4096)


def test_ppl_protocol_runs():
    # a smooth generator: images vary slowly with z -> small finite PPL
    def apply(z):
        v = jnp.tanh(z[:, :3])[:, None, None, :]
        img = jnp.broadcast_to(v, (z.shape[0], 16, 16, 3))
        return ((img * 0.5 + 0.5) * 255).astype(jnp.uint8)

    gm = GenerativeModel(apply=apply, z_size=8)
    out = calculate_ppl(
        gm, num_samples=64, batch_size=32, epsilon=1e-2,
        similarity_resize=None,
    )
    assert np.isfinite(out["perceptual_path_length_mean"])
    assert out["perceptual_path_length_mean"] >= 0
