"""Spectral-norm power iteration: convergence + reference-algorithm parity
(spec: reference benchmark_models/sagan/spectral.py:23-35)."""

import jax.numpy as jnp
import numpy as np

from fastfourierconvolution_tpu.ops import spectral_norm as sn


def test_power_iteration_converges_to_sigma_max():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(16, 64).astype(np.float32))
    u = jnp.asarray(sn._l2_normalize(jnp.asarray(rng.randn(16).astype(np.float32))))
    sigma, u, _ = sn.power_iteration(w, u, n_steps=50)
    true_sigma = np.linalg.svd(np.asarray(w), compute_uv=False)[0]
    np.testing.assert_allclose(float(sigma), true_sigma, rtol=1e-4)


def test_one_step_matches_explicit_reference_algorithm():
    # One power iteration, as the reference does per forward pass.
    rng = np.random.RandomState(1)
    w = rng.randn(8, 24).astype(np.float32)
    u0 = rng.randn(8).astype(np.float32)
    u0 = u0 / np.linalg.norm(u0)
    # explicit algorithm: v = norm(W^T u); u = norm(W v); sigma = u^T W v
    v_ref = w.T @ u0
    v_ref = v_ref / (np.linalg.norm(v_ref) + 1e-12)
    u_ref = w @ v_ref
    u_ref = u_ref / (np.linalg.norm(u_ref) + 1e-12)
    sigma_ref = u_ref @ w @ v_ref
    sigma, u_new, v = sn.power_iteration(jnp.asarray(w), jnp.asarray(u0), 1)
    np.testing.assert_allclose(float(sigma), sigma_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u_new), u_ref, atol=1e-5)


def test_normalized_weight_has_unit_spectral_norm_at_convergence():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))  # HWIO
    u = jnp.asarray(rng.randn(16).astype(np.float32))
    u = u / jnp.linalg.norm(u)
    for _ in range(30):
        w_norm, u = sn.spectral_normalize(w, u, update=True)
    mat = np.asarray(sn.matrix_view(jnp.asarray(w_norm)))
    np.testing.assert_allclose(
        np.linalg.svd(mat, compute_uv=False)[0], 1.0, rtol=1e-3
    )


def test_eval_mode_does_not_update_u():
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(4, 4, 3, 8).astype(np.float32))
    u = jnp.asarray(rng.randn(8).astype(np.float32))
    u = u / jnp.linalg.norm(u)
    _, u_after = sn.spectral_normalize(w, u, update=False)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u_after))


def test_sn_conv_transpose_uses_input_rows_matricization():
    """torch spectral_norm on ConvTranspose2d matricizes the (in, out,
    kh, kw) weight with rows = INPUT channels (dim=0; the SAGAN manual
    SpectralNorm's w.view(height, -1) likewise). After the power
    iteration converges, the layer must normalise by the largest
    singular value of that unfolding — not the (out, ...) one."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fastfourierconvolution_tpu.nn.layers import SNConvTranspose2d
    from fastfourierconvolution_tpu.ops.conv import conv_transpose2d

    cin, cout, k = 6, 5, 3
    layer = SNConvTranspose2d(cout, k, stride=2, padding=1,
                              output_padding=1, use_bias=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, cin))
    variables = layer.init({"params": jax.random.PRNGKey(1)}, x, True)
    w = np.asarray(variables["params"]["kernel"])  # HWIO

    # converge u with repeated train-mode applies
    vs = variables
    for _ in range(100):
        _, upd = layer.apply(vs, x, True, mutable=["spectral"])
        vs = {"params": vs["params"], **upd}

    out = layer.apply(vs, x, False)

    in_rows = w.transpose(2, 3, 0, 1).reshape(cin, -1)   # (in, out*k*k)
    out_rows = w.transpose(3, 0, 1, 2).reshape(cout, -1)  # (out, kh*kw*in)
    sigma_in = np.linalg.svd(in_rows, compute_uv=False)[0]
    sigma_out = np.linalg.svd(out_rows, compute_uv=False)[0]
    assert abs(sigma_in - sigma_out) > 1e-4, "unfoldings degenerate; reseed"

    expected = conv_transpose2d(
        jnp.asarray(x), jnp.asarray(w / sigma_in), stride=2, padding=1,
        output_padding=1,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=1e-4, rtol=1e-4
    )
