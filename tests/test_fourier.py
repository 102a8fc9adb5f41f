"""Numerics tests for the orthonormal rFFT2 ops.

The DFT-as-matmul path must agree with jnp.fft (itself cross-checked
against numpy) and with torch.fft's behavioral contract from the
reference (rfftn/irfftn with norm="ortho",
reference layers/ffc/fourier_unity.py:38,56) — including the implicit
hermitian projection irfft applies to arbitrary (post-conv) spectra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastfourierconvolution_tpu.ops import fourier


@pytest.mark.parametrize("h,w", [(8, 8), (16, 32), (32, 32), (48, 48), (7, 10)])
def test_rfft2_dft_matches_fft(h, w):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
    r1, i1 = fourier.rfft2_ortho(x, impl="fft")
    r2, i2 = fourier.rfft2_ortho(x, impl="dft")
    np.testing.assert_allclose(r1, r2, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(i1, i2, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("h,w", [(8, 8), (16, 32), (32, 32), (7, 10)])
def test_irfft2_dft_matches_fft_on_arbitrary_spectrum(h, w):
    # Arbitrary (non-hermitian) spectra — exactly what comes out of the
    # FourierUnit's channel mix before the inverse transform.
    rng = np.random.RandomState(1)
    wf = w // 2 + 1
    fr = jnp.asarray(rng.randn(2, h, wf, 3).astype(np.float32))
    fi = jnp.asarray(rng.randn(2, h, wf, 3).astype(np.float32))
    x1 = fourier.irfft2_ortho(fr, fi, s=(h, w), impl="fft")
    x2 = fourier.irfft2_ortho(fr, fi, s=(h, w), impl="dft")
    np.testing.assert_allclose(x1, x2, atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("impl", ["fft", "dft"])
@pytest.mark.parametrize("h,w", [(16, 16), (32, 32)])
def test_roundtrip_identity(impl, h, w):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, h, w, 8).astype(np.float32))
    fr, fi = fourier.rfft2_ortho(x, impl=impl)
    y = fourier.irfft2_ortho(fr, fi, s=(h, w), impl=impl)
    np.testing.assert_allclose(x, y, atol=3e-5, rtol=1e-4)


def test_ortho_energy_preservation():
    # Parseval: orthonormal transform preserves energy (counting the
    # implicit hermitian half twice, except DC/Nyquist columns).
    rng = np.random.RandomState(3)
    h = w = 16
    x = jnp.asarray(rng.randn(1, h, w, 1).astype(np.float32))
    fr, fi = fourier.rfft2_ortho(x, impl="dft")
    mag2 = np.asarray(fr**2 + fi**2)[0, :, :, 0]
    weights = np.full(w // 2 + 1, 2.0)
    weights[0] = 1.0
    weights[-1] = 1.0
    spec_energy = (mag2 * weights[None, :]).sum()
    np.testing.assert_allclose(spec_energy, float((x**2).sum()), rtol=1e-4)


def test_matches_torch_reference_contract():
    # Golden check against torch.fft (the reference's backend).
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(4)
    x = rng.randn(2, 3, 12, 16).astype(np.float32)  # torch is NCHW
    t = torch.fft.rfftn(torch.from_numpy(x), dim=(-2, -1), norm="ortho")
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    fr, fi = fourier.rfft2_ortho(x_nhwc, impl="dft")
    np.testing.assert_allclose(
        np.transpose(np.asarray(fr), (0, 3, 1, 2)), t.real.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(fi), (0, 3, 1, 2)), t.imag.numpy(), atol=2e-5
    )
    # inverse on an arbitrary spectrum
    sr = rng.randn(2, 3, 12, 9).astype(np.float32)
    si = rng.randn(2, 3, 12, 9).astype(np.float32)
    t_inv = torch.fft.irfftn(
        torch.complex(torch.from_numpy(sr), torch.from_numpy(si)),
        s=(12, 16),
        dim=(-2, -1),
        norm="ortho",
    ).numpy()
    y = fourier.irfft2_ortho(
        jnp.asarray(np.transpose(sr, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(si, (0, 2, 3, 1))),
        s=(12, 16),
        impl="dft",
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), t_inv, atol=3e-5
    )


def test_spectral_channel_mix_is_1x1_conv():
    rng = np.random.RandomState(5)
    c = 4
    fr = jnp.asarray(rng.randn(2, 8, 5, c).astype(np.float32))
    fi = jnp.asarray(rng.randn(2, 8, 5, c).astype(np.float32))
    k = jnp.asarray(rng.randn(2 * c, 2 * c).astype(np.float32))
    mr, mi = fourier.spectral_channel_mix(fr, fi, k)
    z = np.concatenate([fr, fi], axis=-1)
    expected = z @ np.asarray(k)
    np.testing.assert_allclose(mr, expected[..., :c], atol=1e-5)
    np.testing.assert_allclose(mi, expected[..., c:], atol=1e-5)
