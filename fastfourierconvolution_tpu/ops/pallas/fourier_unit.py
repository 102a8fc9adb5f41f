"""Fused FourierUnit: rfft2 -> channel mix -> BN -> ReLU -> irfft2.

The profiled train step is HBM-bandwidth-bound (~2.6 GB moved per step at
batch 64); the XLA composition of the FourierUnit materialises ~10
(B, H, Wf, 2C) intermediates in HBM per call. This module fuses the whole
unit so intermediates live in VMEM:

  * a pure-jnp reference implementation (``_spec_forward``) defining the
    exact semantics (identical to the FourierUnit flax module's math);
  * a single-program Pallas TPU kernel for the forward pass;
  * a custom VJP whose backward **rematerialises** the spectral
    intermediates from x (matmuls are cheap, bytes are not), again as one
    Pallas kernel on TPU — residuals are just (x, params, batch stats);
  * automatic dispatch: Pallas on TPU when the working set fits VMEM,
    jnp composition elsewhere (CPU tests, oversized configs).

Batch-norm semantics match flax.linen.BatchNorm (biased variance, eps
1e-5): train mode normalises with batch statistics computed over
(B, H, Wf) per 2C channel and returns them for the running-average
update; eval mode uses the provided running stats.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import fourier

EPS = 1e-5


def _factors(h: int, w: int, dtype):
    ah, bh, cw, dw = (
        jnp.asarray(m).astype(dtype) for m in fourier._forward_factors(h, w)
    )
    eh_r, eh_i, fw_r, fw_i = (
        jnp.asarray(m).astype(dtype) for m in fourier._inverse_factors(h, w)
    )
    return ah, bh, cw, dw, eh_r, eh_i, fw_r, fw_i


def _dft_forward(x, ah, bh, cw, dw, prec):
    ein = functools.partial(jnp.einsum, precision=prec)
    t_r = ein("nhwc,wv->nhvc", x, cw)
    t_i = ein("nhwc,wv->nhvc", x, dw)
    f_r = ein("uh,nhvc->nuvc", ah, t_r) - ein("uh,nhvc->nuvc", bh, t_i)
    f_i = ein("uh,nhvc->nuvc", ah, t_i) + ein("uh,nhvc->nuvc", bh, t_r)
    return f_r, f_i


def _dft_inverse(f_r, f_i, eh_r, eh_i, fw_r, fw_i, prec):
    ein = functools.partial(jnp.einsum, precision=prec)
    p_r = ein("pu,nuvc->npvc", eh_r, f_r) - ein("pu,nuvc->npvc", eh_i, f_i)
    p_i = ein("pu,nuvc->npvc", eh_r, f_i) + ein("pu,nuvc->npvc", eh_i, f_r)
    return ein("npvc,wv->npwc", p_r, fw_r) - ein("npvc,wv->npwc", p_i, fw_i)


def _dft_inverse_adjoint(g, eh_r, eh_i, fw_r, fw_i, prec):
    """Adjoint (transpose) of ``_dft_inverse`` as a real-linear map."""
    ein = functools.partial(jnp.einsum, precision=prec)
    gp_r = ein("npwc,wv->npvc", g, fw_r)
    gp_i = -ein("npwc,wv->npvc", g, fw_i)
    gf_r = ein("pu,npvc->nuvc", eh_r, gp_r) + ein("pu,npvc->nuvc", eh_i, gp_i)
    gf_i = -ein("pu,npvc->nuvc", eh_i, gp_r) + ein("pu,npvc->nuvc", eh_r, gp_i)
    return gf_r, gf_i


def _dft_forward_adjoint(g_r, g_i, ah, bh, cw, dw, prec):
    """Adjoint of ``_dft_forward``."""
    ein = functools.partial(jnp.einsum, precision=prec)
    gt_r = ein("uh,nuvc->nhvc", ah, g_r) + ein("uh,nuvc->nhvc", bh, g_i)
    gt_i = -ein("uh,nuvc->nhvc", bh, g_r) + ein("uh,nuvc->nhvc", ah, g_i)
    return ein("nhvc,wv->nhwc", gt_r, cw) + ein("nhvc,wv->nhwc", gt_i, dw)


def _spec_forward(
    x, kernel, scale, bias, mean, var, train: bool, prec=None
):
    """Reference semantics; returns (y, batch_mean, batch_var, extras).

    extras = (z, n_hat, relu_mask) are NOT returned by the public op —
    only used internally by the jnp backward path.
    """
    c = x.shape[-1]
    h, w = x.shape[1], x.shape[2]
    dt = x.dtype
    ah, bh, cw, dw, eh_r, eh_i, fw_r, fw_i = _factors(h, w, dt)
    prec = prec or jax.lax.Precision.DEFAULT

    f_r, f_i = _dft_forward(x, ah, bh, cw, dw, prec)
    z = jnp.concatenate([f_r, f_i], axis=-1)  # (B, H, Wf, 2C)
    m = jnp.einsum("bhvc,cd->bhvd", z, kernel, precision=prec)

    mf = m.astype(jnp.float32)
    if train:
        bmean = jnp.mean(mf, axis=(0, 1, 2))
        bvar = jnp.mean(mf**2, axis=(0, 1, 2)) - bmean**2
    else:
        bmean = mean.astype(jnp.float32)
        bvar = var.astype(jnp.float32)
    inv = jax.lax.rsqrt(bvar + EPS)
    n_hat = (mf - bmean) * inv
    pre = n_hat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    r = jnp.maximum(pre, 0.0).astype(dt)

    y = _dft_inverse(
        r[..., :c], r[..., c:], eh_r, eh_i, fw_r, fw_i, prec
    )
    if train:
        return y, bmean, bvar
    return y, bmean, bvar


# --- custom VJP (jnp path; Pallas path plugs into the same structure) -------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fourier_unit_fused(x, kernel, scale, bias, mean, var, train: bool):
    """y, batch_mean, batch_var = fused FourierUnit.

    ``kernel``: (2C, 2C); ``scale/bias/mean/var``: (2C,) f32. In eval
    mode batch_mean/var simply echo the running stats.
    """
    return _dispatch_forward(x, kernel, scale, bias, mean, var, train)


def _dispatch_forward(x, kernel, scale, bias, mean, var, train):
    if _use_pallas(x):
        return _pallas_forward(x, kernel, scale, bias, mean, var, train)
    return _spec_forward(x, kernel, scale, bias, mean, var, train)


def _fwd(x, kernel, scale, bias, mean, var, train):
    y, bmean, bvar = _dispatch_forward(
        x, kernel, scale, bias, mean, var, train
    )
    residuals = (x, kernel, scale, bias, bmean, bvar)
    return (y, bmean, bvar), residuals


def _bwd(train, residuals, cotangents):
    gy, _gm, _gv = cotangents  # stats cotangents are not propagated
    x, kernel, scale, bias, bmean, bvar = residuals
    if _use_pallas(x):
        return _pallas_backward(
            x, kernel, scale, bias, bmean, bvar, gy, train
        )
    return _jnp_backward(x, kernel, scale, bias, bmean, bvar, gy, train)


def _jnp_backward(x, kernel, scale, bias, bmean, bvar, gy, train):
    """Rematerialising backward: recompute z, m, n_hat from x."""
    c = x.shape[-1]
    h, w = x.shape[1], x.shape[2]
    dt = x.dtype
    ah, bh, cw, dw, eh_r, eh_i, fw_r, fw_i = _factors(h, w, dt)
    prec = jax.lax.Precision.DEFAULT

    f_r, f_i = _dft_forward(x, ah, bh, cw, dw, prec)
    z = jnp.concatenate([f_r, f_i], axis=-1)
    m = jnp.einsum("bhvc,cd->bhvd", z, kernel, precision=prec).astype(
        jnp.float32
    )
    inv = jax.lax.rsqrt(bvar + EPS)
    n_hat = (m - bmean) * inv
    pre = n_hat * scale + bias
    mask = (pre > 0).astype(jnp.float32)

    # cotangent of r (post-relu, split back to re/im)
    gr_r, gr_i = _dft_inverse_adjoint(
        gy, eh_r, eh_i, fw_r, fw_i, prec
    )
    gr = jnp.concatenate([gr_r, gr_i], axis=-1).astype(jnp.float32)
    gpre = gr * mask
    gscale = jnp.sum(gpre * n_hat, axis=(0, 1, 2))
    gbias = jnp.sum(gpre, axis=(0, 1, 2))
    gn = gpre * scale
    if train:
        # BatchNorm backward through batch statistics
        nelem = x.shape[0] * x.shape[1] * (x.shape[2] // 2 + 1)
        gm = (
            inv
            * (
                gn
                - jnp.mean(gn, axis=(0, 1, 2))
                - n_hat * jnp.mean(gn * n_hat, axis=(0, 1, 2))
            )
        )
    else:
        gm = gn * inv
    gm = gm.astype(dt)
    gkernel = jnp.einsum(
        "bhvc,bhvd->cd", z, gm, precision=jax.lax.Precision.HIGHEST
    ).astype(kernel.dtype)
    gz = jnp.einsum("bhvd,cd->bhvc", gm, kernel, precision=prec)
    gx = _dft_forward_adjoint(
        gz[..., :c], gz[..., c:], ah, bh, cw, dw, prec
    )
    zeros = jnp.zeros_like(bmean)
    return gx, gkernel, gscale, gbias, zeros, zeros


fourier_unit_fused.defvjp(_fwd, _bwd)


# --- Pallas TPU kernels -----------------------------------------------------

VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _estimate_vmem(x) -> int:
    b, h, w, c = x.shape
    wf = w // 2 + 1
    itemsize = x.dtype.itemsize
    # x + spectral (2C at Wf) roughly 4 copies live at once
    return itemsize * (b * h * w * c + 4 * b * h * wf * 2 * c)


def _use_pallas(x) -> bool:
    # The single-program Mosaic kernels currently trip
    # "infer-vector-layout: unsupported shape cast" on the 4-D einsum
    # lowering (reshape of middle dims); until the kernels are
    # reformulated with layout-safe 2-D contractions they stay opt-in.
    import os

    if os.environ.get("FFC_TPU_ENABLE_PALLAS", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if _estimate_vmem(x) > VMEM_BUDGET_BYTES:
        return False
    return True


def _pallas_forward(x, kernel, scale, bias, mean, var, train):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    wf = w // 2 + 1
    dt = x.dtype
    ah, bh, cw, dw, eh_r, eh_i, fw_r, fw_i = _factors(h, w, dt)
    prec = jax.lax.Precision.DEFAULT

    def kernel_fn(
        x_ref, k_ref, s_ref, b_ref, m_ref, v_ref,
        ah_r, bh_r, cw_r, dw_r, ehr_r, ehi_r, fwr_r, fwi_r,
        y_ref, bm_ref, bv_ref,
    ):
        xv = x_ref[:]
        f_r, f_i = _dft_forward(xv, ah_r[:], bh_r[:], cw_r[:], dw_r[:], prec)
        z = jnp.concatenate([f_r, f_i], axis=-1)
        m = jnp.einsum("bhvc,cd->bhvd", z, k_ref[:], precision=prec)
        mf = m.astype(jnp.float32)
        if train:
            bmean = jnp.mean(mf, axis=(0, 1, 2))
            bvar = jnp.mean(mf * mf, axis=(0, 1, 2)) - bmean * bmean
        else:
            bmean = m_ref[:].astype(jnp.float32)
            bvar = v_ref[:].astype(jnp.float32)
        inv = jax.lax.rsqrt(bvar + EPS)
        pre = (mf - bmean) * inv * s_ref[:].astype(jnp.float32) + b_ref[
            :
        ].astype(jnp.float32)
        r = jnp.maximum(pre, 0.0).astype(dt)
        y = _dft_inverse(
            r[..., :c], r[..., c:], ehr_r[:], ehi_r[:], fwr_r[:], fwi_r[:],
            prec,
        )
        y_ref[:] = y
        bm_ref[:] = bmean
        bv_ref[:] = bvar

    y, bmean, bvar = pl.pallas_call(
        kernel_fn,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), dt),
            jax.ShapeDtypeStruct((2 * c,), jnp.float32),
            jax.ShapeDtypeStruct((2 * c,), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(x, kernel, scale, bias, mean, var,
      ah, bh, cw, dw, eh_r, eh_i, fw_r, fw_i)
    return y, bmean, bvar


def _pallas_backward(x, kernel, scale, bias, bmean, bvar, gy, train):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    dt = x.dtype
    ah, bh, cw, dw, eh_r, eh_i, fw_r, fw_i = _factors(h, w, dt)
    prec = jax.lax.Precision.DEFAULT

    def kernel_fn(
        x_ref, k_ref, s_ref, bias_ref, bm_ref, bv_ref, gy_ref,
        ah_r, bh_r, cw_r, dw_r, ehr_r, ehi_r, fwr_r, fwi_r,
        gx_ref, gk_ref, gs_ref, gb_ref,
    ):
        xv = x_ref[:]
        ah_v, bh_v, cw_v, dw_v = ah_r[:], bh_r[:], cw_r[:], dw_r[:]
        eh_rv, eh_iv, fw_rv, fw_iv = ehr_r[:], ehi_r[:], fwr_r[:], fwi_r[:]
        f_r, f_i = _dft_forward(xv, ah_v, bh_v, cw_v, dw_v, prec)
        z = jnp.concatenate([f_r, f_i], axis=-1)
        m = jnp.einsum("bhvc,cd->bhvd", z, k_ref[:], precision=prec).astype(
            jnp.float32
        )
        inv = jax.lax.rsqrt(bv_ref[:] + EPS)
        n_hat = (m - bm_ref[:]) * inv
        scale_f = s_ref[:].astype(jnp.float32)
        pre = n_hat * scale_f + bias_ref[:].astype(jnp.float32)
        mask = (pre > 0).astype(jnp.float32)
        gr_r, gr_i = _dft_inverse_adjoint(
            gy_ref[:], eh_rv, eh_iv, fw_rv, fw_iv, prec
        )
        gr = jnp.concatenate([gr_r, gr_i], axis=-1).astype(jnp.float32)
        gpre = gr * mask
        gs_ref[:] = jnp.sum(gpre * n_hat, axis=(0, 1, 2))
        gb_ref[:] = jnp.sum(gpre, axis=(0, 1, 2))
        gn = gpre * scale_f
        if train:
            gm = inv * (
                gn
                - jnp.mean(gn, axis=(0, 1, 2))
                - n_hat * jnp.mean(gn * n_hat, axis=(0, 1, 2))
            )
        else:
            gm = gn * inv
        gm = gm.astype(dt)
        gk_ref[:] = jnp.einsum(
            "bhvc,bhvd->cd", z, gm, precision=jax.lax.Precision.HIGHEST
        ).astype(jnp.float32)
        gz = jnp.einsum("bhvd,cd->bhvc", gm, k_ref[:], precision=prec)
        gx_ref[:] = _dft_forward_adjoint(
            gz[..., :c], gz[..., c:], ah_v, bh_v, cw_v, dw_v, prec
        )

    gx, gk, gs, gb = pl.pallas_call(
        kernel_fn,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), dt),
            jax.ShapeDtypeStruct((2 * c, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((2 * c,), jnp.float32),
            jax.ShapeDtypeStruct((2 * c,), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 15,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)
        ),
    )(x, kernel, scale, bias, bmean, bvar, gy,
      ah, bh, cw, dw, eh_r, eh_i, fw_r, fw_i)
    zeros = jnp.zeros_like(bmean)
    return gx, gk.astype(kernel.dtype), gs, gb, zeros, zeros

