"""Fused FourierUnit: rfft2 -> channel mix -> BN -> ReLU -> irfft2.

The profiled train step is HBM-bandwidth-bound (~2.6 GB moved per step at
batch 64); the XLA composition of the FourierUnit materialises ~10
(B, H, Wf, 2C) intermediates in HBM per call. This module fuses the whole
unit so intermediates live in VMEM:

  * a pure-jnp reference implementation (``_spec_forward``) defining the
    exact semantics (identical to the FourierUnit flax module's math);
  * layout-safe Pallas TPU kernels (Kronecker spatial-DFT matrices, all
    strictly 2-D contractions, stats+apply kernel pairs over a
    sequential batch grid) for forward and backward;
  * a custom VJP whose backward **rematerialises** the spectral
    intermediates from x (matmuls are cheap, bytes are not) — residuals
    are just (x, params, batch stats);
  * dispatch: the XLA-fused jnp composition by default — measured
    faster than the Pallas kernels in-context on TPU v5e (table at the
    dispatch policy below); ``set_pallas_enabled(True)`` opts in.

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
#
# Layout-safe reformulation (round 2): every in-kernel contraction is a
# strict 2-D matmul, which Mosaic lowers directly onto the MXU without
# the "unsupported shape cast" the old 4-D einsum formulation hit.
#
#   * The separable rDFT over (H, W) is collapsed into one Kronecker
#     spatial matrix pair K = (Kr, Ki) of shape (UVf, HW) with
#     UVf = H*(W//2+1), HW = H*W:  f = K @ x_flat, x_flat: (HW, C).
#   * The inverse transform needs no extra matrices: with the ortho
#     factors of ops/fourier.py, Ir = K_r^T diag(c) and Ii = -K_i^T
#     diag(c) (c = half-spectrum duplication weights), so
#     y = K_r^T (c*r_re) + K_i^T (c*r_im); only K and K^T are resident.
#   * BatchNorm statistics span the whole batch, so the train-mode
#     forward runs as TWO pallas_calls over a (B,) grid: a stats kernel
#     accumulating sum(m)/sum(m^2) in VMEM scratch (the TPU grid is
#     sequential), then an apply kernel that recomputes the spectrum
#     and writes y. x is read twice from HBM; the (B, H, Wf, 2C)
#     intermediates never leave VMEM. The backward mirrors this.
#
# FLOP note: the Kronecker matmul does O((HW)^2 C) work vs the
# separable form's O(HW (H+W) C), but it is pure, perfectly-shaped MXU
# work on an otherwise bandwidth-bound op; the VMEM gate below limits
# it to maps where the K/K^T pair fits on-chip (<= 32x32).

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


@functools.lru_cache(maxsize=32)
def _kron_factors(h: int, w: int):
    """(Kr, Ki, cvec): Kronecker forward-rDFT matrices (UVf, HW) and the
    half-spectrum duplication weights (UVf, 1), float32 numpy."""
    import numpy as np

    ah, bh, cw, dw = fourier._forward_factors(h, w)
    wf = w // 2 + 1
    # K[(u,v),(p,q)] = (ah + i bh)[u,p] * (cw + i dw)[q,v]
    kr = (
        np.einsum("up,qv->uvpq", ah, cw) - np.einsum("up,qv->uvpq", bh, dw)
    ).reshape(h * wf, h * w).astype(np.float32)
    ki = (
        np.einsum("up,qv->uvpq", ah, dw) + np.einsum("up,qv->uvpq", bh, cw)
    ).reshape(h * wf, h * w).astype(np.float32)
    c = np.full((wf,), 2.0, np.float32)
    c[0] = 1.0
    if w % 2 == 0:
        c[-1] = 1.0
    cvec = np.broadcast_to(c[None, :], (h, wf)).reshape(h * wf, 1).copy()
    return kr, ki, cvec


def _kron_vmem_bytes(h: int, w: int, itemsize: int = 4) -> int:
    wf = w // 2 + 1
    # K + K^T pairs live simultaneously in the apply kernels
    return 4 * (h * wf) * (h * w) * itemsize


# Dispatch policy, decided by measurement (round 2, TPU v5e, bf16,
# batch 64, full jitted fgan32 train step / jitted eval generate):
#
#   train img/s   eval-gen img/s
#   XLA (jnp custom-VJP):      21457         49790
#   Pallas all maps <=32x32:   13107             -
#   Pallas small maps (<=8x8): 21260         25523
#
# XLA's automatic fusion of the DFT-as-matmul composition beats the
# hand-written kernels in-context even where isolated microbenchmarks
# favored Pallas (dispatch-latency artifacts of the tunnelled chip).
# The Pallas path therefore defaults OFF but stays fully tested
# (interpret-mode parity + gradient tests) and can be enabled
# programmatically for future hardware where the balance differs.

_PALLAS_ENABLED = False


def set_pallas_enabled(enabled: bool) -> None:
    """Opt the fused FourierUnit into the Pallas TPU kernels (measured
    slower than the XLA composition on v5e — see table above)."""
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = bool(enabled)


def _use_pallas(x) -> bool:
    if not _PALLAS_ENABLED:
        return False
    if jax.default_backend() != "tpu":
        return False
    b, h, w, c = x.shape
    if _kron_vmem_bytes(h, w) > VMEM_BUDGET_BYTES:
        return False
    # per-step working set: x block + spectrum copies
    wf = w // 2 + 1
    if 4 * (h * w * c + 6 * h * wf * 2 * c) > 2 * 1024 * 1024:
        return False
    return True


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def _prep_operands(x, kernel, scale, bias, mean, var):
    b, h, w, c = x.shape
    wf = w // 2 + 1
    dt = x.dtype
    kr, ki, cvec = _kron_factors(h, w)
    kr = jnp.asarray(kr, dt)
    ki = jnp.asarray(ki, dt)
    cvec = jnp.asarray(cvec, jnp.float32)
    x2 = x.reshape(b, h * w, c)
    row = lambda a: a.astype(jnp.float32).reshape(1, 2 * c)
    return (
        b, h, w, c, wf, dt, kr, ki, cvec, x2,
        kernel.astype(dt), row(scale), row(bias), row(mean), row(var),
    )


def _spectrum(x_b, kr, ki, kern, dt):
    """z = [Kr x; Ki x] (UVf, 2C) in dt; m = z @ kern in f32."""
    f_r = jnp.dot(kr, x_b, preferred_element_type=jnp.float32)
    f_i = jnp.dot(ki, x_b, preferred_element_type=jnp.float32)
    z = jnp.concatenate([f_r, f_i], axis=-1).astype(dt)
    m = jnp.dot(z, kern, preferred_element_type=jnp.float32)
    return z, m


def _pallas_forward(x, kernel, scale, bias, mean, var, train,
                    interpret: bool = False):
    pl, pltpu = _pl()
    (b, h, w, c, wf, dt, kr, ki, cvec, x2,
     kern, scale_r, bias_r, mean_r, var_r) = _prep_operands(
        x, kernel, scale, bias, mean, var
    )
    uvf, hw = h * wf, h * w
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    per_b = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    if train:
        def stats_kernel(x_ref, k_ref, kr_ref, ki_ref, s1_ref, s2_ref,
                         acc1, acc2):
            i = pl.program_id(0)
            _, m = _spectrum(x_ref[0], kr_ref[:], ki_ref[:], k_ref[:], dt)
            s1 = jnp.sum(m, axis=0, keepdims=True)
            s2 = jnp.sum(m * m, axis=0, keepdims=True)

            @pl.when(i == 0)
            def _():
                acc1[:] = s1
                acc2[:] = s2

            @pl.when(i > 0)
            def _():
                acc1[:] = acc1[:] + s1
                acc2[:] = acc2[:] + s2

            s1_ref[:] = acc1[:]
            s2_ref[:] = acc2[:]

        sum_m, sum_m2 = pl.pallas_call(
            stats_kernel,
            grid=(b,),
            in_specs=[
                per_b((hw, c)),
                const((2 * c, 2 * c)),
                const((uvf, hw)),
                const((uvf, hw)),
            ],
            out_specs=(const((1, 2 * c)), const((1, 2 * c))),
            out_shape=(
                jax.ShapeDtypeStruct((1, 2 * c), jnp.float32),
                jax.ShapeDtypeStruct((1, 2 * c), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, 2 * c), jnp.float32),
                pltpu.VMEM((1, 2 * c), jnp.float32),
            ],
            interpret=interpret,
        )(x2, kern, kr, ki)
        n = b * uvf
        bmean_r = sum_m / n
        bvar_r = sum_m2 / n - bmean_r * bmean_r
    else:
        bmean_r, bvar_r = mean_r, var_r

    def apply_kernel(x_ref, k_ref, s_ref, b_ref, m_ref, v_ref,
                     kr_ref, ki_ref, cv_ref, y_ref):
        _, m = _spectrum(x_ref[0], kr_ref[:], ki_ref[:], k_ref[:], dt)
        inv = jax.lax.rsqrt(v_ref[:] + EPS)
        pre = (m - m_ref[:]) * inv * s_ref[:] + b_ref[:]
        r = (jnp.maximum(pre, 0.0) * cv_ref[:]).astype(dt)
        # y = Kr^T (c r_re) + Ki^T (c r_im): contract over the UVf axis
        y = jax.lax.dot_general(
            kr_ref[:], r[:, :c], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            ki_ref[:], r[:, c:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_ref[0] = y.astype(dt)

    y = pl.pallas_call(
        apply_kernel,
        grid=(b,),
        in_specs=[
            per_b((hw, c)),
            const((2 * c, 2 * c)),
            const((1, 2 * c)),
            const((1, 2 * c)),
            const((1, 2 * c)),
            const((1, 2 * c)),
            const((uvf, hw)),
            const((uvf, hw)),
            const((uvf, 1)),
        ],
        out_specs=per_b((hw, c)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), dt),
        interpret=interpret,
    )(x2, kern, scale_r, bias_r, bmean_r, bvar_r, kr, ki, cvec)
    y = y.reshape(b, h, w, c)
    return y, bmean_r.reshape(2 * c), bvar_r.reshape(2 * c)


def _pallas_backward(x, kernel, scale, bias, bmean, bvar, gy, train,
                     interpret: bool = False):
    pl, pltpu = _pl()
    (b, h, w, c, wf, dt, kr, ki, cvec, x2,
     kern, scale_r, bias_r, mean_r, var_r) = _prep_operands(
        x, kernel, scale, bias, bmean, bvar
    )
    uvf, hw = h * wf, h * w
    gy2 = gy.reshape(b, hw, c)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    per_b = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    def recompute(x_ref, gy_ref, k_ref, kr_ref, ki_ref, cv_ref,
                  s_ref, b_ref, m_ref, v_ref):
        z, m = _spectrum(x_ref[0], kr_ref[:], ki_ref[:], k_ref[:], dt)
        inv = jax.lax.rsqrt(v_ref[:] + EPS)
        n_hat = (m - m_ref[:]) * inv
        pre = n_hat * s_ref[:] + b_ref[:]
        mask = (pre > 0).astype(jnp.float32)
        gy_b = gy_ref[0]
        # inverse-DFT adjoint: gr = c * [Kr gy ; Ki gy]
        gr_r = jnp.dot(kr_ref[:], gy_b, preferred_element_type=jnp.float32)
        gr_i = jnp.dot(ki_ref[:], gy_b, preferred_element_type=jnp.float32)
        gr = jnp.concatenate([gr_r, gr_i], axis=-1) * cv_ref[:]
        gpre = gr * mask
        return z, n_hat, inv, gpre

    in_specs_common = [
        per_b((hw, c)),
        per_b((hw, c)),
        const((2 * c, 2 * c)),
        const((uvf, hw)),
        const((uvf, hw)),
        const((uvf, 1)),
        const((1, 2 * c)),
        const((1, 2 * c)),
        const((1, 2 * c)),
        const((1, 2 * c)),
    ]

    def stats_kernel(x_ref, gy_ref, k_ref, kr_ref, ki_ref, cv_ref,
                     s_ref, b_ref, m_ref, v_ref,
                     gs_ref, gb_ref, gn_ref, gnn_ref,
                     a1, a2, a3, a4):
        i = pl.program_id(0)
        _, n_hat, _, gpre = recompute(
            x_ref, gy_ref, k_ref, kr_ref, ki_ref, cv_ref,
            s_ref, b_ref, m_ref, v_ref,
        )
        gn = gpre * s_ref[:]
        rows = [
            jnp.sum(gpre * n_hat, axis=0, keepdims=True),
            jnp.sum(gpre, axis=0, keepdims=True),
            jnp.sum(gn, axis=0, keepdims=True),
            jnp.sum(gn * n_hat, axis=0, keepdims=True),
        ]
        for acc, row in zip((a1, a2, a3, a4), rows):
            @pl.when(i == 0)
            def _(acc=acc, row=row):
                acc[:] = row

            @pl.when(i > 0)
            def _(acc=acc, row=row):
                acc[:] = acc[:] + row
        gs_ref[:] = a1[:]
        gb_ref[:] = a2[:]
        gn_ref[:] = a3[:]
        gnn_ref[:] = a4[:]

    gs, gb, sum_gn, sum_gnn = pl.pallas_call(
        stats_kernel,
        grid=(b,),
        in_specs=in_specs_common,
        out_specs=tuple(const((1, 2 * c)) for _ in range(4)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((1, 2 * c), jnp.float32) for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((1, 2 * c), jnp.float32) for _ in range(4)
        ],
        interpret=interpret,
    )(x2, gy2, kern, kr, ki, cvec, scale_r, bias_r, mean_r, var_r)

    n = b * uvf
    mean_gn = sum_gn / n
    mean_gnn = sum_gnn / n

    def apply_kernel(x_ref, gy_ref, k_ref, kr_ref, ki_ref, cv_ref,
                     s_ref, b_ref, m_ref, v_ref, mgn_ref, mgnn_ref,
                     gx_ref, gk_ref, gk_acc):
        i = pl.program_id(0)
        z, n_hat, inv, gpre = recompute(
            x_ref, gy_ref, k_ref, kr_ref, ki_ref, cv_ref,
            s_ref, b_ref, m_ref, v_ref,
        )
        gn = gpre * s_ref[:]
        if train:
            gm = inv * (gn - mgn_ref[:] - n_hat * mgnn_ref[:])
        else:
            gm = gn * inv
        gm_dt = gm.astype(dt)
        # gkernel += z^T gm  (contract UVf)
        gk_b = jax.lax.dot_general(
            z, gm_dt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == 0)
        def _():
            gk_acc[:] = gk_b

        @pl.when(i > 0)
        def _():
            gk_acc[:] = gk_acc[:] + gk_b

        gk_ref[:] = gk_acc[:]
        # gz = gm @ kern^T  (contract output channel)
        gz = jax.lax.dot_general(
            gm_dt, k_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        # forward adjoint: gx = Kr^T gz_re + Ki^T gz_im
        gx = jax.lax.dot_general(
            kr_ref[:], gz[:, :c], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            ki_ref[:], gz[:, c:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gx_ref[0] = gx.astype(dt)

    gx, gk = pl.pallas_call(
        apply_kernel,
        grid=(b,),
        in_specs=in_specs_common
        + [const((1, 2 * c)), const((1, 2 * c))],
        out_specs=(per_b((hw, c)), const((2 * c, 2 * c))),
        out_shape=(
            jax.ShapeDtypeStruct((b, hw, c), dt),
            jax.ShapeDtypeStruct((2 * c, 2 * c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2 * c, 2 * c), jnp.float32)],
        interpret=interpret,
    )(x2, gy2, kern, kr, ki, cvec, scale_r, bias_r, mean_r, var_r,
      mean_gn, mean_gnn)

    zeros = jnp.zeros_like(bmean)
    return (
        gx.reshape(b, h, w, c),
        gk.astype(kernel.dtype),
        gs.reshape(2 * c),
        gb.reshape(2 * c),
        zeros,
        zeros,
    )

