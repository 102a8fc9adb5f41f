"""Fused FourierUnit: rfft2 -> channel mix -> BN -> ReLU -> irfft2.

This module fuses the whole unit so intermediates live in VMEM. The
premise — that the XLA composition wastes HBM round-trips on the
(B, H, Wf, 2C) intermediates — was DISPROVEN by trace-based memory
accounting (round 2, tools/trace_hbm.py; see BASELINE.md "trace-based
roofline"): at 32px XLA keeps the activation working set in VMEM (S(1)
buffers, true HBM traffic 0.22 GB/step = 14% of bandwidth incl. DMA),
and at 128px the spectral ops account for only ~11% of the
28.6 GB/step HBM traffic at 40% overall utilisation. All three kernel
families below were measured slower than
the XLA composition in-context; they remain as fully-tested opt-ins.
The module provides:

  * a pure-jnp reference implementation (``_spec_forward``) defining the
    exact semantics (identical to the FourierUnit flax module's math);
  * two layout-safe Pallas TPU kernel families for forward and
    backward — "kron" (Kronecker spatial-DFT matrices, strictly 2-D
    contractions, small maps only) and "sep" (separable factor
    matmuls with f32 in-VMEM relayouts and a sublane-padded
    half-spectrum, O(HW(H+W)C) FLOPs) — both as stats+apply kernel
    pairs over a sequential batch grid;
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
import os
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
# batch 64, full jitted train steps / jitted eval generate):
#
#   fgan32 train   fgan128 train   eval-gen
#   XLA (jnp custom-VJP):      21443 img/s    728 img/s     49790
#   Pallas kron <=32x32:       13107              -             -
#   Pallas kron <=8x8 only:    21260              -         25523
#   Pallas sep  (per-item):    10956              -             -
#   Pallas sep2 (lane-dense):      -            636             -
#
# XLA's automatic fusion of the DFT-as-matmul composition beats every
# hand-written family in-context, and the trace-based memory
# accounting (tools/trace_hbm.py; BASELINE.md "trace-based roofline")
# explains why the fusion premise cannot pay on this hardware: at 32px
# the whole activation working set is VMEM-resident (S(1) buffers; HBM
# traffic 0.22 GB/step = 14% of bandwidth incl. DMA), so the "saved"
# intermediate round-trips were VMEM<->VMEM and near-free, while the
# per-item Pallas grids add real latency (sep: tiny latency-bound
# matmuls) or VPU relayout work (sep2: ~6 map-size f32 transposes per
# item). At 128px the spectral (Wf=65) ops are 5.4% of leaf device
# time and 10.9% of the 27 GB/step HBM traffic at 40% utilisation —
# an upper bound of a few percent even for a perfect fusion, below
# the kernels' own overheads. The Pallas path therefore defaults OFF
# but stays fully tested (interpret-mode parity + gradient tests and
# a real-hardware smoke in bench.py) for future hardware where the
# balance differs.

# env opt-in mirrors ops/pallas/bn_act.py's FFC_TPU_FUSED_BN so
# subprocess A/B harnesses (tools/serve_pallas_ab.py) can flip the
# dispatch without code edits; default stays OFF per the table above
_PALLAS_ENABLED = os.environ.get("FFC_TPU_PALLAS", "0") not in (
    "0", "false", ""
)
# kernel family: "sep" = separable-DFT (factor matmuls + in-VMEM
# relayouts, O(HW(H+W)C) FLOPs, fits every ladder resolution);
# "kron" = Kronecker spatial matrices (small maps only)
_PALLAS_MODE = os.environ.get("FFC_TPU_PALLAS_MODE", "sep")
assert _PALLAS_MODE in ("sep", "sep2", "kron"), _PALLAS_MODE


def set_pallas_enabled(enabled: bool) -> None:
    """Opt the fused FourierUnit into the Pallas TPU kernels (measured
    slower than the XLA composition on v5e — see table above)."""
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = bool(enabled)


def set_pallas_mode(mode: str) -> None:
    assert mode in ("sep", "sep2", "kron"), mode
    global _PALLAS_MODE
    _PALLAS_MODE = mode


def _use_pallas(x) -> bool:
    if not _PALLAS_ENABLED:
        return False
    if jax.default_backend() != "tpu":
        return False
    b, h, w, c = x.shape
    if _PALLAS_MODE == "sep2":
        return _sep2_fits(h, w, c)
    if _PALLAS_MODE == "sep":
        return (
            _sep_legal(h, w, c)
            and _sep_vmem_bytes(h, w, c) <= VMEM_BUDGET_BYTES
        )
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


# --- separable-DFT kernels (round 2, VERDICT item 3) ------------------------
#
# The Kronecker kernels above do O((HW)^2 C) MACs and need the (UVf, HW)
# matrix pair in VMEM, which caps them at 32x32 maps. This family keeps
# the DFT separable — only the four (H, H)/(W, Wf) factor matrices are
# resident — at O(HW(H+W)C) MACs, so it admits much larger maps. The
# price is per-stage layout changes ((H,C,W) <-> (H,Wf,C) transposes/
# reshapes), which stay in VMEM and never touch HBM; per batch item the
# kernel reads x once and writes y once (train-mode stats add one extra
# read of x, mirroring the Kronecker two-pass structure).
#
# Matrix identities used (see ops/fourier.py factors): with the ortho
# factors, the inverse needs no extra matrices — eh_r = ah^T,
# eh_i = -bh^T, fw_r = c*cw, fw_i = -c*dw — so forward, inverse and both
# adjoints all run off (ah, bh, cw, dw) plus the half-spectrum
# duplication weights c.
#
# Mosaic layout legality (probed empirically on TPU v5e): a jnp reshape
# inside a kernel that merges sublane dims into the row dim of a
# transposed (non-canonical-layout) array is only supported when the
# merged minor-leading dim is a multiple of the sublane tile (8 for
# f32). The kernels therefore (a) run ALL in-kernel math in f32 — x/y
# are cast at the VMEM boundary, HBM traffic stays in the model dtype,
# and the DFT/mix matmuls are tiny relative to the bytes this fusion
# saves — and (b) zero-pad the half-spectrum axis Wf to a multiple of 8
# by appending zero columns to the W-factor matrices cw/dw and zeros to
# the duplication weights. The padding is annihilated in every
# direction: forward spectrum rows at padded v are exactly zero (zero
# factor columns), the inverse multiplies by the zero duplication
# weights before contracting, and both adjoints contract padded rows
# against the same zero factor columns. BatchNorm statistics stay exact
# because padded rows contribute 0 to sum(m) and sum(m^2) while the
# divisor uses the REAL element count b*h*wf. The remaining legality
# conditions H % 8 == 0 and C % 8 == 0 (merged minor-leading dims of
# the (C,Wf_p,H)- and (Wf_p,C,H)-style relayouts) are enforced by
# _sep_legal — every FFC-ladder FourierUnit shape satisfies them.

_SUBLANE = 8


def _pad8(n: int) -> int:
    return -(-n // _SUBLANE) * _SUBLANE


def _sep_legal(h: int, w: int, c: int) -> bool:
    return h % _SUBLANE == 0 and c % _SUBLANE == 0


def _sep_vmem_bytes(h: int, w: int, c: int) -> int:
    """Estimated per-grid-step VMEM working set of the separable apply
    kernel (f32 internal math): x + y blocks + ~6 live
    (H*Wf_p, 2C)-class intermediates + factor matrices. Mosaic pads
    lanes to multiples of 128."""
    wf = w // 2 + 1
    wfp = _pad8(wf)
    lane = lambda n: -(-n // 128) * 128
    maps = 2 * h * lane(w) * max(c, _SUBLANE) * 4
    mids = 6 * h * wfp * lane(2 * c) * 4
    factors = 2 * h * lane(h) * 4 + 2 * w * lane(wfp) * 4
    return maps + mids + factors


@functools.lru_cache(maxsize=32)
def _sep_np_factors(h: int, w: int):
    """Forward factors with the W-factor pair zero-padded on the Wf
    axis to a sublane multiple (see layout-legality note above)."""
    import numpy as np

    ah, bh, cw, dw = fourier._forward_factors(h, w)
    wf = w // 2 + 1
    wfp = _pad8(wf)
    cw = np.pad(cw, ((0, 0), (0, wfp - wf)))
    dw = np.pad(dw, ((0, 0), (0, wfp - wf)))
    c = np.zeros((wfp,), np.float32)
    c[:wf] = 2.0
    c[0] = 1.0
    if w % 2 == 0:
        c[wf - 1] = 1.0
    return ah, bh, cw, dw, c


def _dT(a, b):
    """a^T @ b (contract dim 0 of both)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dNT(a, b):
    """a @ b^T (contract dim 1 of both)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _cv_rows(a, h, wfp, c):
    """((c,v)-rows, u-lanes) (C*Wf_p, U) -> (U*Wf_p, C). All f32."""
    a3 = a.reshape(c, wfp, h)
    a3 = jnp.transpose(a3, (2, 0, 1))  # (U, C, Wf_p)
    a3 = jnp.transpose(a3, (0, 2, 1))  # (U, Wf_p, C)
    return a3.reshape(h * wfp, c)


def _sep_spectrum(x3f, ah, bh, cw, dw, kern, h, w, c):
    """x (H, W, C) f32 -> (z (H*Wf_p, 2C), m (H*Wf_p, 2C)), all f32.

    Matches _dft_forward + concat + mix exactly on the real Wf columns
    (W-transform, then H-transform, re/im concatenated channel-last);
    padded rows are exactly zero in z and m."""
    wfp = cw.shape[1]
    x2 = jnp.transpose(x3f, (2, 0, 1)).reshape(c * h, w)  # ((c,h), w)
    t_r = jnp.dot(x2, cw, preferred_element_type=jnp.float32)
    t_i = jnp.dot(x2, dw, preferred_element_type=jnp.float32)
    to_vu = lambda a: jnp.transpose(
        a.reshape(c, h, wfp), (0, 2, 1)
    ).reshape(c * wfp, h)  # ((c,v), h)
    t_r2, t_i2 = to_vu(t_r), to_vu(t_i)
    f_r = _dNT(t_r2, ah) - _dNT(t_i2, bh)  # ((c,v), u)
    f_i = _dNT(t_i2, ah) + _dNT(t_r2, bh)
    z = jnp.concatenate(
        [_cv_rows(f_r, h, wfp, c), _cv_rows(f_i, h, wfp, c)], axis=-1
    )
    m = jnp.dot(z, kern, preferred_element_type=jnp.float32)
    return z, m


def _uv_to_vcu(a, h, wfp, c):
    """(U*Wf_p, C) -> ((v,c)-rows, u-lanes) (Wf_p*C, U). All f32."""
    a3 = a.reshape(h, wfp, c)
    return jnp.transpose(a3, (1, 2, 0)).reshape(wfp * c, h)


def _sep_inverse(r, ah, bh, cw, dw, h, w, c):
    """r (H*Wf_p, 2C) f32 [c-weights already applied, so padded rows
    are zero] -> y (H, W, C) f32.

    Matches _dft_inverse with eh_r = ah^T, eh_i = -bh^T, fw_r = c*cw,
    fw_i = -c*dw."""
    wfp = cw.shape[1]
    r_re = _uv_to_vcu(r[:, :c], h, wfp, c)  # ((v,c), u)
    r_im = _uv_to_vcu(r[:, c:], h, wfp, c)
    p_r = (
        jnp.dot(r_re, ah, preferred_element_type=jnp.float32)
        + jnp.dot(r_im, bh, preferred_element_type=jnp.float32)
    )  # ((v,c), p)
    p_i = (
        jnp.dot(r_im, ah, preferred_element_type=jnp.float32)
        - jnp.dot(r_re, bh, preferred_element_type=jnp.float32)
    )
    to_cpv = lambda a: jnp.transpose(
        a.reshape(wfp, c, h), (1, 2, 0)
    ).reshape(c * h, wfp)  # ((c,p), v)
    y2 = _dNT(to_cpv(p_r), cw) + _dNT(to_cpv(p_i), dw)  # ((c,p), w)
    return jnp.transpose(y2.reshape(c, h, w), (1, 2, 0))  # (P, W, C)


def _sep_inverse_adjoint(gy3f, ah, bh, cw, dw, crow, h, w, c):
    """gy (H, W, C) f32 -> gr (H*Wf_p, 2C) f32: adjoint of _sep_inverse
    (_dft_inverse_adjoint in factor form; padded rows zero via crow)."""
    wfp = cw.shape[1]
    gy2 = jnp.transpose(gy3f, (2, 0, 1)).reshape(c * h, w)  # ((c,p), w)
    gp_r = jnp.dot(gy2, cw, preferred_element_type=jnp.float32) * crow
    gp_i = jnp.dot(gy2, dw, preferred_element_type=jnp.float32) * crow
    to_vp = lambda a: jnp.transpose(
        a.reshape(c, h, wfp), (0, 2, 1)
    ).reshape(c * wfp, h)  # ((c,v), p)
    gp_r2, gp_i2 = to_vp(gp_r), to_vp(gp_i)
    gf_r = _dNT(gp_r2, ah) - _dNT(gp_i2, bh)  # ((c,v), u) f32
    gf_i = _dNT(gp_r2, bh) + _dNT(gp_i2, ah)
    return jnp.concatenate(
        [_cv_rows(gf_r, h, wfp, c), _cv_rows(gf_i, h, wfp, c)], axis=-1
    )


def _sep_forward_adjoint(gz, ah, bh, cw, dw, h, w, c):
    """gz (H*Wf_p, 2C) f32 -> gx (H, W, C) f32: adjoint of
    _sep_spectrum's DFT (_dft_forward_adjoint in factor form; padded
    rows of gz are contracted against zero factor columns)."""
    wfp = cw.shape[1]
    g_r = _uv_to_vcu(gz[:, :c], h, wfp, c)  # ((v,c), u)
    g_i = _uv_to_vcu(gz[:, c:], h, wfp, c)
    gt_r = (
        jnp.dot(g_r, ah, preferred_element_type=jnp.float32)
        + jnp.dot(g_i, bh, preferred_element_type=jnp.float32)
    )  # ((v,c), h)
    gt_i = (
        jnp.dot(g_i, ah, preferred_element_type=jnp.float32)
        - jnp.dot(g_r, bh, preferred_element_type=jnp.float32)
    )
    to_chv = lambda a: jnp.transpose(
        a.reshape(wfp, c, h), (1, 2, 0)
    ).reshape(c * h, wfp)  # ((c,h), v)
    gx2 = _dNT(to_chv(gt_r), cw) + _dNT(to_chv(gt_i), dw)  # ((c,h), w)
    return jnp.transpose(gx2.reshape(c, h, w), (1, 2, 0))


def _sep_operands(x, kernel, scale, bias, mean, var):
    b, h, w, c = x.shape
    wf = w // 2 + 1
    dt = x.dtype
    ah, bh, cw, dw, cvals = _sep_np_factors(h, w)
    wfp = cw.shape[1]
    import numpy as np

    f32 = jnp.float32
    row = lambda a: a.astype(f32).reshape(1, 2 * c)
    cvec = jnp.asarray(
        np.broadcast_to(cvals[None, :], (h, wfp)).reshape(h * wfp, 1)
    )
    crow = jnp.asarray(cvals.reshape(1, wfp))
    return (
        b, h, w, c, wf, wfp, dt,
        jnp.asarray(ah, f32), jnp.asarray(bh, f32),
        jnp.asarray(cw, f32), jnp.asarray(dw, f32),
        cvec, crow, kernel.astype(f32),
        row(scale), row(bias), row(mean), row(var),
    )


def _pallas_forward_sep(x, kernel, scale, bias, mean, var, train,
                        interpret: bool = False):
    pl, pltpu = _pl()
    (b, h, w, c, wf, wfp, dt, ah, bh, cw, dw, cvec, crow, kern,
     scale_r, bias_r, mean_r, var_r) = _sep_operands(
        x, kernel, scale, bias, mean, var
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    per_b = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    factor_specs = [
        const((h, h)), const((h, h)), const((w, wfp)), const((w, wfp)),
    ]

    if train:
        def stats_kernel(x_ref, k_ref, ah_ref, bh_ref, cw_ref, dw_ref,
                         s1_ref, s2_ref, acc1, acc2):
            i = pl.program_id(0)
            _, m = _sep_spectrum(
                x_ref[0].astype(jnp.float32), ah_ref[:], bh_ref[:],
                cw_ref[:], dw_ref[:], k_ref[:], h, w, c,
            )
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
            in_specs=[per_b((h, w, c)), const((2 * c, 2 * c))]
            + factor_specs,
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
        )(x, kern, ah, bh, cw, dw)
        n = b * h * wf
        bmean_r = sum_m / n
        bvar_r = sum_m2 / n - bmean_r * bmean_r
    else:
        bmean_r, bvar_r = mean_r, var_r

    def apply_kernel(x_ref, k_ref, s_ref, b_ref, m_ref, v_ref, cv_ref,
                     ah_ref, bh_ref, cw_ref, dw_ref, y_ref):
        _, m = _sep_spectrum(
            x_ref[0].astype(jnp.float32), ah_ref[:], bh_ref[:],
            cw_ref[:], dw_ref[:], k_ref[:], h, w, c,
        )
        inv = jax.lax.rsqrt(v_ref[:] + EPS)
        pre = (m - m_ref[:]) * inv * s_ref[:] + b_ref[:]
        r = jnp.maximum(pre, 0.0) * cv_ref[:]
        y_ref[0] = _sep_inverse(
            r, ah_ref[:], bh_ref[:], cw_ref[:], dw_ref[:], h, w, c
        ).astype(dt)

    y = pl.pallas_call(
        apply_kernel,
        grid=(b,),
        in_specs=[
            per_b((h, w, c)),
            const((2 * c, 2 * c)),
            const((1, 2 * c)),
            const((1, 2 * c)),
            const((1, 2 * c)),
            const((1, 2 * c)),
            const((h * wfp, 1)),
        ]
        + factor_specs,
        out_specs=per_b((h, w, c)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        interpret=interpret,
    )(x, kern, scale_r, bias_r, bmean_r, bvar_r, cvec, ah, bh, cw, dw)
    return y, bmean_r.reshape(2 * c), bvar_r.reshape(2 * c)


def _pallas_backward_sep(x, kernel, scale, bias, bmean, bvar, gy, train,
                         interpret: bool = False):
    pl, pltpu = _pl()
    (b, h, w, c, wf, wfp, dt, ah, bh, cw, dw, cvec, crow, kern,
     scale_r, bias_r, mean_r, var_r) = _sep_operands(
        x, kernel, scale, bias, bmean, bvar
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    per_b = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )

    def recompute(x_ref, gy_ref, k_ref, ah_ref, bh_ref, cw_ref, dw_ref,
                  cr_ref, s_ref, b_ref, m_ref, v_ref):
        z, m = _sep_spectrum(
            x_ref[0].astype(jnp.float32), ah_ref[:], bh_ref[:],
            cw_ref[:], dw_ref[:], k_ref[:], h, w, c,
        )
        inv = jax.lax.rsqrt(v_ref[:] + EPS)
        n_hat = (m - m_ref[:]) * inv
        pre = n_hat * s_ref[:] + b_ref[:]
        mask = (pre > 0).astype(jnp.float32)
        gr = _sep_inverse_adjoint(
            gy_ref[0].astype(jnp.float32), ah_ref[:], bh_ref[:],
            cw_ref[:], dw_ref[:], cr_ref[:], h, w, c,
        )
        gpre = gr * mask
        return z, n_hat, inv, gpre

    in_specs_common = [
        per_b((h, w, c)),
        per_b((h, w, c)),
        const((2 * c, 2 * c)),
        const((h, h)),
        const((h, h)),
        const((w, wfp)),
        const((w, wfp)),
        const((1, wfp)),
        const((1, 2 * c)),
        const((1, 2 * c)),
        const((1, 2 * c)),
        const((1, 2 * c)),
    ]

    def stats_kernel(x_ref, gy_ref, k_ref, ah_ref, bh_ref, cw_ref,
                     dw_ref, cr_ref, s_ref, b_ref, m_ref, v_ref,
                     gs_ref, gb_ref, gn_ref, gnn_ref,
                     a1, a2, a3, a4):
        i = pl.program_id(0)
        _, n_hat, _, gpre = recompute(
            x_ref, gy_ref, k_ref, ah_ref, bh_ref, cw_ref, dw_ref,
            cr_ref, s_ref, b_ref, m_ref, v_ref,
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
    )(x, gy, kern, ah, bh, cw, dw, crow, scale_r, bias_r, mean_r, var_r)

    n = b * h * wf
    mean_gn = sum_gn / n
    mean_gnn = sum_gnn / n

    def apply_kernel(x_ref, gy_ref, k_ref, ah_ref, bh_ref, cw_ref,
                     dw_ref, cr_ref, s_ref, b_ref, m_ref, v_ref,
                     mgn_ref, mgnn_ref, gx_ref, gk_ref, gk_acc):
        i = pl.program_id(0)
        z, n_hat, inv, gpre = recompute(
            x_ref, gy_ref, k_ref, ah_ref, bh_ref, cw_ref, dw_ref,
            cr_ref, s_ref, b_ref, m_ref, v_ref,
        )
        gn = gpre * s_ref[:]
        if train:
            gm = inv * (gn - mgn_ref[:] - n_hat * mgnn_ref[:])
        else:
            gm = gn * inv
        gk_b = jax.lax.dot_general(
            z, gm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == 0)
        def _():
            gk_acc[:] = gk_b

        @pl.when(i > 0)
        def _():
            gk_acc[:] = gk_acc[:] + gk_b

        gk_ref[:] = gk_acc[:]
        gz = jax.lax.dot_general(
            gm, k_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gx_ref[0] = _sep_forward_adjoint(
            gz, ah_ref[:], bh_ref[:], cw_ref[:], dw_ref[:], h, w, c
        ).astype(dt)

    gx, gk = pl.pallas_call(
        apply_kernel,
        grid=(b,),
        in_specs=in_specs_common
        + [const((1, 2 * c)), const((1, 2 * c))],
        out_specs=(per_b((h, w, c)), const((2 * c, 2 * c))),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), dt),
            jax.ShapeDtypeStruct((2 * c, 2 * c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2 * c, 2 * c), jnp.float32)],
        interpret=interpret,
    )(x, gy, kern, ah, bh, cw, dw, crow, scale_r, bias_r, mean_r, var_r,
      mean_gn, mean_gnn)

    zeros = jnp.zeros_like(bmean)
    return (
        gx,
        gk.astype(kernel.dtype),
        gs.reshape(2 * c),
        gb.reshape(2 * c),
        zeros,
        zeros,
    )


# --- sep2: lane-dense separable kernels (round 2, VERDICT items 3+5) --------
#
# The per-item "sep" family keeps channels in the lane dim, so maps
# with 2C < 128 waste most of each VMEM tile and the small per-item
# matmuls are latency-bound (measured 10.9k vs XLA's 21.4k img/s at
# fgan32). This family reorganises every stage to keep the LANE dim
# dense:
#
#   * DFT stages run on (C*H, W)- and (C*Wf_p, U)-shaped 2-D arrays
#     whose lane dims are the spatial axes;
#   * the spectral-row axis u is zero-padded to U = 128-ceil(H) by
#     padding the H-factor matrices with zero rows, which makes the
#     (C, Wf_p, U) -> (C, Wf_p*U) LANE merge Mosaic-legal (probed:
#     merging a sublane dim into the lane dim requires the lane dim to
#     be a multiple of 128) — the same annihilation argument as the
#     Wf padding covers every direction, and BN statistics stay exact
#     against the real count b*h*wf;
#   * the channel mix then runs as one dense (2C, 2C) x (2C, Wf_p*U)
#     matmul with channels as ROWS (sublane) and all spectral
#     positions as LANES — full lane utilisation at any C;
#   * relayouts stay f32 (sublane tile 8); every matmul operand is
#     cast to bf16 at the dot boundary (probed legal), matching the
#     XLA path's precision while running the MXU at native rate.
#
# The price is (U/H)x redundant H-transform/mix FLOPs for maps with
# H < 128 — pure in-VMEM MXU work on an op whose cost is bytes.


def _sep2_legal(h: int, w: int, c: int) -> bool:
    return h % _SUBLANE == 0 and c % _SUBLANE == 0


def _sep2_upad(h: int) -> int:
    return -(-h // 128) * 128


SEP2_MIX_BUDGET_BYTES = 8 * 1024 * 1024


def _sep2_mix_bytes(h: int, w: int, c: int) -> int:
    """Size of one mix-stage (2C, Wf_p*U) f32 array — the dominant
    VMEM class of the sep2 kernels. The admission rule (mix class
    <= 8 MB AND h, w <= 128) is calibrated empirically on TPU v5e:
    every FFC-ladder shape through (128, 128, 64) compiles and runs;
    (256, 256, 16) does not."""
    wfp = _pad8(w // 2 + 1)
    u = _sep2_upad(h)
    return 2 * c * wfp * u * 4


def _sep2_fits(h: int, w: int, c: int) -> bool:
    return (
        _sep2_legal(h, w, c)
        and h <= 128
        and w <= 128
        and _sep2_mix_bytes(h, w, c) <= SEP2_MIX_BUDGET_BYTES
    )


@functools.lru_cache(maxsize=32)
def _sep2_np_factors(h: int, w: int):
    """(ahp, bhp, cw, dw, cmask_flat, cvals): H-factors zero-padded to
    (U, H); W-factors zero-padded on Wf; cmask (Wf_p*U,) f32 carrying
    the half-spectrum duplication weights, zero at padded v AND u."""
    import numpy as np

    ah, bh, cw, dw = fourier._forward_factors(h, w)
    wf = w // 2 + 1
    wfp = _pad8(wf)
    u = _sep2_upad(h)
    cw = np.pad(cw, ((0, 0), (0, wfp - wf)))
    dw = np.pad(dw, ((0, 0), (0, wfp - wf)))
    ahp = np.pad(ah, ((0, u - h), (0, 0)))
    bhp = np.pad(bh, ((0, u - h), (0, 0)))
    cvals = np.zeros((wfp,), np.float32)
    cvals[:wf] = 2.0
    cvals[0] = 1.0
    if w % 2 == 0:
        cvals[wf - 1] = 1.0
    cmask = np.zeros((wfp, u), np.float32)
    cmask[:, :h] = cvals[:, None]
    return ahp, bhp, cw, dw, cmask.reshape(1, wfp * u), cvals


# Dot-operand dtype for the sep2 family. bf16 is the design point (MXU
# native rate; matches what the TPU backend does to f32 dots at default
# matmul precision anyway). Tests set f32 to verify the kernel MATH
# exactly against the f32 jnp reference, separating precision from
# correctness.
_SEP2_DOT_DTYPE = jnp.bfloat16


def set_sep2_dot_dtype(dtype) -> None:
    global _SEP2_DOT_DTYPE
    _SEP2_DOT_DTYPE = dtype


def _sep2_operands(x, kernel, scale, bias, mean, var):
    b, h, w, c = x.shape
    wf = w // 2 + 1
    dt = x.dtype
    ahp, bhp, cw, dw, cmask, cvals = _sep2_np_factors(h, w)
    wfp = cw.shape[1]
    u = ahp.shape[0]
    bf = _SEP2_DOT_DTYPE
    col = lambda a: a.astype(jnp.float32).reshape(2 * c, 1)
    return (
        b, h, w, c, wf, wfp, u, dt,
        jnp.asarray(ahp, bf), jnp.asarray(bhp, bf),
        jnp.asarray(cw, bf), jnp.asarray(dw, bf),
        jnp.asarray(cmask), jnp.asarray(cvals.reshape(1, wfp)),
        kernel.astype(bf),
        col(scale), col(bias), col(mean), col(var),
    )


def _bf(a):
    return a.astype(_SEP2_DOT_DTYPE)


def _sep2_spectrum(x3, ahp, bhp, cw, dw, kern, h, w, c):
    """x (H, W, C) -> (z (2C, Wf_p*U) bf16, m (2C, Wf_p*U) f32).

    Same math as _sep_spectrum (W-transform, H-transform, mix) with
    channels-as-rows in the mix; padded v/u positions are exactly zero
    in z and hence in m."""
    u = ahp.shape[0]
    wfp = cw.shape[1]
    xf = x3.astype(jnp.float32)
    x2 = _bf(jnp.transpose(xf, (2, 0, 1)).reshape(c * h, w))
    t_r = jnp.dot(x2, cw, preferred_element_type=jnp.float32)
    t_i = jnp.dot(x2, dw, preferred_element_type=jnp.float32)
    tov = lambda t: _bf(
        jnp.transpose(t.reshape(c, h, wfp), (0, 2, 1)).reshape(c * wfp, h)
    )
    t_r2, t_i2 = tov(t_r), tov(t_i)
    f_r = _dNT(t_r2, ahp) - _dNT(t_i2, bhp)  # (c*wfp, U) f32
    f_i = _dNT(t_i2, ahp) + _dNT(t_r2, bhp)
    lanes = lambda f: f.reshape(c, wfp, u).reshape(c, wfp * u)
    z = _bf(jnp.concatenate([lanes(f_r), lanes(f_i)], axis=0))
    m = _dT(kern, z)  # (2c, wfp*u) f32
    return z, m


def _sep2_inverse(r, ahp, bhp, cw, dw, h, w, c):
    """r (2C, Wf_p*U) f32 [cmask applied] -> y (H, W, C) f32."""
    u = ahp.shape[0]
    wfp = cw.shape[1]
    tou = lambda a: _bf(a.reshape(c, wfp, u).reshape(c * wfp, u))
    r_re, r_im = tou(r[:c]), tou(r[c:])
    p_r = jnp.dot(
        r_re, ahp, preferred_element_type=jnp.float32
    ) + jnp.dot(r_im, bhp, preferred_element_type=jnp.float32)
    p_i = jnp.dot(
        r_im, ahp, preferred_element_type=jnp.float32
    ) - jnp.dot(r_re, bhp, preferred_element_type=jnp.float32)
    tocp = lambda p: _bf(
        jnp.transpose(p.reshape(c, wfp, h), (0, 2, 1)).reshape(c * h, wfp)
    )
    y2 = _dNT(tocp(p_r), cw) + _dNT(tocp(p_i), dw)  # (c*h, w) f32
    return jnp.transpose(y2.reshape(c, h, w), (1, 2, 0))


def _sep2_inverse_adjoint(gy3, ahp, bhp, cw, dw, crow, h, w, c):
    """gy (H, W, C) -> gr (2C, Wf_p*U) f32 (zero at padded v/u)."""
    u = ahp.shape[0]
    wfp = cw.shape[1]
    gy2 = _bf(
        jnp.transpose(gy3.astype(jnp.float32), (2, 0, 1)).reshape(
            c * h, w
        )
    )
    gp_r = jnp.dot(gy2, cw, preferred_element_type=jnp.float32) * crow
    gp_i = jnp.dot(gy2, dw, preferred_element_type=jnp.float32) * crow
    tov = lambda t: _bf(
        jnp.transpose(t.reshape(c, h, wfp), (0, 2, 1)).reshape(c * wfp, h)
    )
    gp_r2, gp_i2 = tov(gp_r), tov(gp_i)
    gf_r = _dNT(gp_r2, ahp) - _dNT(gp_i2, bhp)
    gf_i = _dNT(gp_r2, bhp) + _dNT(gp_i2, ahp)
    lanes = lambda f: f.reshape(c, wfp, u).reshape(c, wfp * u)
    return jnp.concatenate([lanes(gf_r), lanes(gf_i)], axis=0)


def _sep2_forward_adjoint(gz, ahp, bhp, cw, dw, h, w, c):
    """gz (2C, Wf_p*U) f32 -> gx (H, W, C) f32."""
    u = ahp.shape[0]
    wfp = cw.shape[1]
    tou = lambda a: _bf(a.reshape(c, wfp, u).reshape(c * wfp, u))
    g_r, g_i = tou(gz[:c]), tou(gz[c:])
    gt_r = jnp.dot(
        g_r, ahp, preferred_element_type=jnp.float32
    ) + jnp.dot(g_i, bhp, preferred_element_type=jnp.float32)
    gt_i = jnp.dot(
        g_i, ahp, preferred_element_type=jnp.float32
    ) - jnp.dot(g_r, bhp, preferred_element_type=jnp.float32)
    tocp = lambda p: _bf(
        jnp.transpose(p.reshape(c, wfp, h), (0, 2, 1)).reshape(c * h, wfp)
    )
    gx2 = _dNT(tocp(gt_r), cw) + _dNT(tocp(gt_i), dw)
    return jnp.transpose(gx2.reshape(c, h, w), (1, 2, 0))


# The (128,128,32+) apply kernels need slightly more than Mosaic's
# default 16 MB scoped-vmem limit (measured 16.04 MB in-context);
# physical VMEM is far larger, so raise the cap for the sep2 family.
SEP2_VMEM_LIMIT = 32 * 1024 * 1024


def _sep2_params(pltpu):
    return pltpu.CompilerParams(vmem_limit_bytes=SEP2_VMEM_LIMIT)


def _pallas_forward_sep2(x, kernel, scale, bias, mean, var, train,
                         interpret: bool = False):
    pl, pltpu = _pl()
    (b, h, w, c, wf, wfp, u, dt, ahp, bhp, cw, dw, cmask, crow, kern,
     scale_c, bias_c, mean_c, var_c) = _sep2_operands(
        x, kernel, scale, bias, mean, var
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    per_b = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    factor_specs = [
        const((u, h)), const((u, h)), const((w, wfp)), const((w, wfp)),
    ]
    x_len = wfp * u

    if train:
        def stats_kernel(x_ref, k_ref, ah_ref, bh_ref, cw_ref, dw_ref,
                         s1_ref, s2_ref, acc1, acc2):
            i = pl.program_id(0)
            _, m = _sep2_spectrum(
                x_ref[0], ah_ref[:], bh_ref[:], cw_ref[:], dw_ref[:],
                k_ref[:], h, w, c,
            )
            s1 = jnp.sum(m, axis=1, keepdims=True)
            s2 = jnp.sum(m * m, axis=1, keepdims=True)

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
            in_specs=[per_b((h, w, c)), const((2 * c, 2 * c))]
            + factor_specs,
            out_specs=(const((2 * c, 1)), const((2 * c, 1))),
            out_shape=(
                jax.ShapeDtypeStruct((2 * c, 1), jnp.float32),
                jax.ShapeDtypeStruct((2 * c, 1), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * c, 1), jnp.float32),
                pltpu.VMEM((2 * c, 1), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=_sep2_params(pltpu),
        )(x, kern, ahp, bhp, cw, dw)
        n = b * h * wf
        bmean_c = sum_m / n
        bvar_c = sum_m2 / n - bmean_c * bmean_c
    else:
        bmean_c, bvar_c = mean_c, var_c

    def apply_kernel(x_ref, k_ref, s_ref, b_ref, m_ref, v_ref, cm_ref,
                     ah_ref, bh_ref, cw_ref, dw_ref, y_ref):
        _, m = _sep2_spectrum(
            x_ref[0], ah_ref[:], bh_ref[:], cw_ref[:], dw_ref[:],
            k_ref[:], h, w, c,
        )
        inv = jax.lax.rsqrt(v_ref[:] + EPS)
        pre = (m - m_ref[:]) * inv * s_ref[:] + b_ref[:]
        r = jnp.maximum(pre, 0.0) * cm_ref[:]
        y_ref[0] = _sep2_inverse(
            r, ah_ref[:], bh_ref[:], cw_ref[:], dw_ref[:], h, w, c
        ).astype(dt)

    y = pl.pallas_call(
        apply_kernel,
        grid=(b,),
        in_specs=[
            per_b((h, w, c)),
            const((2 * c, 2 * c)),
            const((2 * c, 1)),
            const((2 * c, 1)),
            const((2 * c, 1)),
            const((2 * c, 1)),
            const((1, x_len)),
        ]
        + factor_specs,
        out_specs=per_b((h, w, c)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        interpret=interpret,
        compiler_params=_sep2_params(pltpu),
    )(x, kern, scale_c, bias_c, bmean_c, bvar_c, cmask, ahp, bhp, cw, dw)
    return y, bmean_c.reshape(2 * c), bvar_c.reshape(2 * c)


def _pallas_backward_sep2(x, kernel, scale, bias, bmean, bvar, gy, train,
                          interpret: bool = False):
    pl, pltpu = _pl()
    (b, h, w, c, wf, wfp, u, dt, ahp, bhp, cw, dw, cmask, crow, kern,
     scale_c, bias_c, mean_c, var_c) = _sep2_operands(
        x, kernel, scale, bias, bmean, bvar
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    per_b = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    x_len = wfp * u

    def recompute(x_ref, gy_ref, k_ref, ah_ref, bh_ref, cw_ref, dw_ref,
                  cr_ref, s_ref, b_ref, m_ref, v_ref):
        z, m = _sep2_spectrum(
            x_ref[0], ah_ref[:], bh_ref[:], cw_ref[:], dw_ref[:],
            k_ref[:], h, w, c,
        )
        inv = jax.lax.rsqrt(v_ref[:] + EPS)
        n_hat = (m - m_ref[:]) * inv
        pre = n_hat * s_ref[:] + b_ref[:]
        mask = (pre > 0).astype(jnp.float32)
        gr = _sep2_inverse_adjoint(
            gy_ref[0], ah_ref[:], bh_ref[:], cw_ref[:], dw_ref[:],
            cr_ref[:], h, w, c,
        )
        gpre = gr * mask
        return z, n_hat, inv, gpre

    in_specs_common = [
        per_b((h, w, c)),
        per_b((h, w, c)),
        const((2 * c, 2 * c)),
        const((u, h)),
        const((u, h)),
        const((w, wfp)),
        const((w, wfp)),
        const((1, wfp)),
        const((2 * c, 1)),
        const((2 * c, 1)),
        const((2 * c, 1)),
        const((2 * c, 1)),
    ]

    def stats_kernel(x_ref, gy_ref, k_ref, ah_ref, bh_ref, cw_ref,
                     dw_ref, cr_ref, s_ref, b_ref, m_ref, v_ref,
                     gs_ref, gb_ref, gn_ref, gnn_ref,
                     a1, a2, a3, a4):
        i = pl.program_id(0)
        _, n_hat, _, gpre = recompute(
            x_ref, gy_ref, k_ref, ah_ref, bh_ref, cw_ref, dw_ref,
            cr_ref, s_ref, b_ref, m_ref, v_ref,
        )
        gn = gpre * s_ref[:]
        rows = [
            jnp.sum(gpre * n_hat, axis=1, keepdims=True),
            jnp.sum(gpre, axis=1, keepdims=True),
            jnp.sum(gn, axis=1, keepdims=True),
            jnp.sum(gn * n_hat, axis=1, keepdims=True),
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
        out_specs=tuple(const((2 * c, 1)) for _ in range(4)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((2 * c, 1), jnp.float32)
            for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * c, 1), jnp.float32) for _ in range(4)
        ],
        interpret=interpret,
        compiler_params=_sep2_params(pltpu),
    )(x, gy, kern, ahp, bhp, cw, dw, crow, scale_c, bias_c, mean_c,
      var_c)

    n = b * h * wf
    mean_gn = sum_gn / n
    mean_gnn = sum_gnn / n

    def apply_kernel(x_ref, gy_ref, k_ref, ah_ref, bh_ref, cw_ref,
                     dw_ref, cr_ref, s_ref, b_ref, m_ref, v_ref,
                     mgn_ref, mgnn_ref, gx_ref, gk_ref, gk_acc):
        i = pl.program_id(0)
        z, n_hat, inv, gpre = recompute(
            x_ref, gy_ref, k_ref, ah_ref, bh_ref, cw_ref, dw_ref,
            cr_ref, s_ref, b_ref, m_ref, v_ref,
        )
        gn = gpre * s_ref[:]
        if train:
            gm = inv * (gn - mgn_ref[:] - n_hat * mgnn_ref[:])
        else:
            gm = gn * inv
        gm_b = _bf(gm)
        # gkernel[c, d] = sum_x z[c, x] gm[d, x]
        gk_b = _dNT(z, gm_b)

        @pl.when(i == 0)
        def _():
            gk_acc[:] = gk_b

        @pl.when(i > 0)
        def _():
            gk_acc[:] = gk_acc[:] + gk_b

        gk_ref[:] = gk_acc[:]
        # gz[c, x] = sum_d kern[c, d] gm[d, x]
        gz = jnp.dot(k_ref[:], gm_b, preferred_element_type=jnp.float32)
        gx_ref[0] = _sep2_forward_adjoint(
            gz, ah_ref[:], bh_ref[:], cw_ref[:], dw_ref[:], h, w, c
        ).astype(dt)

    gx, gk = pl.pallas_call(
        apply_kernel,
        grid=(b,),
        in_specs=in_specs_common
        + [const((2 * c, 1)), const((2 * c, 1))],
        out_specs=(per_b((h, w, c)), const((2 * c, 2 * c))),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), dt),
            jax.ShapeDtypeStruct((2 * c, 2 * c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2 * c, 2 * c), jnp.float32)],
        interpret=interpret,
        compiler_params=_sep2_params(pltpu),
    )(x, gy, kern, ahp, bhp, cw, dw, crow, scale_c, bias_c, mean_c,
      var_c, mean_gn, mean_gnn)

    zeros = jnp.zeros_like(bmean)
    return (
        gx,
        gk.astype(kernel.dtype),
        gs.reshape(2 * c),
        gb.reshape(2 * c),
        zeros,
        zeros,
    )


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


def _pallas_forward_kron(x, kernel, scale, bias, mean, var, train,
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


def _pallas_backward_kron(x, kernel, scale, bias, bmean, bvar, gy, train,
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



_FWD_BY_MODE = {
    "sep": _pallas_forward_sep,
    "sep2": _pallas_forward_sep2,
    "kron": _pallas_forward_kron,
}
_BWD_BY_MODE = {
    "sep": _pallas_backward_sep,
    "sep2": _pallas_backward_sep2,
    "kron": _pallas_backward_kron,
}


def _pallas_forward(x, kernel, scale, bias, mean, var, train,
                    interpret: bool = False, mode: Optional[str] = None):
    fn = _FWD_BY_MODE[mode or _PALLAS_MODE]
    return fn(x, kernel, scale, bias, mean, var, train, interpret=interpret)


def _pallas_backward(x, kernel, scale, bias, bmean, bvar, gy, train,
                     interpret: bool = False, mode: Optional[str] = None):
    fn = _BWD_BY_MODE[mode or _PALLAS_MODE]
    return fn(
        x, kernel, scale, bias, bmean, bvar, gy, train, interpret=interpret
    )
