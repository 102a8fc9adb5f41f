"""Fused packed-BN + tanh-GELU Pallas family (round-4 named lever).

Reference contract being fused: layers/ffc/ffc_bn_act.py:70-82 (conv ->
per-branch BN -> activation) as restructured by this framework's
packed-branch mode (nn/ffc.py `_packed_norm_act`): one set of per-channel
batch statistics over the concatenated branches (identical to per-branch
stats), f32 normalisation, downcast to the compute dtype BEFORE the
activation, tanh-form GELU for bf16 (nn/layers.py `gelu` policy).

Why a kernel: the round-3 128px trace (BASELINE.md sink table) shows the
packed-BN stat reduces running at 56-86 % of the HBM roofline and the
norm/GELU loop fusions below it; XLA reads the (64,128,128,128) map once
per stat reduce plus once for the apply. The fused family does the
minimum possible traffic:

  forward   = stats pass (1 read) + apply pass (1 read + 1 write)
  backward  = reduce pass (read x, g) + dx pass (read x, g, write dx)

with all per-channel algebra (running-stat updates, the BN backward's
S1/S2 coefficient folding) done in jnp on (C,) vectors.

Dispatch policy mirrors ops/pallas/fourier_unit.py: OFF by default
(FFC_TPU_FUSED_BN=1 / :func:`set_fused_bn_enabled` opt in), shape-gated
(C % 128 == 0, rows divisible into aligned tiles), tanh-GELU only (the
bf16 policy path — f32/exact-erf runs keep the jnp chain), interpret
mode off-TPU so CPU tests execute the same kernels. The default flips
only on a measured in-context win (tools/chip_runbook.md round-4
item 1); a measured refutation also closes the lever.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

EPS = 1e-5  # flax/torch BatchNorm default, matches nn/ffc.py:769


# --- dispatch -----------------------------------------------------------------

_ENABLED = os.environ.get("FFC_TPU_FUSED_BN", "0") not in ("0", "false", "")


def set_fused_bn_enabled(enabled: bool) -> None:
    """Opt the packed path in/out of the fused BN+GELU kernels."""
    global _ENABLED
    _ENABLED = bool(enabled)


def fused_bn_enabled() -> bool:
    return _ENABLED


def _interpret_default() -> bool:
    # compiled on TPU; interpreter elsewhere so CPU tests run the same
    # kernel code (tiny shapes only — interpret mode is slow)
    return jax.default_backend() != "tpu"


def _tile_rows(rows: int, c: int, itemsize: int) -> int:
    """Largest power-of-two row tile with block size <= ~2 MB that
    divides ``rows`` (pipelining needs uniform blocks; rows here are
    always B*H*W = 64 * 2^k in the generator ladder)."""
    budget = max(8, (2 * 2**20) // max(1, c * itemsize))
    tr = 1
    while tr * 2 <= budget and rows % (tr * 2) == 0:
        tr *= 2
    return tr


def fused_shape_legal(shape: Tuple[int, ...], dtype) -> bool:
    """C lane-aligned and rows tileable; bf16/f32 only."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    rows = b * h * w
    if c % 128 != 0 or rows < 512:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    tr = _tile_rows(rows, c, jnp.dtype(dtype).itemsize)
    return rows % tr == 0 and tr >= 256


# --- tanh-GELU and its derivative ----------------------------------------------

_C1 = 0.7978845608028654  # sqrt(2/pi), as in jax.nn.gelu approximate=True
_C2 = 0.044715


def _gelu_tanh(u):
    """jax.nn.gelu(u, approximate=True), inlined so the kernel and the
    jnp chain share one definition (computed in u.dtype, like jax.nn)."""
    c1 = jnp.asarray(_C1, u.dtype)
    c2 = jnp.asarray(_C2, u.dtype)
    half = jnp.asarray(0.5, u.dtype)
    one = jnp.asarray(1.0, u.dtype)
    return half * u * (one + jnp.tanh(c1 * (u + c2 * u * u * u)))


def _gelu_tanh_grad_f32(u):
    """d gelu_tanh / du, evaluated in f32 (u may be a downcast bf16
    value — the derivative is then exact at that representable point)."""
    uf = u.astype(jnp.float32)
    s = _C1 * (uf + _C2 * uf * uf * uf)
    t = jnp.tanh(s)
    return 0.5 * (1.0 + t) + 0.5 * uf * (1.0 - t * t) * _C1 * (
        1.0 + 3.0 * _C2 * uf * uf
    )


# --- jnp reference chain (fallback + parity target) -----------------------------


def bn_gelu_chain_jnp(x, scale, bias):
    """The exact `_packed_norm_act` train-mode math (nn/ffc.py:739-781)
    with tanh GELU: f32-accumulating stats, barrier-separated apply
    upcast, downcast before the activation. Returns (out, bmean, bvar)."""
    bmean = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
    bvar = (
        jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2))
        - bmean * bmean
    )
    inv = jax.lax.rsqrt(bvar + EPS)
    x_ap = jax.lax.optimization_barrier(x)
    u = (
        (x_ap.astype(jnp.float32) - bmean) * (inv * scale) + bias
    ).astype(x.dtype)
    return _gelu_tanh(u), bmean, bvar


# --- pallas kernels --------------------------------------------------------------


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def _stats_sums(x2, interpret: bool):
    """One read pass: per-channel [sum(x), sum(x^2)] in f32 -> (8, C)
    (rows 0/1 used; 8 keeps the accumulator block sublane-aligned)."""
    pl, pltpu = _pl()
    rows, c = x2.shape
    tr = _tile_rows(rows, c, x2.dtype.itemsize)

    def kernel(x_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

        xf = x_ref[:].astype(jnp.float32)
        out_ref[0, :] += jnp.sum(xf, axis=0)
        out_ref[1, :] += jnp.sum(xf * xf, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, c), jnp.float32),
        interpret=interpret,
    )(x2)


def _apply_bn_gelu(x2, mean, isc, bias, interpret: bool):
    """Apply pass: u = (x - mean) * (inv*scale) + bias, downcast, GELU."""
    pl, pltpu = _pl()
    rows, c = x2.shape
    # halved tile: the f32 upcast temporary inside the kernel costs
    # another 2x the bf16 block on the VMEM vector stack (measured
    # scoped-vmem OOM at the full tile on v5e)
    tr = max(_tile_rows(rows, c, x2.dtype.itemsize) // 2, 8)
    out_dtype = x2.dtype

    def kernel(x_ref, m_ref, s_ref, b_ref, out_ref):
        xf = x_ref[:].astype(jnp.float32)
        u = ((xf - m_ref[0, :]) * s_ref[0, :] + b_ref[0, :]).astype(
            out_dtype
        )
        out_ref[:] = _gelu_tanh(u)

    vec = lambda v: v.reshape(1, c).astype(jnp.float32)  # noqa: E731
    vspec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vspec, vspec, vspec,
        ],
        out_specs=pl.BlockSpec((tr, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), out_dtype),
        interpret=interpret,
    )(x2, vec(mean), vec(isc), vec(bias))


def _bwd_reduce(x2, g2, mean, isc, bias, inv, interpret: bool):
    """Backward reduce pass over (x, g): S1 = sum(du), S2 = sum(du*xhat)
    per channel, du = g * gelu'(u) with u recomputed from x."""
    pl, pltpu = _pl()
    rows, c = x2.shape
    # quarter tile: x + g blocks plus their f32 temporaries (xf, gf, du,
    # xhat) exceed scoped VMEM at half tile (measured on v5e)
    tr = max(_tile_rows(rows, c, x2.dtype.itemsize) // 4, 8)
    cast_dtype = x2.dtype

    def kernel(x_ref, g_ref, m_ref, s_ref, b_ref, i_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

        xf = x_ref[:].astype(jnp.float32)
        u = ((xf - m_ref[0, :]) * s_ref[0, :] + b_ref[0, :]).astype(
            cast_dtype
        )
        du = g_ref[:].astype(jnp.float32) * _gelu_tanh_grad_f32(u)
        xhat = (xf - m_ref[0, :]) * i_ref[0, :]
        out_ref[0, :] += jnp.sum(du, axis=0)
        out_ref[1, :] += jnp.sum(du * xhat, axis=0)

    vspec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    big = pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = lambda v: v.reshape(1, c).astype(jnp.float32)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(rows // tr,),
        in_specs=[big, big, vspec, vspec, vspec, vspec],
        out_specs=pl.BlockSpec((8, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, c), jnp.float32),
        interpret=interpret,
    )(x2, g2, vec(mean), vec(isc), vec(bias), vec(inv))


def _bwd_dx(x2, g2, mean, isc, bias, a, p, q, interpret: bool):
    """dx pass: dx = A*du + P + Q*(x - mean), du recomputed as above."""
    pl, pltpu = _pl()
    rows, c = x2.shape
    # quarter tile: x + g blocks plus their f32 temporaries (xf, gf, du,
    # xhat) exceed scoped VMEM at half tile (measured on v5e)
    tr = max(_tile_rows(rows, c, x2.dtype.itemsize) // 4, 8)
    cast_dtype = x2.dtype

    def kernel(x_ref, g_ref, m_ref, s_ref, b_ref, a_ref, p_ref, q_ref,
               out_ref):
        xf = x_ref[:].astype(jnp.float32)
        xm = xf - m_ref[0, :]
        u = (xm * s_ref[0, :] + b_ref[0, :]).astype(cast_dtype)
        du = g_ref[:].astype(jnp.float32) * _gelu_tanh_grad_f32(u)
        out_ref[:] = (
            a_ref[0, :] * du + p_ref[0, :] + q_ref[0, :] * xm
        ).astype(cast_dtype)

    vspec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    big = pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = lambda v: v.reshape(1, c).astype(jnp.float32)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(rows // tr,),
        in_specs=[big, big, vspec, vspec, vspec, vspec, vspec, vspec],
        out_specs=big,
        out_shape=jax.ShapeDtypeStruct((rows, c), cast_dtype),
        interpret=interpret,
    )(x2, g2, vec(mean), vec(isc), vec(bias), vec(a), vec(p), vec(q))


# --- the custom-VJP op -----------------------------------------------------------


def _forward_impl(x, scale, bias, interpret: bool):
    b, h, w, c = x.shape
    rows = b * h * w
    x2 = x.reshape(rows, c)
    sums = _stats_sums(x2, interpret)
    n = jnp.float32(rows)
    bmean = sums[0] / n
    bvar = sums[1] / n - bmean * bmean
    inv = jax.lax.rsqrt(bvar + EPS)
    isc = inv * scale.astype(jnp.float32)
    out2 = _apply_bn_gelu(x2, bmean, isc, bias.astype(jnp.float32),
                          interpret)
    return out2.reshape(b, h, w, c), bmean, bvar


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def packed_bn_gelu(x, scale, bias, interpret: bool = False):
    """Fused train-mode packed-BN + tanh-GELU: returns
    ``(out, batch_mean, batch_var)``; stats in f32, the normalized value
    downcast to x.dtype before the activation (the `_packed_norm_act`
    contract). Differentiable in (x, scale, bias) with the fully coupled
    batch-norm backward, including the (bmean, bvar) output cotangents."""
    return _forward_impl(x, scale, bias, interpret)


def _fwd(x, scale, bias, interpret):
    out, bmean, bvar = _forward_impl(x, scale, bias, interpret)
    return (out, bmean, bvar), (x, scale, bias, bmean, bvar)


def _bwd(interpret, residuals, cotangents):
    x, scale, bias, bmean, bvar = residuals
    g_out, g_mean, g_var = cotangents
    b, h, w, c = x.shape
    rows = b * h * w
    n = jnp.float32(rows)
    x2 = x.reshape(rows, c)
    g2 = g_out.reshape(rows, c)

    inv = jax.lax.rsqrt(bvar + EPS)
    scale_f = scale.astype(jnp.float32)
    bias_f = bias.astype(jnp.float32)
    isc = inv * scale_f
    sums = _bwd_reduce(x2, g2, bmean, isc, bias_f, inv, interpret)
    s1, s2 = sums[0], sums[1]

    # dx = A*du + P + Q*(x - mean) with the standard coupled-BN algebra
    # (derivation in the module docstring commit); g_mean/g_var are the
    # cotangents of the stats outputs (zero in normal training, where
    # running-stat updates are non-differentiable buffer writes).
    # g_mean/g_var arrive as zero arrays when unused (custom_vjp
    # materializes output cotangents; symbolic zeros are not enabled)
    a = isc
    p = (-a * s1 + g_mean.astype(jnp.float32)) / n
    q = (-a * inv * s2 + 2.0 * g_var.astype(jnp.float32)) / n
    dx2 = _bwd_dx(x2, g2, bmean, isc, bias_f, a, p, q, interpret)

    dscale = (s2).astype(scale.dtype)
    dbias = (s1).astype(bias.dtype)
    return dx2.reshape(b, h, w, c), dscale, dbias


packed_bn_gelu.defvjp(_fwd, _bwd)


# --- noise-folded variant ----------------------------------------------------------
#
# In the jnp path XLA fuses the StyleGAN noise add (generator blocks:
# FFC_BN_ACT -> NoiseInjection, reference noise_injection.py:20-31) into
# the same loop fusion as the BN apply + GELU, so a Pallas family that
# stops at GELU would ADD one full read+write pass. The noise fold keeps
# the op at the same fusion boundary XLA already achieves:
#   out = gelu(bn(x)) + w[c] * (n_g if c >= cl else n_l)
# with per-channel weight w and per-position single-channel noise maps.


def bn_gelu_noise_chain_jnp(x, scale, bias, w, n_l, n_g, cl):
    """jnp reference: the chain + packed_noise_inject math
    (models/ffc_gan.py:52-66)."""
    out, m, v = bn_gelu_chain_jnp(x, scale, bias)
    sel = jnp.arange(x.shape[-1]) >= cl
    noise = jnp.where(sel, n_g, n_l)
    return out + w.astype(x.dtype) * noise, m, v


def _apply_bn_gelu_noise(x2, nl2, ng2, mean, isc, bias, w, cl,
                         interpret: bool):
    """Apply pass with the noise fold: gelu(norm(x)) + w * n_sel."""
    pl, pltpu = _pl()
    rows, c = x2.shape
    # halved tile: the (tr, 1) noise blocks pad to 128 lanes in VMEM,
    # so at C=128 they cost as much as the data blocks (measured VMEM
    # OOM at the full tile on v5e)
    tr = max(_tile_rows(rows, c, x2.dtype.itemsize) // 2, 8)
    out_dtype = x2.dtype

    def kernel(x_ref, nl_ref, ng_ref, m_ref, s_ref, b_ref, w_ref,
               sel_ref, out_ref):
        xf = x_ref[:].astype(jnp.float32)
        u = ((xf - m_ref[0, :]) * s_ref[0, :] + b_ref[0, :]).astype(
            out_dtype
        )
        y = _gelu_tanh(u)
        # arithmetic branch select: sel is {0,1} per lane (1.0 = global
        # branch) — exact, and avoids the i1-mask relayout Mosaic
        # rejects for (rows, 1)-block operands
        sel = sel_ref[0, :].astype(out_dtype)
        one = jnp.asarray(1.0, out_dtype)
        nsel = nl_ref[:].astype(out_dtype) * (one - sel) + ng_ref[
            :
        ].astype(out_dtype) * sel
        out_ref[:] = y + w_ref[0, :].astype(out_dtype) * nsel

    vec = lambda v: v.reshape(1, c).astype(jnp.float32)  # noqa: E731
    vspec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    big = pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((tr, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sel_vec = (jnp.arange(c) >= cl).astype(jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(rows // tr,),
        in_specs=[big, nspec, nspec, vspec, vspec, vspec, vspec, vspec],
        out_specs=big,
        out_shape=jax.ShapeDtypeStruct((rows, c), out_dtype),
        interpret=interpret,
    )(x2, nl2, ng2, vec(mean), vec(isc), vec(bias), vec(w),
      vec(sel_vec))


def _bwd_reduce_noise(x2, g2, nl2, ng2, mean, isc, bias, inv, cl,
                      interpret: bool):
    """Backward reduce with the noise fold: rows 0/1/2 of the output are
    S1 = sum(du), S2 = sum(du*xhat), S3 = dw = sum(g*n_sel)."""
    pl, pltpu = _pl()
    rows, c = x2.shape
    # quarter tile: x + g blocks plus their f32 temporaries (xf, gf, du,
    # xhat) exceed scoped VMEM at half tile (measured on v5e)
    tr = max(_tile_rows(rows, c, x2.dtype.itemsize) // 4, 8)
    cast_dtype = x2.dtype

    def kernel(x_ref, g_ref, nl_ref, ng_ref, m_ref, s_ref, b_ref, i_ref,
               sel_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

        xf = x_ref[:].astype(jnp.float32)
        gf = g_ref[:].astype(jnp.float32)
        u = ((xf - m_ref[0, :]) * s_ref[0, :] + b_ref[0, :]).astype(
            cast_dtype
        )
        du = gf * _gelu_tanh_grad_f32(u)
        xhat = (xf - m_ref[0, :]) * i_ref[0, :]
        sel = sel_ref[0, :]
        nsel = nl_ref[:].astype(jnp.float32) * (1.0 - sel) + ng_ref[
            :
        ].astype(jnp.float32) * sel
        out_ref[0, :] += jnp.sum(du, axis=0)
        out_ref[1, :] += jnp.sum(du * xhat, axis=0)
        out_ref[2, :] += jnp.sum(gf * nsel, axis=0)

    vspec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    big = pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((tr, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    vec = lambda v: v.reshape(1, c).astype(jnp.float32)  # noqa: E731
    sel_vec = (jnp.arange(c) >= cl).astype(jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(rows // tr,),
        in_specs=[big, big, nspec, nspec, vspec, vspec, vspec, vspec,
                  vspec],
        out_specs=pl.BlockSpec((8, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, c), jnp.float32),
        interpret=interpret,
    )(x2, g2, nl2, ng2, vec(mean), vec(isc), vec(bias), vec(inv),
      vec(sel_vec))


def _bwd_dx_noise(x2, g2, mean, isc, bias, a, p, q, w, cl,
                  interpret: bool):
    """dx pass + the noise-map cotangents:
    dn_l[r] = sum_{c<cl} g*w, dn_g[r] = sum_{c>=cl} g*w."""
    pl, pltpu = _pl()
    rows, c = x2.shape
    # quarter tile: x + g blocks plus their f32 temporaries (xf, gf, du,
    # xhat) exceed scoped VMEM at half tile (measured on v5e)
    tr = max(_tile_rows(rows, c, x2.dtype.itemsize) // 4, 8)
    cast_dtype = x2.dtype

    def kernel(x_ref, g_ref, m_ref, s_ref, b_ref, a_ref, p_ref, q_ref,
               w_ref, sel_ref, dx_ref, dnl_ref, dng_ref):
        xf = x_ref[:].astype(jnp.float32)
        gf = g_ref[:].astype(jnp.float32)
        xm = xf - m_ref[0, :]
        u = (xm * s_ref[0, :] + b_ref[0, :]).astype(cast_dtype)
        du = gf * _gelu_tanh_grad_f32(u)
        dx_ref[:] = (
            a_ref[0, :] * du + p_ref[0, :] + q_ref[0, :] * xm
        ).astype(cast_dtype)
        gw = gf * w_ref[0, :]
        sel = sel_ref[0, :]
        dnl_ref[:] = jnp.sum(
            gw * (1.0 - sel), axis=1, keepdims=True
        ).astype(cast_dtype)
        dng_ref[:] = jnp.sum(gw * sel, axis=1, keepdims=True).astype(
            cast_dtype
        )

    vspec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    big = pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((tr, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    vec = lambda v: v.reshape(1, c).astype(jnp.float32)  # noqa: E731
    sel_vec = (jnp.arange(c) >= cl).astype(jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(rows // tr,),
        in_specs=[big, big, vspec, vspec, vspec, vspec, vspec, vspec,
                  vspec, vspec],
        out_specs=(big, nspec, nspec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, c), cast_dtype),
            jax.ShapeDtypeStruct((rows, 1), cast_dtype),
            jax.ShapeDtypeStruct((rows, 1), cast_dtype),
        ),
        interpret=interpret,
    )(x2, g2, vec(mean), vec(isc), vec(bias), vec(a), vec(p), vec(q),
      vec(w), vec(sel_vec))


def _forward_noise_impl(x, scale, bias, w, n_l, n_g, cl, interpret):
    b, h, wd, c = x.shape
    rows = b * h * wd
    x2 = x.reshape(rows, c)
    sums = _stats_sums(x2, interpret)
    n = jnp.float32(rows)
    bmean = sums[0] / n
    bvar = sums[1] / n - bmean * bmean
    inv = jax.lax.rsqrt(bvar + EPS)
    isc = inv * scale.astype(jnp.float32)
    out2 = _apply_bn_gelu_noise(
        x2, n_l.reshape(rows, 1), n_g.reshape(rows, 1), bmean, isc,
        bias.astype(jnp.float32), w.astype(jnp.float32), cl, interpret,
    )
    return out2.reshape(b, h, wd, c), bmean, bvar


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def packed_bn_gelu_noise(x, scale, bias, w, n_l, n_g, cl: int,
                         interpret: bool = False):
    """Fused train-mode packed-BN + tanh-GELU + StyleGAN noise add:
    ``out = gelu(bn(x)) + w * select(channel >= cl, n_g, n_l)``.
    Returns ``(out, batch_mean, batch_var)``; differentiable in
    (x, scale, bias, w, n_l, n_g)."""
    return _forward_noise_impl(x, scale, bias, w, n_l, n_g, cl, interpret)


def _fwd_noise(x, scale, bias, w, n_l, n_g, cl, interpret):
    out, bmean, bvar = _forward_noise_impl(
        x, scale, bias, w, n_l, n_g, cl, interpret
    )
    return (out, bmean, bvar), (x, scale, bias, w, n_l, n_g, bmean, bvar)


def _bwd_noise(cl, interpret, residuals, cotangents):
    x, scale, bias, w, n_l, n_g, bmean, bvar = residuals
    g_out, g_mean, g_var = cotangents
    b, h, wd, c = x.shape
    rows = b * h * wd
    n = jnp.float32(rows)
    x2 = x.reshape(rows, c)
    g2 = g_out.reshape(rows, c)

    inv = jax.lax.rsqrt(bvar + EPS)
    isc = inv * scale.astype(jnp.float32)
    bias_f = bias.astype(jnp.float32)
    sums = _bwd_reduce_noise(
        x2, g2, n_l.reshape(rows, 1), n_g.reshape(rows, 1),
        bmean, isc, bias_f, inv, cl, interpret,
    )
    s1, s2, s3 = sums[0], sums[1], sums[2]

    # g_mean/g_var arrive as zero arrays when unused (custom_vjp
    # materializes output cotangents; symbolic zeros are not enabled)
    a = isc
    p = (-a * s1 + g_mean.astype(jnp.float32)) / n
    q = (-a * inv * s2 + 2.0 * g_var.astype(jnp.float32)) / n
    dx2, dnl2, dng2 = _bwd_dx_noise(
        x2, g2, bmean, isc, bias_f, a, p, q, w.astype(jnp.float32), cl,
        interpret,
    )
    return (
        dx2.reshape(x.shape),
        s2.astype(scale.dtype),
        s1.astype(bias.dtype),
        s3.astype(w.dtype),
        dnl2.reshape(n_l.shape),
        dng2.reshape(n_g.shape),
    )


packed_bn_gelu_noise.defvjp(_fwd_noise, _bwd_noise)


# --- dispatcher used by nn/ffc.py -------------------------------------------------


def use_fused_bn_gelu(x) -> bool:
    """True when the fused kernels should run for this array: opt-in
    flag + shape legality + the tanh-GELU policy actually applying
    (the jnp chain and the kernel both use the tanh form; f32 runs
    default to exact erf, so they stay on the jnp path unless the
    fast-GELU override forces tanh globally)."""
    if not _ENABLED:
        return False
    if not fused_shape_legal(x.shape, x.dtype):
        return False
    from ...nn.layers import gelu_is_fast

    return gelu_is_fast(x.dtype)


def fused_bn_gelu(x, scale, bias):
    """Dispatch wrapper: Pallas (compiled on TPU, interpreted off-TPU)."""
    return packed_bn_gelu(x, scale, bias, _interpret_default())


def fused_bn_gelu_noise(x, scale, bias, w, n_l, n_g, cl):
    """Dispatch wrapper for the noise-folded variant."""
    return packed_bn_gelu_noise(
        x, scale, bias, w, n_l, n_g, cl, _interpret_default()
    )
