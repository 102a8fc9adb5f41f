"""NHWC convolution primitives with PyTorch-compatible geometry.

The reference uses ``nn.Conv2d`` / ``nn.ConvTranspose2d`` (NCHW, cuDNN)
everywhere (e.g. reference layers/ffc/ffc.py:44-70,
layers/ffc/ffc_transpose.py:52-86). Here convolutions are pure functions
over NHWC activations and HWIO kernels, lowered through
``lax.conv_general_dilated`` so XLA tiles them onto the MXU.

"PyTorch-compatible geometry" means identical output shapes for the same
(kernel, stride, padding, dilation, output_padding) hyper-parameters:

  conv:   out = floor((in + 2p - d*(k-1) - 1)/s) + 1
  convT:  out = (in-1)*s - 2p + d*(k-1) + output_padding + 1

Weight-tensor layout/orientation is *not* torch-compatible (we never load
torch weights); the transpose conv is expressed directly as an
input-dilated convolution, which is its natural XLA form.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        assert len(v) == 2
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


# Lane-starved output heads (e.g. the generators' to_rgb convs: C -> 3
# RGB channels on large maps) hit a pathological TPU conv emitter: 3
# output channels against 128-wide lanes runs the op ~10x below
# bandwidth (profiled: the two 64->3 convs + their grads were ~30% of
# the whole fgan128 train step). ``tapmix`` reformulates a stride-1
# small-C_out conv as one dense channel-mix matmul x @ K(ci, k*k*co)
# (healthy MXU shape) followed by k*k shifted adds (pure VPU), which is
# mathematically identical. Heuristic gate below; measured ~1.5-2.7x on
# the affected shapes in-context, neutral-to-slightly-negative on tiny
# maps, hence the h*w floor.
import os as _os

_TAPMIX = _os.environ.get("FFC_TPU_TAPMIX", "1") != "0"  # A/B switch
# Store the per-tap partials bf16 instead of f32 (halves the bytes of
# the tap-accumulation fusion — the 128px profile's add_tanh_fusion —
# at one extra bf16 rounding per partial vs the direct conv's single
# f32 MXU accumulation). Measured on TPU v5e (RUNS/convt_ab_r3.json,
# fgan128 step, batch 64): 85.25 ms vs 87.03 ms (+2.1% img/s). Default
# "policy": bf16 partials exactly when the compute policy is bf16 (the
# operands are then already bf16, so the extra rounding is
# policy-consistent); f32-policy runs (numerics/parity tests) keep f32
# partials. Env/setter override: 0 forces f32, 1 forces bf16.
_TAPMIX_BF16 = _os.environ.get("FFC_TPU_TAPMIX_BF16", "policy")


def set_tapmix_enabled(enabled: bool) -> None:
    global _TAPMIX
    _TAPMIX = bool(enabled)


def set_tapmix_bf16(mode) -> None:
    """mode: True/1 force bf16 partials, False/0 force f32, "policy"
    (default) = bf16 iff the compute policy is bf16."""
    global _TAPMIX_BF16
    _TAPMIX_BF16 = mode if mode == "policy" else ("1" if mode and mode != "0" else "0")


def _tapmix_bf16_active() -> bool:
    if _TAPMIX_BF16 == "policy":
        from ..utils.policy import compute_dtype

        return compute_dtype() == jnp.bfloat16
    return _TAPMIX_BF16 != "0"


def _tapmix_applicable(x, kernel, sh, sw, ph, pw, dh, dw, groups) -> bool:
    kh, kw, ci, co = kernel.shape
    return (
        _TAPMIX
        and (sh, sw) == (1, 1)
        and (dh, dw) == (1, 1)
        and groups == 1
        and co <= 4
        and kh * kw > 1
        and ci >= 8 * co
        and x.shape[1] * x.shape[2] >= 64 * 64
    )


def _conv2d_tapmix(x, kernel, ph, pw):
    """Stride-1 conv as channel-mix matmul + kh*kw shifted adds (exact).

    The mix matrix's output dim is padded up to a multiple of 8 lanes
    and the tap array is kept FLAT (channel-group slices instead of a
    5-D reshape): the round-3 128px trace showed the unpadded
    (1M, 27) matmul running at 94 GB/s and the (.., 9, 3) reshape
    relayouting at 56 GB/s; the padded+flat form measured 2.72 ms vs
    3.09 ms fwd+bwd on the (64,128,128,128)->3 to_rgb shape (TPU v5e).
    Zero pad columns are sliced off before use — bit-identical math.
    """
    b, h, w, ci = x.shape
    kh, kw, _, co = kernel.shape
    oh = h + 2 * ph - kh + 1
    ow = w + 2 * pw - kw + 1
    n = kh * kw * co
    n_pad = -(-n // 8) * 8
    km = kernel.transpose(2, 0, 1, 3).reshape(ci, n)
    if n_pad != n:
        km = jnp.zeros((ci, n_pad), km.dtype).at[:, :n].set(km)
    # default keeps the per-tap partials in f32: downcasting them to bf16
    # before the tap accumulation adds a rounding step the direct conv
    # (one f32 MXU accumulation over ci AND taps) does not have; the
    # bf16 store is the opt-in bandwidth variant (gate above)
    z = jnp.dot(
        x.reshape(b * h * w, ci), km, preferred_element_type=jnp.float32
    )
    if _tapmix_bf16_active():
        z = z.astype(jnp.bfloat16)
    z = z[:, :n].reshape(b, h, w, n)
    zp = jnp.pad(z, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    y = jnp.zeros((b, oh, ow, co), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            t = dy * kw + dx
            y = y + zp[
                :, dy : dy + oh, dx : dx + ow, t * co : (t + 1) * co
            ].astype(jnp.float32)
    return y


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride=1,
    padding=0,
    dilation=1,
    groups: int = 1,
    precision=None,
    preferred_element_type=jnp.float32,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC.

    ``padding`` is symmetric integer padding per spatial dim (torch style).
    ``precision=None`` uses the backend default (bf16-through-MXU on TPU —
    the fast training path); pass ``'highest'`` for full f32.
    """
    from ..utils.policy import cast_compute, compute_dtype

    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    if precision is None:
        x, kernel = cast_compute(x), cast_compute(kernel)
        if x.dtype != jnp.float32:
            # a widening preferred_element_type breaks the conv transpose
            # (gradient) rule with bf16 operands; MXU accumulation is f32
            # internally regardless, so emit the operand dtype directly
            preferred_element_type = None
    if precision is None and _tapmix_applicable(
        x, kernel, sh, sw, ph, pw, dh, dw, groups
    ):
        return _conv2d_tapmix(x, kernel, ph, pw).astype(compute_dtype())
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMSPEC,
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=preferred_element_type,
    )
    return out.astype(compute_dtype()) if precision is None else out


# conv-transpose lowering selector. "lhs" is XLA's input-dilated form;
# its TPU lowering spends real time on data-formatting copies and
# kernel reverses (the 128px profile: 8.5 ms copies + 1.9 ms reverse
# per 86 ms step, BASELINE.md top-5 sinks). "subpixel" decomposes a
# stride-s convT into s*s stride-1 phase convolutions + interleave
# (exact, same FLOPs); "fusedk" embeds all phases into ONE stride-1
# conv with s*s*Co outputs + depth-to-space (lane-dense MXU shape,
# ceil(k/s)^2*s^2/k^2 x the FLOPs). Measured in-context on TPU v5e
# (RUNS/convt_ab_r3.json — fgan train step, batch 64):
#
#   res   lhs          subpixel      fusedk
#   128   735 img/s    599 (-18.6%)  602 (-18.1%)
#    32   21679 img/s  19983 (-7.8%) 17561 (-19.0%)
#
# lhs wins decisively at both resolutions: the alternates' extra HBM
# traffic (phase interleave / depth-to-space writes: 83/75 GB vs 62 GB
# per 128px step) costs more than the formatting copies they remove,
# and fusedk's +27% FLOPs never pay for themselves. The lever is
# CLOSED — "lhs" stays the default; the alternates remain behind the
# env gate for hardware where the copy/bandwidth ratio differs.
_CONVT_MODE = _os.environ.get("FFC_TPU_CONVT", "lhs")


def set_convt_mode(mode: str) -> None:
    assert mode in ("lhs", "subpixel", "fusedk"), mode
    global _CONVT_MODE
    _CONVT_MODE = mode


def _phase_taps(k: int, s: int, pad: int, a: int):
    """Phase-a decomposition of a 1-D stride-s transposed correlation.

    out[m] = sum_r xd_pad[m+r] K[r] with xd the s-dilated, pad-padded
    input. For m = s*q + a the taps satisfy r === (pad - a) (mod s) and
    hit x[q + (a + r - pad)//s] — consecutive input offsets. Returns
    (r0, n_taps, base) with base the first input offset.
    """
    r0 = (pad - a) % s
    n = (k - r0 + s - 1) // s
    base = (a + r0 - pad) // s
    return r0, n, base


def _convt_phase_geometry(h: int, k: int, s: int, p: int, op: int):
    """Per-phase (pl, pr) paddings for equal-length phase outputs, or
    None if the decomposition doesn't tile evenly."""
    pad = k - 1 - p
    out_len = (h - 1) * s - 2 * p + k + op
    if out_len % s != 0:
        return None
    n_out = out_len // s
    geo = []
    for a in range(s):
        r0, n_taps, base = _phase_taps(k, s, pad, a)
        if n_taps == 0:
            return None
        pl = -base
        pr = (n_out - 1 + base + n_taps - 1) - (h - 1)
        if pl < 0 or pr < 0:
            return None  # would need input cropping; fall back
        geo.append((r0, n_taps, pl, pr))
    return out_len, geo


def _conv_transpose2d_subpixel(x, kernel, s, ph, pw, oph, opw):
    """Exact stride-s convT as s*s stride-1 phase convs + interleave."""
    b, h, w, ci = x.shape
    kh, kw, _, co = kernel.shape
    gh = _convt_phase_geometry(h, kh, s, ph, oph)
    gw = _convt_phase_geometry(w, kw, s, pw, opw)
    oh, geo_h = gh
    ow, geo_w = gw
    rows = []
    for a, (r0a, na, pla, pra) in enumerate(geo_h):
        cols = []
        for bb, (r0b, nb, plb, prb) in enumerate(geo_w):
            kk = kernel[r0a::s][:na, r0b::s][:, :nb]
            cols.append(
                lax.conv_general_dilated(
                    x,
                    kk,
                    window_strides=(1, 1),
                    padding=((pla, pra), (plb, prb)),
                    dimension_numbers=_DIMSPEC,
                )
            )
        rows.append(jnp.stack(cols, axis=-2))  # (b, oh/s, ow/s, s, co)
    y = jnp.stack(rows, axis=-3)  # (b, oh/s, ow/s, s_h, s_w, co)
    y = y.reshape(b, oh // s, ow // s, s, s, co)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, oh, ow, co)


def _conv_transpose2d_fusedk(x, kernel, s, ph, pw, oph, opw):
    """Exact stride-s convT as ONE stride-1 conv with s*s*Co outputs
    (phase sub-kernels embedded in a shared window) + depth-to-space.
    Lane-dense on the MXU at the cost of the zero-embedded taps'
    extra FLOPs (2.25x for k=4, s=2)."""
    b, h, w, ci = x.shape
    kh, kw, _, co = kernel.shape
    oh, geo_h = _convt_phase_geometry(h, kh, s, ph, oph)
    ow, geo_w = _convt_phase_geometry(w, kw, s, pw, opw)
    # common window span per dim: phase a's taps sit at input offsets
    # [-pl_a, -pl_a + n_a - 1]; shift into a window starting at -PL
    PLh = max(g[2] for g in geo_h)
    PLw = max(g[2] for g in geo_w)
    Lh = max(g[1] + (PLh - g[2]) for g in geo_h)
    Lw = max(g[1] + (PLw - g[2]) for g in geo_w)
    PRh = (oh // s - 1) + (Lh - 1 - PLh) - (h - 1)
    PRw = (ow // s - 1) + (Lw - 1 - PLw) - (w - 1)
    kbig = jnp.zeros((Lh, Lw, ci, s * s * co), kernel.dtype)
    for a, (r0a, na, pla, _) in enumerate(geo_h):
        for bb, (r0b, nb, plb, _) in enumerate(geo_w):
            sub = kernel[r0a::s][:na, r0b::s][:, :nb]
            kbig = lax.dynamic_update_slice(
                kbig,
                sub,
                (PLh - pla, PLw - plb, 0, (a * s + bb) * co),
            )
    y = lax.conv_general_dilated(
        x,
        kbig,
        window_strides=(1, 1),
        padding=((PLh, max(PRh, 0)), (PLw, max(PRw, 0))),
        dimension_numbers=_DIMSPEC,
    )
    y = y.reshape(b, oh // s, ow // s, s, s, co)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, oh, ow, co)


def _convt_alt_applicable(x, kernel, sh, sw, dh, dw, groups, ph, pw,
                          oph, opw) -> bool:
    if _CONVT_MODE == "lhs" or sh != sw or sh <= 1:
        return False
    if (dh, dw) != (1, 1) or groups != 1:
        return False
    kh, kw = kernel.shape[0], kernel.shape[1]
    return (
        _convt_phase_geometry(x.shape[1], kh, sh, ph, oph) is not None
        and _convt_phase_geometry(x.shape[2], kw, sw, pw, opw) is not None
    )


def conv_transpose2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride=1,
    padding=0,
    output_padding=0,
    dilation=1,
    groups: int = 1,
    precision=None,
    preferred_element_type=jnp.float32,
) -> jax.Array:
    """2-D transposed convolution with torch output-shape semantics.

    Expressed as an input-dilated ("fractionally strided") convolution:
    the input is dilated by ``stride`` and convolved with the kernel at
    stride 1 using padding ``d*(k-1) - p`` (+ ``output_padding`` on the
    trailing edge), which reproduces
    ``out = (in-1)*s - 2p + d*(k-1) + output_padding + 1`` exactly.

    ``kernel`` is HWIO with I = x's channel count and O = output channels
    (already in forward orientation — no flipping needed, since weights
    are trained in this parameterisation from scratch).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    dh, dw = _pair(dilation)
    from ..utils.policy import cast_compute, compute_dtype

    kh, kw = kernel.shape[0], kernel.shape[1]
    pad_h = dh * (kh - 1) - ph
    pad_w = dw * (kw - 1) - pw
    assert pad_h >= 0 and pad_w >= 0, (
        "conv_transpose2d requires d*(k-1) >= padding "
        f"(got k={(kh, kw)}, d={(dh, dw)}, p={(ph, pw)})"
    )
    if precision is None:
        x, kernel = cast_compute(x), cast_compute(kernel)
        if x.dtype != jnp.float32:
            preferred_element_type = None  # see conv2d note
    if precision is None and _convt_alt_applicable(
        x, kernel, sh, sw, dh, dw, groups, ph, pw, oph, opw
    ):
        fn = (
            _conv_transpose2d_subpixel
            if _CONVT_MODE == "subpixel"
            else _conv_transpose2d_fusedk
        )
        return fn(x, kernel, sh, ph, pw, oph, opw).astype(compute_dtype())
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((pad_h, pad_h + oph), (pad_w, pad_w + opw)),
        lhs_dilation=(sh, sw),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMSPEC,
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=preferred_element_type,
    )
    return out.astype(compute_dtype()) if precision is None else out


def avg_pool2d(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """Average pooling (reference SpectralTransform downsample,
    layers/ffc/spectral_transform.py:47)."""
    out = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return out / float(window * window)


def upsample_nearest2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour x2 upsample (reference
    layers/ffc/spectral_transform.py:45 ``nn.Upsample(scale_factor=2)``)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


@functools.lru_cache(maxsize=32)
def _bilinear_up_matrix(n: int, scale: int) -> np.ndarray:
    """(scale*n, n) torch-style bilinear weights (half-pixel centers,
    align_corners=False) — the F.interpolate semantics the SNGAN GBlock
    upsample uses (reference fgan128_complete.py:152-157)."""
    out = scale * n
    idx = np.arange(out, dtype=np.float64)
    src = (idx + 0.5) / scale - 0.5
    lo = np.clip(np.floor(src), 0, n - 1).astype(np.int64)
    hi = np.minimum(lo + 1, n - 1)
    frac = np.clip(src - lo, 0.0, 1.0)
    w = np.zeros((out, n), dtype=np.float64)
    w[np.arange(out), lo] += 1.0 - frac
    w[np.arange(out), hi] += frac
    return w.astype(np.float32)


def upsample_bilinear_torch(x: jax.Array, scale: int = 2) -> jax.Array:
    """NHWC bilinear upsample with torch align_corners=False semantics,
    as two separable matmuls (MXU-resident, exact)."""
    h, w = x.shape[1], x.shape[2]
    wh = jnp.asarray(_bilinear_up_matrix(h, scale))
    ww = jnp.asarray(_bilinear_up_matrix(w, scale))
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bhwc->bhpc", ww, x)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """NHWC -> NC global average (reference SELayer's AdaptiveAvgPool2d(1),
    layers/ffc/spectral_transform.py:14)."""
    return jnp.mean(x, axis=(1, 2))
