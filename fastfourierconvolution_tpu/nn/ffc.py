"""Fast Fourier Convolution layers (Chi et al., NeurIPS 2020), TPU-native.

Behavioral contract from the reference (layers/ffc/*.py), re-designed for
XLA/TPU:

  * the local/global signal is a ``(x_l, x_g)`` tuple where an absent
    branch is ``None`` (the reference uses the scalar ``0``),
  * channel-split arithmetic is exactly ``in_cg = int(in_ch * ratio_gin)``
    etc. (reference layers/ffc/ffc.py:33-36),
  * the FourierUnit runs rfft2(ortho) -> stacked re/im channel mix (a
    (2C, 2C) matmul on the MXU) -> BN -> ReLU -> irfft2 (reference
    layers/ffc/fourier_unity.py:32-58),
  * SpectralTransform: optional stride-2 resample (AvgPool down / nearest
    x2 up), SELayer gate on its input, 1x1 conv C->C/2 + BN + ReLU,
    FourierUnit, residual 1x1 conv C/2->C on (x + fu(x)) (reference
    layers/ffc/spectral_transform.py:77-109). The LFU branch is
    constructed-but-disabled in the reference; here it is an explicit
    ``enable_lfu`` flag that actually works when turned on.
  * FFC / FFCTranspose: four cross-gating branches l2l/l2g/g2l (k x k
    convs or transposed convs) and g2g (SpectralTransform), elided when a
    side has zero channels (reference layers/ffc/ffc.py:44-99,
    ffc_transpose.py:52-110).
  * FFC_BN_ACT: FFC -> per-branch (conditional) BN -> per-branch
    activation (reference layers/ffc/ffc_bn_act.py:40-82). ``use_sn``
    applies spectral norm to the conv branches — note the reference's
    ``uses_sn`` flag is accepted but unused there (ffc_bn_act.py:30,39);
    here it is functional, default off for parity.

Layout note: re/im spectral channels are concatenated [re | im] instead of
the reference's per-channel interleave — equivalent up to a fixed
permutation of the (randomly initialised) mix-kernel rows/columns.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import conv as conv_ops
from ..ops import fourier
from .layers import (
    ACTIVATIONS,
    BatchNorm,
    BatchNormHolder,
    ConditionalBatchNorm,
    Conv2d,
    ConvKernelHolder,
    ConvTranspose2d,
    SELayer,
    SNConv2d,
    SNConvTranspose2d,
    conv_init,
)

Branch = Optional[jax.Array]
BranchPair = Tuple[Branch, Branch]


def split_channels(channels: int, ratio: float) -> Tuple[int, int]:
    """(local, global) channel counts — exact reference arithmetic
    (layers/ffc/ffc.py:33-36)."""
    c_g = int(channels * ratio)
    return channels - c_g, c_g


class Packed(NamedTuple):
    """Packed-branch FFC signal: local and global branches stored as ONE
    ``(B, H, W, cl+cg)`` array (``[local | global]`` on the channel axis).

    Why: the 128px ladder's branch maps are 64-channel — exactly half a
    TPU lane register — so every conv and elementwise fusion on separate
    branches runs at ~50% lane density (profiled round 2: loop fusions at
    323 GB/s of an 819 GB/s roofline, BASELINE.md top-5 sinks). Packing
    keeps the channel-minor dimension full: the three conv branches
    become one block-structured convolution (the g->g block is zero —
    the spectral transform covers it) and the BN/noise/activation chain
    runs once over the full-width array. Mathematically identical to the
    tuple path (BN statistics are per-channel; the reference's Resizer
    concat is this very layout, reference layers/resizer.py:15-24).
    ``cl`` is the static local-channel count.
    """

    x: jax.Array
    cl: int


def packed_enabled(default: bool = False) -> bool:
    """Env gate for the packed-branch execution mode (A/B'd on chip like
    FFC_TPU_CONVT / FFC_TPU_TAPMIX; read at trace time). When
    ``FFC_TPU_PACKED`` is unset the caller-supplied ``default`` decides —
    models gate it on map size per the measured A/B
    (RUNS/packed_ab_r3.json: +14.5% img/s at 128px, -11% at 32px where
    the working set is VMEM-resident and the pack/slice overhead has no
    lane-density win to pay for it)."""
    v = os.environ.get("FFC_TPU_PACKED")
    if v is None:
        return default
    return v == "1"


class FourierUnit(nn.Module):
    """Spectral-domain channel mixer — the hot inner kernel.

    rfft2(ortho) over (H, W); re/im concatenated to 2C channels; bias-free
    (2C, 2C) channel mix (the reference's 1x1 Conv2d, fourier_unity.py:45)
    computed as a single MXU matmul; BN + ReLU in the spectral domain;
    irfft2 back to (H, W). With ``impl="dft"`` the transforms themselves
    are MXU matmuls, so the entire unit is matmuls + one BN — XLA fuses
    the elementwise tail.
    """

    channels: int  # in == out in every reference use
    num_classes: int = 0
    impl: Optional[str] = None
    fused: bool = True  # fused op with rematerialising custom VJP

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool, y: Optional[jax.Array] = None
    ) -> jax.Array:
        from ..utils.policy import cast_compute

        h, w = x.shape[1], x.shape[2]
        c2 = 2 * self.channels
        kernel = self.param("mix_kernel", conv_init, (c2, c2))

        # The conditional variant (class-conditional BN in the spectral
        # domain) keys its parameter layout off static config only, so
        # the tree never depends on whether a label was passed at trace
        # time — labels are required when num_classes > 1.
        if self.num_classes > 1:
            assert y is not None, (
                "FourierUnit(num_classes>1) requires labels y"
            )
            f_r, f_i = fourier.rfft2_ortho(x, impl=self.impl)
            z = jnp.concatenate([f_r, f_i], axis=-1)  # (B, H, Wf, 2C)
            z = jnp.einsum(
                "bhvc,cd->bhvd",
                cast_compute(z),
                cast_compute(kernel),
                preferred_element_type=jnp.float32,
            ).astype(z.dtype)
            z = ConditionalBatchNorm(self.num_classes)(z, y, train)
            z = nn.relu(z)
            f_r, f_i = z[..., : self.channels], z[..., self.channels :]
            return fourier.irfft2_ortho(f_r, f_i, s=(h, w), impl=self.impl)

        # Unconditional path: ONE flat parameter layout (mix_kernel +
        # bn_scale/bn_bias params, batch_stats mean/var) regardless of
        # which transform impl resolves or whether the fused op runs —
        # checkpoints are loadable across backends (the reference's
        # torch checkpoints are likewise layout-stable across devices,
        # models/ffcmodel.py:31-64).
        from ..nn.layers import bn_scale_init
        from ..ops.fourier import resolve_impl
        from ..ops.pallas.fourier_unit import EPS, fourier_unit_fused

        scale = self.param("bn_scale", bn_scale_init, (c2,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c2,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c2,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c2,), jnp.float32)
        )

        if self.fused and resolve_impl(self.impl) != "fft":
            # Single op: DFT -> mix -> BN -> ReLU -> iDFT with a
            # rematerialising backward (residual = x only). BN state is
            # managed here with flax-BatchNorm-compatible semantics
            # (momentum 0.9, biased variance).
            xc = cast_compute(x)
            y_out, bmean, bvar = fourier_unit_fused(
                xc, cast_compute(kernel), scale, bias,
                ra_mean.value, ra_var.value, train,
            )
        else:
            f_r, f_i = fourier.rfft2_ortho(x, impl=self.impl)
            z = jnp.concatenate([f_r, f_i], axis=-1)  # (B, H, Wf, 2C)
            m = jnp.einsum(
                "bhvc,cd->bhvd",
                cast_compute(z),
                cast_compute(kernel),
                preferred_element_type=jnp.float32,
            )
            # manual BN over the flat params — same math/dtype contract
            # as the fused op (f32 stats, biased variance, eps 1e-5)
            mf = m.astype(jnp.float32)
            if train:
                bmean = jnp.mean(mf, axis=(0, 1, 2))
                bvar = jnp.mean(mf**2, axis=(0, 1, 2)) - bmean**2
            else:
                bmean, bvar = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(bvar + EPS)
            pre = (mf - bmean) * inv * scale.astype(jnp.float32) + bias.astype(
                jnp.float32
            )
            r = jnp.maximum(pre, 0.0).astype(z.dtype)
            f_r, f_i = r[..., : self.channels], r[..., self.channels :]
            y_out = fourier.irfft2_ortho(f_r, f_i, s=(h, w), impl=self.impl)

        if train and not self.is_initializing():
            mom = 0.9
            ra_mean.value = mom * ra_mean.value + (1 - mom) * bmean
            ra_var.value = mom * ra_var.value + (1 - mom) * bvar
        return y_out


class SpectralTransform(nn.Module):
    """Wraps the FourierUnit with resampling, SE gate and 1x1 bottleneck
    (reference layers/ffc/spectral_transform.py:31-110)."""

    out_channels: int
    stride: int = 1
    groups: int = 1
    enable_lfu: bool = False
    upsample: bool = False
    num_classes: int = 0
    use_se: bool = True
    impl: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool, y: Optional[jax.Array] = None
    ) -> jax.Array:
        if self.stride == 2:
            x = (
                conv_ops.upsample_nearest2x(x)
                if self.upsample
                else conv_ops.avg_pool2d(x)
            )
        if self.use_se:
            x = SELayer()(x)
        half = self.out_channels // 2
        x = Conv2d(half, 1, groups=self.groups, use_bias=False)(x)
        x = BatchNorm()(x, train)
        x = nn.relu(x)

        out = FourierUnit(half, num_classes=self.num_classes, impl=self.impl)(
            x, train, y
        )

        if self.enable_lfu:
            # Local Fourier Unit: quarter channels, 2x2 spatial patches
            # folded into channels, FourierUnit, tiled back — the original
            # FFC-paper recipe. The reference constructs the LFU but its
            # forward use is commented out (spectral_transform.py:94-105);
            # here the flag actually works (default off for parity).
            c = x.shape[-1]
            split = 2
            assert c % 4 == 0, (
                f"enable_lfu needs the bottleneck channel count ({c}) "
                f"divisible by 4"
            )
            assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, (
                f"enable_lfu needs even spatial dims, got {x.shape[1:3]}"
            )
            xs = x[..., : c // 4]
            xs = jnp.concatenate(jnp.split(xs, split, axis=1), axis=-1)
            xs = jnp.concatenate(jnp.split(xs, split, axis=2), axis=-1)
            xs = FourierUnit(c, impl=self.impl, name="lfu")(xs, train)
            xs = jnp.tile(xs, (1, split, split, 1))
        else:
            xs = 0.0

        out = Conv2d(self.out_channels, 1, groups=self.groups, use_bias=False)(
            x + out + xs
        )
        return out


def _assemble_block_kernel(
    mod, kl2l, kl2g, kg2l
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """One (k, k, cl_in+cg_in, cl_out+cg_out) kernel computing
    ``[l2l(x_l)+g2l(x_g) | l2g(x_l)]`` in a single lane-dense conv; the
    g->g block is zero (the spectral path adds that contribution). Bias
    columns sum the way two separate biased convs into the same output
    would."""
    k = mod.kernel_size
    cl_in, cg_in = mod.in_cl, mod.in_cg
    out_cl, out_cg = mod.out_cl, mod.out_cg

    def pieces(holder):
        return holder() if holder is not None else (None, None)

    k_l2l, b_l2l = pieces(kl2l)
    k_l2g, b_l2g = pieces(kl2g)
    k_g2l, b_g2l = pieces(kg2l)
    some = k_l2l if k_l2l is not None else (
        k_l2g if k_l2g is not None else k_g2l
    )
    dt = some.dtype

    rows = []
    if cl_in > 0:
        cols = []
        if out_cl > 0:
            cols.append(k_l2l)
        if out_cg > 0:
            cols.append(k_l2g)
        rows.append(jnp.concatenate(cols, axis=3) if len(cols) > 1 else cols[0])
    if cg_in > 0:
        cols = []
        if out_cl > 0:
            cols.append(k_g2l)
        if out_cg > 0:
            cols.append(jnp.zeros((k, k, cg_in, out_cg), dt))
        rows.append(jnp.concatenate(cols, axis=3) if len(cols) > 1 else cols[0])
    kernel = jnp.concatenate(rows, axis=2) if len(rows) > 1 else rows[0]

    bias = None
    if mod.use_bias:
        b_l = None
        if out_cl > 0:
            b_l = _add_opt(b_l2l, b_g2l)
            if b_l is None:
                b_l = jnp.zeros((out_cl,), dt)
        b_g = None
        if out_cg > 0:
            b_g = b_l2g if b_l2g is not None else jnp.zeros((out_cg,), dt)
        parts = [b for b in (b_l, b_g) if b is not None]
        bias = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return kernel, bias


def _packed_ffc_call(mod, p: Packed, train: bool, y, conv_fn) -> Packed:
    """Shared packed forward for FFC / FFCTranspose: one block conv +
    the spectral g->g contribution added into the global slice."""
    x = p.x
    cl_in, cg_in = mod.in_cl, mod.in_cg
    out_cl, out_cg = mod.out_cl, mod.out_cg
    assert p.cl == cl_in and x.shape[-1] == cl_in + cg_in, (
        f"packed input has cl={p.cl}, C={x.shape[-1]}; "
        f"expected ({cl_in}, {cl_in + cg_in})"
    )
    kernel, bias = _assemble_block_kernel(
        mod, mod.convl2l, mod.convl2g, mod.convg2l
    )
    out = conv_fn(x, kernel)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    if mod.convg2g is not None and cg_in > 0 and out_cg > 0:
        s = mod.convg2g(x[..., cl_in:], train, y)
        if out_cl > 0:
            out = jnp.concatenate(
                [out[..., :out_cl], out[..., out_cl:] + s], axis=-1
            )
        else:
            out = out + s
    return Packed(out, out_cl)


class FFC(nn.Module):
    """The FFC layer: local/global split with four cross-gating branches
    (reference layers/ffc/ffc.py:10-99)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    enable_lfu: bool = False
    num_classes: int = 0
    # class-conditional BN inside the spectral FourierUnit. The
    # reference's only WORKING conditional BN is the per-branch
    # bn_l/bn_g (ffc_bn_act.py:56-58); its FourierUnit conditional path
    # is dead code that crashes if exercised (fourier_unity.py:25-28,47
    # — plain BatchNorm2d called with a label). Default False = the
    # reference's working semantics; True is a beyond-reference opt-in.
    cond_spectral_bn: bool = False
    use_sn: bool = False
    impl: Optional[str] = None
    packed: bool = False  # packed-branch mode (see Packed)

    def setup(self):
        assert self.stride in (1, 2), "Stride should be 1 or 2."
        in_cl, in_cg = split_channels(self.in_channels, self.ratio_gin)
        out_cl, out_cg = split_channels(self.out_channels, self.ratio_gout)
        self.in_cl, self.in_cg = in_cl, in_cg
        self.out_cl, self.out_cg = out_cl, out_cg
        if self.packed:
            assert not self.use_sn and self.groups == 1, (
                "packed mode supports groups=1, use_sn=False only"
            )

        def make_conv(cin, cout, name):
            if cin == 0 or cout == 0:
                return None
            if self.packed:
                return ConvKernelHolder(
                    cin,
                    cout,
                    self.kernel_size,
                    use_bias=self.use_bias,
                    name=name,
                )
            if self.use_sn:
                # SNConv2d carries no dilation/groups — refuse rather
                # than silently training a different function
                assert self.dilation == 1 and self.groups == 1, (
                    "use_sn=True supports dilation=1, groups=1 only"
                )
                return SNConv2d(
                    cout,
                    self.kernel_size,
                    stride=self.stride,
                    padding=self.padding,
                    use_bias=self.use_bias,
                    name=name,
                )
            return Conv2d(
                cout,
                self.kernel_size,
                stride=self.stride,
                padding=self.padding,
                dilation=self.dilation,
                groups=self.groups,
                use_bias=self.use_bias,
                name=name,
            )

        self.convl2l = make_conv(in_cl, out_cl, "convl2l")
        self.convl2g = make_conv(in_cl, out_cg, "convl2g")
        self.convg2l = make_conv(in_cg, out_cl, "convg2l")
        if in_cg > 0 and out_cg > 0:
            self.convg2g = SpectralTransform(
                out_cg,
                stride=self.stride,
                groups=1 if self.groups == 1 else self.groups // 2,
                enable_lfu=self.enable_lfu,
                upsample=False,
                num_classes=(
                    self.num_classes if self.cond_spectral_bn else 0
                ),
                impl=self.impl,
                name="convg2g",
            )
        else:
            self.convg2g = None

    def _run(self, branch, x, train):
        if branch is None or x is None:
            return None
        if isinstance(branch, SNConv2d):
            return branch(x, train)
        return branch(x)

    def __call__(
        self, x, train: bool, y: Optional[jax.Array] = None
    ) -> BranchPair:
        if self.packed:
            assert isinstance(x, Packed), "packed FFC expects Packed input"
            return _packed_ffc_call(
                self,
                x,
                train,
                y,
                lambda v, k: conv_ops.conv2d(
                    v,
                    k,
                    stride=self.stride,
                    padding=self.padding,
                    dilation=self.dilation,
                ),
            )
        x_l, x_g = x if isinstance(x, tuple) else (x, None)
        out_l, out_g = None, None
        if self.ratio_gout != 1:
            a = self._run(self.convl2l, x_l, train)
            b = self._run(self.convg2l, x_g, train)
            out_l = _add_opt(a, b)
        if self.ratio_gout != 0:
            a = self._run(self.convl2g, x_l, train)
            b = (
                self.convg2g(x_g, train, y)
                if (self.convg2g is not None and x_g is not None)
                else None
            )
            out_g = _add_opt(a, b)
        return out_l, out_g


class FFCTranspose(nn.Module):
    """Upsampling twin of FFC: transposed convs on the conv branches and a
    nearest-x2 SpectralTransform on g2g (reference
    layers/ffc/ffc_transpose.py:10-110)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    enable_lfu: bool = False
    num_classes: int = 0
    cond_spectral_bn: bool = False  # see FFC.cond_spectral_bn
    use_sn: bool = False
    impl: Optional[str] = None
    packed: bool = False  # packed-branch mode (see Packed)

    def setup(self):
        assert self.stride in (1, 2), "Stride should be 1 or 2."
        in_cl, in_cg = split_channels(self.in_channels, self.ratio_gin)
        out_cl, out_cg = split_channels(self.out_channels, self.ratio_gout)
        self.in_cl, self.in_cg = in_cl, in_cg
        self.out_cl, self.out_cg = out_cl, out_cg
        if self.packed:
            assert not self.use_sn and self.groups == 1, (
                "packed mode supports groups=1, use_sn=False only"
            )

        def make_convt(cin, cout, name):
            if cin == 0 or cout == 0:
                return None
            if self.packed:
                return ConvKernelHolder(
                    cin,
                    cout,
                    self.kernel_size,
                    use_bias=self.use_bias,
                    name=name,
                )
            if self.use_sn:
                # the working SN-transpose semantics (the reference's
                # SNFFCTranspose is broken as checked in, SURVEY §1)
                return SNConvTranspose2d(
                    cout,
                    self.kernel_size,
                    stride=self.stride,
                    padding=self.padding,
                    output_padding=self.output_padding,
                    use_bias=self.use_bias,
                    name=name,
                )
            return ConvTranspose2d(
                cout,
                self.kernel_size,
                stride=self.stride,
                padding=self.padding,
                output_padding=self.output_padding,
                dilation=self.dilation,
                groups=self.groups,
                use_bias=self.use_bias,
                name=name,
            )

        self.convl2l = make_convt(in_cl, out_cl, "convl2l")
        self.convl2g = make_convt(in_cl, out_cg, "convl2g")
        self.convg2l = make_convt(in_cg, out_cl, "convg2l")
        if in_cg > 0 and out_cg > 0:
            self.convg2g = SpectralTransform(
                out_cg,
                stride=self.stride,
                groups=1 if self.groups == 1 else self.groups // 2,
                enable_lfu=self.enable_lfu,
                upsample=True,
                num_classes=(
                    self.num_classes if self.cond_spectral_bn else 0
                ),
                impl=self.impl,
                name="convg2g",
            )
        else:
            self.convg2g = None

    def _run(self, branch, x, train):
        if branch is None or x is None:
            return None
        if isinstance(branch, SNConvTranspose2d):
            return branch(x, train)
        return branch(x)

    def __call__(
        self, x, train: bool, y: Optional[jax.Array] = None
    ) -> BranchPair:
        if self.packed:
            assert isinstance(x, Packed), (
                "packed FFCTranspose expects Packed input"
            )
            return _packed_ffc_call(
                self,
                x,
                train,
                y,
                lambda v, k: conv_ops.conv_transpose2d(
                    v,
                    k,
                    stride=self.stride,
                    padding=self.padding,
                    output_padding=self.output_padding,
                    dilation=self.dilation,
                ),
            )
        x_l, x_g = x if isinstance(x, tuple) else (x, None)
        out_l, out_g = None, None
        if self.ratio_gout != 1:
            a = self._run(self.convl2l, x_l, train)
            b = self._run(self.convg2l, x_g, train)
            out_l = _add_opt(a, b)
        if self.ratio_gout != 0:
            a = self._run(self.convl2g, x_l, train)
            b = (
                self.convg2g(x_g, train, y)
                if (self.convg2g is not None and x_g is not None)
                else None
            )
            out_g = _add_opt(a, b)
        return out_l, out_g


class FFC_BN_ACT(nn.Module):
    """FFC (or FFCTranspose) -> per-branch BN -> per-branch activation —
    the block the model zoo composes (reference layers/ffc/ffc_bn_act.py).

    ``norm``: "batch" | "identity"; ``activation``: a key of ACTIVATIONS
    (LeakyReLU gets the reference's 0.1 slope). With ``num_classes > 1``
    and labels passed, BN becomes class-conditional
    (reference layers/cond/ffc_bn_act_cond.py).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    norm: str = "identity"
    activation: str = "identity"
    enable_lfu: bool = False
    upsampling: bool = False
    use_sn: bool = False
    num_classes: int = 0
    cond_spectral_bn: bool = False  # see FFC.cond_spectral_bn
    impl: Optional[str] = None
    packed: bool = False  # packed-branch mode (see Packed)

    @nn.compact
    def __call__(
        self, x, train: bool, y: Optional[jax.Array] = None,
        noise_fold=None,
    ) -> BranchPair:
        """``noise_fold``: optional ``(w, n_l, n_g)`` — per-channel noise
        weight (C,) f32 and the two (B,H,W,1) noise maps — to fold the
        generator's post-block NoiseInjection into the packed norm-act
        pass (fused Pallas path; see models/ffc_gan.py)."""
        if self.packed:
            assert self.num_classes <= 1, (
                "packed mode does not support conditional BN"
            )
        assert noise_fold is None or self.packed, (
            "noise_fold requires packed mode"
        )
        if self.upsampling:
            ffc = FFCTranspose(
                self.in_channels,
                self.out_channels,
                self.kernel_size,
                self.ratio_gin,
                self.ratio_gout,
                stride=self.stride,
                padding=self.padding,
                output_padding=self.output_padding,
                dilation=self.dilation,
                groups=self.groups,
                use_bias=self.use_bias,
                enable_lfu=self.enable_lfu,
                num_classes=self.num_classes,
                cond_spectral_bn=self.cond_spectral_bn,
                use_sn=self.use_sn,
                impl=self.impl,
                packed=self.packed,
                name="ffc",
            )
        else:
            ffc = FFC(
                self.in_channels,
                self.out_channels,
                self.kernel_size,
                self.ratio_gin,
                self.ratio_gout,
                stride=self.stride,
                padding=self.padding,
                dilation=self.dilation,
                groups=self.groups,
                use_bias=self.use_bias,
                enable_lfu=self.enable_lfu,
                num_classes=self.num_classes,
                cond_spectral_bn=self.cond_spectral_bn,
                use_sn=self.use_sn,
                impl=self.impl,
                packed=self.packed,
                name="ffc",
            )
        if self.packed:
            return self._packed_norm_act(ffc(x, train, y), train,
                                         noise_fold)
        x_l, x_g = ffc(x, train, y)
        act = ACTIVATIONS[self.activation]

        def norm_act(v, name):
            if v is None:
                return None
            if self.norm == "batch":
                if self.num_classes > 1 and y is not None:
                    v = ConditionalBatchNorm(self.num_classes, name=f"bn_{name}")(
                        v, y, train
                    )
                else:
                    v = BatchNorm(name=f"bn_{name}")(v, train)
            return act(v)

        return norm_act(x_l, "l"), norm_act(x_g, "g")

    def _packed_norm_act(
        self, p: Packed, train: bool, noise_fold=None
    ) -> Packed:
        """BN + activation over the packed array in ONE full-lane pass.

        Per-channel batch statistics over the concatenated branches are
        identical to per-branch statistics; the BatchNormHolder children
        keep the exact bn_l/bn_g parameter/stat tree of the tuple path
        (same normalisation math as :class:`BatchNorm`: f32, biased
        variance, eps 1e-5, momentum 0.9).

        ``noise_fold = (w, n_l, n_g)``: apply the generator's
        NoiseInjection inside the same pass (fused into the Pallas apply
        kernel when dispatched; the jnp fallback applies the identical
        math after the activation, exactly like packed_noise_inject)."""
        act = ACTIVATIONS[self.activation]
        arr, cl = p.x, p.cl

        def add_noise(out):
            if noise_fold is None:
                return out
            w, n_l, n_g = noise_fold
            sel = jnp.arange(out.shape[-1]) >= cl
            noise = jnp.where(sel, n_g, n_l)
            return out + w.astype(out.dtype) * noise

        if self.norm != "batch":
            return Packed(add_noise(act(arr)), cl)
        cg = arr.shape[-1] - cl
        in_dtype = arr.dtype
        if train and self.activation == "gelu":
            from ..ops.pallas.bn_act import (
                fused_bn_gelu,
                fused_bn_gelu_noise,
                use_fused_bn_gelu,
            )

            if use_fused_bn_gelu(arr):
                # Fused Pallas path (round-4 lever, ops/pallas/bn_act.py):
                # stats + normalize + GELU (+ folded noise) in two
                # minimal-traffic passes. The holders are called twice —
                # first with train=False (pure param read, NO
                # running-stat side effect), then with the op's batch
                # stats to perform the exact same running-stat update as
                # the jnp path below.
                holders = []
                if cl > 0:
                    holders.append((BatchNormHolder(cl, name="bn_l"), cl))
                if cg > 0:
                    holders.append((BatchNormHolder(cg, name="bn_g"), cg))
                reads = [h(None, None, False) for h, _ in holders]
                scale = jnp.concatenate([r[2] for r in reads])
                bias = jnp.concatenate([r[3] for r in reads])
                if noise_fold is not None and 0 < cl:
                    w, n_l, n_g = noise_fold
                    out, bmean, bvar = fused_bn_gelu_noise(
                        arr, scale, bias, w, n_l, n_g, cl
                    )
                else:
                    out, bmean, bvar = fused_bn_gelu(arr, scale, bias)
                    out = add_noise(out)
                off = 0
                for h, cnt in holders:
                    h(bmean[off:off + cnt], bvar[off:off + cnt], True)
                    off += cnt
                return Packed(out, cl)
        if train:
            # f32-ACCUMULATING reductions over the (bf16) array, each
            # fusing its own upcast. A shared ``xf = arr.astype(f32)``
            # here has three consumers (two stat reduces + the apply),
            # which XLA materializes to HBM — the round-3 128px trace
            # showed it as a 512 MB f32 buffer costing ~3 ms/step of
            # pure bandwidth on block4 alone.
            bmean = jnp.mean(arr, axis=(0, 1, 2), dtype=jnp.float32)
            bvar = (
                jnp.mean(jnp.square(arr.astype(jnp.float32)), axis=(0, 1, 2))
                - bmean * bmean
            )
        else:
            bmean = bvar = None

        def side(name, lo, hi):
            m = bmean[lo:hi] if bmean is not None else None
            v = bvar[lo:hi] if bvar is not None else None
            return BatchNormHolder(hi - lo, name=name)(m, v, train)

        parts = []
        if cl > 0:
            parts.append(side("bn_l", 0, cl))
        if cg > 0:
            parts.append(side("bn_g", cl, cl + cg))
        mean, var, scale, bias = (
            parts[0]
            if len(parts) == 1
            else tuple(jnp.concatenate(t) for t in zip(*parts))
        )
        inv = jax.lax.rsqrt(var + 1e-5)
        # independent upcast for the apply consumer; the barrier keeps
        # CSE from merging it back with the stats upcasts (which would
        # recreate the shared, HBM-materialized f32 map). Downcast
        # BEFORE the activation, exactly like the tuple path
        # (layers.BatchNorm returns in_dtype, then act runs on it) —
        # which also makes the activation residual saved for the
        # backward bf16 instead of f32.
        arr_ap = jax.lax.optimization_barrier(arr)
        out = (
            (arr_ap.astype(jnp.float32) - mean) * (inv * scale) + bias
        ).astype(in_dtype)
        return Packed(add_noise(act(out)), cl)


def _add_opt(a: Branch, b: Branch) -> Branch:
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def resize_output(x) -> jax.Array:
    """Collapse an FFC tuple to one tensor: concat local+global channels
    (reference layers/resizer.py:15-24). A Packed signal already IS that
    concat — the resizer is free in packed mode."""
    if isinstance(x, Packed):
        return x.x
    if isinstance(x, tuple):
        x_l, x_g = x
        if x_g is None:
            return x_l
        if x_l is None:
            return x_g
        return jnp.concatenate([x_l, x_g], axis=-1)
    return x
