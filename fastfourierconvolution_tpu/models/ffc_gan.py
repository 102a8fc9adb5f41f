"""FFC-GAN generators and discriminators (unconditional).

One parametric ladder replaces the reference's three cloned generator
classes (reference fgan_complete.py:81-140 [32px, ngf 64, ratio 0.25],
fgan64_complete.py:85-156 [64px, +1 block], fgan128_complete.py:442-522
[128px, ngf 128, ratio 0.5]) and one parametric SN-conv ladder replaces
its three discriminators (fgan_complete.py:142-171 [7 convs],
fgan64_complete.py:159-191 [8], fgan128_complete.py:525-562 [9]).

Behavioral contract per block: z -> Dense(mg*mg*ngf*8) -> reshape ->
[FFC_BN_ACT(k4 s2 p1, GELU, BN, upsampling) -> NoiseInjection on both
branches (training only)] x N -> FFC_BN_ACT(ngf -> out_ch, k3 s1 p1,
Tanh, no norm) -> concat local/global.

Eval-mode uint8 output (the torch-fidelity input contract,
reference fgan_complete.py:136-139) is a separate pure function
:func:`to_uint8` rather than a dtype-switching forward.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.ffc import FFC_BN_ACT, Packed, packed_enabled, resize_output
from ..ops.pallas.bn_act import fused_bn_enabled
from ..nn.layers import (
    Conv2d,
    NoiseInjection,
    NoiseWeightHolder,
    SNConv2d,
    SNDense,
    dense_init,
)


# Packed-branch mode default threshold, set by the on-chip A/B
# (RUNS/packed_ab_r3.json): packed wins where branch maps are large
# (128px: 750 -> 858 img/s, +14.5%) and loses where the step is
# VMEM-resident (32px: -11%). FFC_TPU_PACKED=0/1 overrides.
_PACKED_MIN_RES = 128


def to_uint8(x: jax.Array) -> jax.Array:
    """[-1, 1] float -> [0, 255] uint8, the metric-pipeline input contract
    (reference fgan_complete.py:137-138)."""
    return (255.0 * (jnp.clip(x, -1.0, 1.0) * 0.5 + 0.5)).astype(jnp.uint8)


def draw_noise_fold(b: int, hw: int, out_ch: int, ratio_g: float,
                    i: int, dtype):
    """Pre-conv draw of block ``i``'s noise-fold triple ``(w, n_l,
    n_g)`` for FFC_BN_ACT's fused path (ops/pallas/bn_act.py). The
    NoiseWeightHolder names and the local-first weight concat are the
    SAME as packed_noise_inject below and the tuple path's
    NoiseInjection modules — one definition keeps param trees and
    noise-stream draws byte-identical across all three paths. The
    probe array only supplies (B, H_out, W_out) and the draw dtype."""
    cg = int(out_ch * ratio_g)
    cl = out_ch - cg
    probe = jnp.zeros((b, hw, hw, 1), dtype)
    w_l, n_l = NoiseWeightHolder(cl, name=f"lcl_noise{i}")(probe)
    if cg > 0:
        w_g, n_g = NoiseWeightHolder(cg, name=f"glb_noise{i}")(probe)
        w = jnp.concatenate([w_l.reshape(-1), w_g.reshape(-1)])
    else:
        w, n_g = w_l.reshape(-1), n_l
    return (w, n_l, n_g)


def packed_noise_inject(p: Packed, i: int) -> Packed:
    """Both branches' NoiseInjection in one full-lane pass; the
    NoiseWeightHolder children attach to the calling module (flax's
    dynamic compact context) and keep the exact lcl/glb_noise{i} param
    tree and PRNG folds of the tuple path."""
    arr, cl = p.x, p.cl
    cg = arr.shape[-1] - cl
    w_l, n_l = NoiseWeightHolder(cl, name=f"lcl_noise{i}")(arr)
    if cg == 0:
        return Packed(arr + w_l.astype(arr.dtype) * n_l, cl)
    w_g, n_g = NoiseWeightHolder(cg, name=f"glb_noise{i}")(arr)
    w = jnp.concatenate([w_l, w_g], axis=-1).astype(arr.dtype)
    sel = jnp.arange(arr.shape[-1]) >= cl
    noise = jnp.where(sel, n_g, n_l)
    return Packed(arr + w * noise, cl)


class FFCGenerator(nn.Module):
    """Parametric FFC DCGAN-style generator.

    ``channel_mults``: per-upsampling-block output multiplier of ``ngf``
    (the input of block i is ``ngf * in_mult`` where in_mult is 8 for the
    first block and the previous mult after). Output resolution is
    ``mg * 2**len(channel_mults)``.

    Presets (matching the reference):
      32px:  ngf=64,  ratio_g=0.25, mults (4, 2, 1),       mg=4
      48px:  same with mg=6
      64px:  ngf=64,  ratio_g=0.25, mults (4, 2, 1, 1),    mg=4
      128px: ngf=128, ratio_g=0.5,  mults (4, 2, 1, 1, 1), mg=4
    """

    z_size: int = 128
    ngf: int = 64
    ratio_g: float = 0.25
    mg: int = 4
    channel_mults: Sequence[int] = (4, 2, 1)
    out_channels: int = 3
    impl: Optional[str] = None
    packed: Optional[bool] = None  # None -> $FFC_TPU_PACKED

    @property
    def resolution(self) -> int:
        return self.mg * (2 ** len(self.channel_mults))

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        from ..utils.policy import compute_dtype

        b = z.shape[0]
        stem = nn.Dense(
            self.mg * self.mg * self.ngf * 8,
            kernel_init=dense_init,
            dtype=compute_dtype(),
            name="noise_to_feature",
        )(z)
        x = stem.reshape(b, self.mg, self.mg, self.ngf * 8)

        packed = (
            self.packed
            if self.packed is not None
            else packed_enabled(default=self.resolution >= _PACKED_MIN_RES)
        )
        feat = Packed(x, x.shape[-1]) if packed else (x, None)
        in_ratio = 0.0  # the stem output is all-local
        for i, mult in enumerate(self.channel_mults):
            out_ch = self.ngf * mult
            in_ch = (
                feat.x.shape[-1]
                if packed
                else feat[0].shape[-1]
                + (feat[1].shape[-1] if feat[1] is not None else 0)
            )
            # Fused-noise fold (ops/pallas/bn_act.py): when the fused
            # BN+GELU kernels are opted in, the block's NoiseInjection
            # is folded into the same apply pass (XLA's jnp path already
            # fuses it — the kernel must match that fusion boundary).
            noise_fold = None
            fold_noise = train and packed and fused_bn_enabled()
            if fold_noise:
                noise_fold = draw_noise_fold(
                    b, self.mg * 2 ** (i + 1), out_ch, self.ratio_g, i,
                    compute_dtype(),
                )
            feat = FFC_BN_ACT(
                in_channels=in_ch,
                out_channels=out_ch,
                kernel_size=4,
                ratio_gin=in_ratio,
                ratio_gout=self.ratio_g,
                stride=2,
                padding=1,
                norm="batch",
                activation="gelu",
                upsampling=True,
                impl=self.impl,
                packed=packed,
                name=f"block{i}",
            )(feat, train, noise_fold=noise_fold)
            if train and not fold_noise:
                if packed:
                    feat = packed_noise_inject(feat, i)
                else:
                    x_l, x_g = feat
                    x_l = NoiseInjection(name=f"lcl_noise{i}")(x_l)
                    if x_g is not None:
                        x_g = NoiseInjection(name=f"glb_noise{i}")(x_g)
                    feat = (x_l, x_g)
            in_ratio = self.ratio_g

        feat = FFC_BN_ACT(
            in_channels=self.ngf * self.channel_mults[-1],
            out_channels=self.out_channels,
            kernel_size=3,
            ratio_gin=self.ratio_g,
            ratio_gout=0.0,
            stride=1,
            padding=1,
            norm="identity",
            activation="tanh",
            upsampling=False,
            impl=self.impl,
            packed=packed,
            name="to_rgb",
        )(feat, train)
        return resize_output(feat)

    @staticmethod
    def for_resolution(
        resolution: int, z_size: int = 128, out_channels: int = 3, **kw
    ) -> "FFCGenerator":
        presets = {
            32: dict(ngf=64, ratio_g=0.25, mg=4, channel_mults=(4, 2, 1)),
            48: dict(ngf=64, ratio_g=0.25, mg=6, channel_mults=(4, 2, 1)),
            64: dict(ngf=64, ratio_g=0.25, mg=4, channel_mults=(4, 2, 1, 1)),
            96: dict(ngf=64, ratio_g=0.25, mg=6, channel_mults=(4, 2, 1, 1)),
            128: dict(
                ngf=128, ratio_g=0.5, mg=4, channel_mults=(4, 2, 1, 1, 1)
            ),
            # beyond the reference's 128px ceiling: one more x2 block
            256: dict(
                ngf=128, ratio_g=0.5, mg=4, channel_mults=(4, 2, 1, 1, 1, 1)
            ),
        }
        if resolution in presets:
            cfg = dict(presets[resolution])
        else:
            # generic fallback: derive the ladder from mg (power-of-two
            # multiple of mg required)
            mg = kw.pop("mg", 4)
            n = (resolution // mg).bit_length() - 1
            assert mg * (2**n) == resolution, (
                f"resolution {resolution} must be mg*2^n (mg={mg})"
            )
            mults = ((4, 2, 1) + (1,) * max(0, n - 3))[-n:] if n else (1,)
            cfg = dict(ngf=64, ratio_g=0.25, mg=mg, channel_mults=mults)
        cfg.update(kw)
        return FFCGenerator(z_size=z_size, out_channels=out_channels, **cfg)


# Discriminator ladders: (features, kernel, stride); all pad k//2==1-style
# torch padding=(1,1). The reference alternates 3x3 s1 / 4x4 s2.
_D_LADDERS = {
    32: ((64, 3, 1), (64, 4, 2), (128, 3, 1), (128, 4, 2), (256, 3, 1),
         (256, 4, 2), (512, 3, 1)),
    64: ((64, 3, 1), (64, 4, 2), (128, 3, 1), (128, 4, 2), (256, 3, 1),
         (256, 4, 2), (512, 3, 1), (512, 4, 2)),
    128: ((64, 3, 1), (64, 4, 2), (128, 3, 1), (128, 4, 2), (256, 3, 1),
          (256, 4, 2), (512, 3, 1), (512, 4, 2), (512, 4, 2)),
    # 256 extends the reference's pattern one more doubling (the
    # reference itself stops at 128px, fgan128_complete.py:525-562):
    # each extra octave appends a (512, 4, 2) downsample so the head
    # stays mg x mg x 512
    256: ((64, 3, 1), (64, 4, 2), (128, 3, 1), (128, 4, 2), (256, 3, 1),
          (256, 4, 2), (512, 3, 1), (512, 4, 2), (512, 4, 2), (512, 4, 2)),
}


class SNConvDiscriminator(nn.Module):
    """Spectral-normed conv ladder + SN linear head.

    ``ladder`` entries are (features, kernel, stride); LeakyReLU(0.1)
    between layers; the head flattens mg x mg x 512. ``use_sn=False``
    reproduces the reference's ``sn=False`` escape hatch.
    """

    ladder: Sequence[Tuple[int, int, int]] = _D_LADDERS[32]
    mg: int = 4
    use_sn: bool = True
    in_channels: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        for i, (feat, k, s) in enumerate(self.ladder):
            if self.use_sn:
                x = SNConv2d(feat, k, stride=s, padding=1, name=f"conv{i}")(
                    x, train
                )
            else:
                x = Conv2d(
                    feat, k, stride=s, padding=1, use_bias=True, name=f"conv{i}"
                )(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
        x = x.reshape(x.shape[0], -1)
        if self.use_sn:
            return SNDense(1, name="fc")(x, train)
        return nn.Dense(1, kernel_init=dense_init, name="fc")(x)

    @staticmethod
    def for_resolution(resolution: int, **kw) -> "SNConvDiscriminator":
        mg = kw.pop("mg", 6 if resolution in (48, 96) else 4)
        base = {48: 32, 96: 64}.get(resolution, resolution)
        if base not in _D_LADDERS:
            raise ValueError(
                f"sn_conv discriminator has no ladder for resolution "
                f"{resolution}; supported: {sorted(_D_LADDERS)} (+48/96), "
                f"or pass an explicit ladder=..."
            )
        return SNConvDiscriminator(ladder=_D_LADDERS[base], mg=mg, **kw)


class FFCDiscriminator(nn.Module):
    """All-FFC discriminator (reference sngan_complete.py:116-157 with
    ratio 0.25; fgan_complete.py:173-214 uses ratio 0 i.e. plain convs).

    FFC_BN_ACT ladder (LeakyReLU 0.1) -> concat branches -> SN linear.
    """

    mg: int = 4
    ratio_g: float = 0.25
    in_channels: int = 3
    impl: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        specs = [
            # (out_ch, k, s, gin, gout, norm)
            (64, 3, 1, 0.0, self.ratio_g, "identity"),
            (128, 4, 2, self.ratio_g, self.ratio_g, "batch"),
            (256, 4, 2, self.ratio_g, self.ratio_g, "batch"),
            (512, 4, 2, self.ratio_g, 0.0, "batch"),
        ]
        feat = (x, None)
        in_ch = self.in_channels
        for i, (out_ch, k, s, gin, gout, norm) in enumerate(specs):
            feat = FFC_BN_ACT(
                in_channels=in_ch,
                out_channels=out_ch,
                kernel_size=k,
                ratio_gin=gin,
                ratio_gout=gout,
                stride=s,
                padding=1,
                use_bias=True,
                norm=norm,
                activation="leaky_relu",
                impl=self.impl,
                name=f"block{i}",
            )(feat, train)
            in_ch = out_ch
        m = resize_output(feat)
        m = m.reshape(m.shape[0], -1)
        return SNDense(1, name="fc")(m, train)
