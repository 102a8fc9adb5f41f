"""Conditional GAN models (class-conditional FFC and vanilla-conv).

Covers both reference families:

  * script path (reference fgan_cond_complete.py:33-274,
    fgan128_cond_complete.py:33-180): FFC generators with
    ConvTranspose label/noise stems or a concat-Dense stem, conditional
    BN inside FFC blocks, SN-conv discriminators with a label image
    plane, and an all-FFC conditional discriminator;
  * library path (reference models/conditional/*.py): cDCGAN generator
    (log2 ladder with label/noise ConvT stems) and discriminators with
    label plane + optional SN and decaying input noise.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.ffc import FFC_BN_ACT, Packed, packed_enabled, resize_output
from ..nn.layers import (
    BatchNorm,
    Conv2d,
    ConvTranspose2d,
    GaussianNoise,
    NoiseInjection,
    SNConv2d,
    SNDense,
    dense_init,
)
from ..ops.pallas.bn_act import fused_bn_enabled
from ..utils.policy import compute_dtype
from .ffc_gan import (
    _D_LADDERS,
    _PACKED_MIN_RES,
    draw_noise_fold,
    packed_noise_inject,
)


def _embed(num: int, dim: int, name: str, module: nn.Module):
    return module.param(
        name, nn.initializers.normal(1.0), (num, dim)
    )


class FFCCondGenerator(nn.Module):
    """Conditional FFC generator.

    ``stem='convt'``: label embedding -> ConvT(4,1,0) stem; z -> ConvT
    stem; channel concat (reference fgan_cond_complete.py:63-93,
    fgan128_cond_complete.py:75-105). ``stem='dense'``: concat(z, embed)
    -> Dense(mg*mg*ngf*8) (the STL variant, fgan_cond_complete.py:117-186).
    ``cond_bn`` switches block BN to class-conditional (true for the
    32/48px scripts, false for the 128px one).
    """

    z_size: int = 128
    num_classes: int = 10
    ngf: int = 64
    ratio_g: float = 0.25
    mg: int = 4
    channel_mults: Sequence[int] = (4, 2, 1)
    out_channels: int = 3
    stem: str = "convt"
    cond_bn: bool = True
    # per-block norm of the hidden up-blocks: the script-path models use
    # (conditional) BN; the library-path ffc_cond_generator.py leaves
    # FFC_BN_ACT's norm_layer at nn.Identity — select "identity" there
    block_norm: str = "batch"
    # conditional BN inside the spectral FourierUnit — a beyond-reference
    # opt-in (the reference's FU conditional path is dead code that
    # crashes when exercised, fourier_unity.py:25-28,47); default off =
    # reference-parity semantics, required for checkpoint migration
    cond_spectral_bn: bool = False
    impl: Optional[str] = None
    packed: Optional[bool] = None  # None -> $FFC_TPU_PACKED / size gate

    @property
    def resolution(self) -> int:
        return self.mg * (2 ** len(self.channel_mults))

    @nn.compact
    def __call__(
        self, z: jax.Array, train: bool, y: jax.Array
    ) -> jax.Array:
        b = z.shape[0]
        y = y.reshape(-1).astype(jnp.int32)
        embed_tbl = _embed(self.num_classes, self.num_classes, "label_embed", self)
        embedding = embed_tbl[y]  # (B, num_classes)

        if self.stem == "convt":
            # two ConvT(k4, s1, p0) stems from 1x1 to 4x4, concat channels
            lbl = embedding.reshape(b, 1, 1, self.num_classes)
            lbl = ConvTranspose2d(self.ngf * 4, 4, use_bias=True,
                                  name="label_conv")(lbl)
            lbl = BatchNorm(name="label_bn")(lbl, train)
            lbl = nn.gelu(lbl, approximate=False)
            inp = z.reshape(b, 1, 1, self.z_size)
            inp = ConvTranspose2d(self.ngf * 4, 4, use_bias=True,
                                  name="input_conv")(inp)
            inp = BatchNorm(name="input_bn")(inp, train)
            inp = nn.gelu(inp, approximate=False)
            x = jnp.concatenate([inp, lbl], axis=-1)  # (B, 4, 4, ngf*8)
        elif self.stem == "dense":
            x = jnp.concatenate([z, embedding], axis=-1)
            x = nn.Dense(
                self.mg * self.mg * self.ngf * 8,
                kernel_init=dense_init,
                name="noise_to_feature",
            )(x)
            x = x.reshape(b, self.mg, self.mg, self.ngf * 8)
        else:
            raise ValueError(self.stem)

        nclass = self.num_classes if self.cond_bn else 0
        # packed-branch mode (nn/ffc.py Packed): same size gate as
        # FFCGenerator; conditional BN has no packed path, so cond_bn
        # presets (32/48px — below the gate anyway) stay on tuples.
        packed = (
            self.packed
            if self.packed is not None
            else packed_enabled(default=self.resolution >= _PACKED_MIN_RES)
        ) and nclass <= 1
        feat = Packed(x, x.shape[-1]) if packed else (x, None)
        in_ratio = 0.0
        stem_hw = 4 if self.stem == "convt" else self.mg
        for i, mult in enumerate(self.channel_mults):
            # fused-noise fold: same dispatch as FFCGenerator (packed
            # implies nclass <= 1 here, so no conditional-BN conflict)
            noise_fold = None
            fold_noise = train and packed and fused_bn_enabled()
            if fold_noise:
                noise_fold = draw_noise_fold(
                    b, stem_hw * 2 ** (i + 1), self.ngf * mult,
                    self.ratio_g, i, compute_dtype(),
                )
            feat = FFC_BN_ACT(
                in_channels=self.ngf * 8 if i == 0 else self.ngf * self.channel_mults[i - 1],
                out_channels=self.ngf * mult,
                kernel_size=4,
                ratio_gin=in_ratio,
                ratio_gout=self.ratio_g,
                stride=2,
                padding=1,
                norm=self.block_norm,
                activation="gelu",
                upsampling=True,
                num_classes=nclass,
                cond_spectral_bn=self.cond_spectral_bn,
                impl=self.impl,
                packed=packed,
                name=f"block{i}",
            )(feat, train, y if nclass > 1 else None,
              noise_fold=noise_fold)
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
    def for_preset(preset: str, **kw) -> "FFCCondGenerator":
        presets = {
            # fgan_cond_complete cifar/svhn 32px
            "cifar32": dict(stem="convt", cond_bn=True, mg=4,
                            channel_mults=(4, 2, 1)),
            # fgan_cond_complete STL 48px
            "stl48": dict(stem="dense", cond_bn=True, mg=6,
                          channel_mults=(4, 2, 1)),
            # fgan128_cond_complete textures 128px
            "tex128": dict(stem="convt", cond_bn=False, mg=4,
                           channel_mults=(4, 2, 1, 1, 1)),
            # library path (models/conditional/ffc_cond_generator.py):
            # no per-block norm, no conditional BN
            "library64": dict(stem="convt", cond_bn=False, mg=4,
                              block_norm="identity",
                              channel_mults=(4, 2, 1, 1)),
        }
        cfg = dict(presets[preset])
        cfg.update(kw)
        return FFCCondGenerator(**cfg)


class CondSNDiscriminator(nn.Module):
    """SN-conv discriminator with a label image plane
    (reference fgan_cond_complete.py:189-227: Embedding(num_classes,
    res*res) reshaped to one extra channel; optional input Gaussian
    noise). Hinge-logit output (B, 1)."""

    num_classes: int = 10
    resolution: int = 32
    use_noise: bool = False
    noise_stddev: float = 0.05

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool, y: jax.Array
    ) -> jax.Array:
        b, h, w, _ = x.shape
        # input noise regularises the IMAGE only — applied before the
        # label plane concat (every reference variant noises the image
        # pre-concat, e.g. cond_discriminator.py input path)
        if self.use_noise:
            x = GaussianNoise(self.noise_stddev)(x, train)
        y = y.reshape(-1).astype(jnp.int32)
        tbl = _embed(self.num_classes, h * w, "label_embed", self)
        plane = tbl[y].reshape(b, h, w, 1)
        x = jnp.concatenate([x, plane], axis=-1)
        base = {48: 32, 96: 64}.get(self.resolution, self.resolution)
        if base not in _D_LADDERS:
            raise ValueError(
                f"cond_sn_conv discriminator has no ladder for resolution "
                f"{self.resolution}; supported: {sorted(_D_LADDERS)} (+48/96)"
            )
        for i, (feat, k, s) in enumerate(_D_LADDERS[base]):
            x = SNConv2d(feat, k, stride=s, padding=1, name=f"conv{i}")(
                x, train
            )
            x = nn.leaky_relu(x, negative_slope=0.1)
        x = x.reshape(b, -1)
        return SNDense(1, name="fc")(x, train)


class FFCCondDiscriminator(nn.Module):
    """All-FFC conditional discriminator
    (reference fgan_cond_complete.py:229-274): input Gaussian noise,
    label plane, 4 conditional FFC blocks (ratios 0->g, g->g, g->g,
    g->0), SN linear head."""

    num_classes: int = 10
    ratio_g: float = 0.25
    noise_stddev: float = 0.05
    cond_spectral_bn: bool = False  # see FFCCondGenerator.cond_spectral_bn
    impl: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool, y: jax.Array
    ) -> jax.Array:
        b, h, w, _ = x.shape
        x = GaussianNoise(self.noise_stddev)(x, train)
        y = y.reshape(-1).astype(jnp.int32) % self.num_classes
        tbl = _embed(self.num_classes, h * w, "label_embed", self)
        plane = tbl[y].reshape(b, h, w, 1)
        x = jnp.concatenate([x, plane], axis=-1)

        specs = [
            (64, 3, 1, 0.0, self.ratio_g),
            (128, 4, 2, self.ratio_g, self.ratio_g),
            (256, 4, 2, self.ratio_g, self.ratio_g),
            (512, 4, 2, self.ratio_g, 0.0),
        ]
        feat = (x, None)
        in_ch = x.shape[-1]
        for i, (out_ch, k, s, gin, gout) in enumerate(specs):
            feat = FFC_BN_ACT(
                in_channels=in_ch,
                out_channels=out_ch,
                kernel_size=k,
                ratio_gin=gin,
                ratio_gout=gout,
                stride=s,
                padding=1,
                use_bias=True,
                norm="batch",
                activation="leaky_relu",
                num_classes=self.num_classes,
                cond_spectral_bn=self.cond_spectral_bn,
                impl=self.impl,
                name=f"block{i}",
            )(feat, train, y)
            in_ch = out_ch
        m = resize_output(feat).reshape(b, -1)
        return SNDense(1, name="fc")(m, train)


class CondDCGANGenerator(nn.Module):
    """Library-path cDCGAN generator (reference
    models/conditional/cond_generator.py:13-125): label/noise ConvT
    stems (LeakyReLU 0.2), ``log2(ngf)-3`` ConvT up-blocks, tanh."""

    nz: int = 100
    nc: int = 3
    ngf: int = 64
    num_classes: int = 10

    @nn.compact
    def __call__(self, z: jax.Array, train: bool, y: jax.Array) -> jax.Array:
        b = z.shape[0]
        number_convs = int(math.log2(self.ngf)) - 3
        mult = 2 ** (number_convs - 1)
        y = y.reshape(-1).astype(jnp.int32)
        tbl = _embed(self.num_classes, self.num_classes, "label_embed", self)
        lbl = tbl[y].reshape(b, 1, 1, self.num_classes)
        lbl = ConvTranspose2d(self.ngf * mult, 4, use_bias=True,
                              name="label_conv")(lbl)
        lbl = BatchNorm(name="label_bn")(lbl, train)
        lbl = nn.leaky_relu(lbl, negative_slope=0.2)
        inp = z.reshape(b, 1, 1, self.nz)
        inp = ConvTranspose2d(self.ngf * mult, 4, use_bias=True,
                              name="input_conv")(inp)
        inp = BatchNorm(name="input_bn")(inp, train)
        inp = nn.leaky_relu(inp, negative_slope=0.2)
        x = jnp.concatenate([inp, lbl], axis=-1)

        for itr in range(number_convs, 0, -1):
            m = 2**itr
            x = ConvTranspose2d(self.ngf * (m // 2), 4, stride=2, padding=1,
                                name=f"convt{itr}")(x)
            x = BatchNorm(name=f"bn{itr}")(x, train)
            x = nn.relu(x)
        x = ConvTranspose2d(self.nc, 4, stride=2, padding=1, name="to_rgb")(x)
        return jnp.tanh(x)


class CondDCGANDiscriminator(nn.Module):
    """Library-path conditional discriminator (reference
    models/conditional/cond_discriminator.py:13-132): label plane conv +
    input conv stems, doubling conv ladder (BN, or SN without BN when
    ``use_sn``), sigmoid head; optional decaying input noise
    ``0.1 * 0.01**epoch_frac``."""

    nc: int = 3
    ndf: int = 64
    num_classes: int = 10
    use_sn: bool = False
    use_noise: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool,
        y: jax.Array,
        epoch_frac: float = 0.0,
    ) -> jax.Array:
        b = x.shape[0]
        number_convs = int(math.log2(self.ndf)) - 2
        y = y.reshape(-1).astype(jnp.int32)
        tbl = _embed(self.num_classes, self.ndf * self.ndf, "label_embed", self)
        plane = tbl[y].reshape(b, self.ndf, self.ndf, 1)
        plane = Conv2d(self.ndf, 4, stride=2, padding=1, use_bias=True,
                       name="label_conv")(plane)
        plane = nn.leaky_relu(plane, negative_slope=0.2)

        if self.use_noise and train:
            scale = 0.1 * (0.01**epoch_frac)
            x = x + scale * jax.random.normal(self.make_rng("noise"), x.shape)
        x = Conv2d(self.ndf, 4, stride=2, padding=1, name="input_conv")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = jnp.concatenate([x, plane], axis=-1)

        for itr in range(1, number_convs):
            m = 2**itr
            if self.use_sn:
                x = SNConv2d(self.ndf * m * 2, 4, stride=2, padding=1,
                             use_bias=False, name=f"conv{itr}")(x, train)
            else:
                x = Conv2d(self.ndf * m * 2, 4, stride=2, padding=1,
                           name=f"conv{itr}")(x)
                x = BatchNorm(name=f"bn{itr}")(x, train)
            x = nn.leaky_relu(x, negative_slope=0.2)
        if self.use_sn:
            x = SNConv2d(1, 4, stride=1, padding=0, use_bias=False,
                         name="head")(x, train)
        else:
            x = Conv2d(1, 4, stride=1, padding=0, name="head")(x)
        return nn.sigmoid(x.reshape(b, 1))


class FFCCondDCGANDiscriminator(nn.Module):
    """Library-path all-FFC conditional discriminator (reference
    models/conditional/ffc_cond_discriminator.py:14-118): GELU stems,
    label plane, FFC ladder with ratio 0.5, sigmoid 1x1 FFC head."""

    nc: int = 3
    ndf: int = 64
    num_classes: int = 10
    use_sn: bool = False
    use_noise: bool = False
    impl: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool, y: jax.Array
    ) -> jax.Array:
        b = x.shape[0]
        number_convs = int(math.log2(self.ndf)) - 2
        y = y.reshape(-1).astype(jnp.int32) % self.num_classes
        tbl = _embed(self.num_classes, self.ndf * self.ndf, "label_embed", self)
        plane = tbl[y].reshape(b, self.ndf, self.ndf, 1)
        plane = Conv2d(self.ndf, 4, stride=2, padding=1, use_bias=True,
                       name="label_conv")(plane)
        plane = nn.gelu(plane, approximate=False)
        if self.use_noise:
            x = GaussianNoise(0.05)(x, train)
        x = Conv2d(self.ndf, 4, stride=2, padding=1, name="input_conv")(x)
        x = nn.gelu(x, approximate=False)
        x = jnp.concatenate([x, plane], axis=-1)

        feat = (x, None)
        in_ch = x.shape[-1]
        for itr in range(1, number_convs):
            m = 2**itr
            g_in = 0.0 if itr == 1 else 0.5
            feat = FFC_BN_ACT(
                in_channels=in_ch,
                out_channels=self.ndf * m * 2,
                kernel_size=4,
                ratio_gin=g_in,
                ratio_gout=0.5,
                stride=2,
                padding=1,
                # reference ffc_cond_discriminator.py:70 leaves
                # FFC_BN_ACT's norm_layer at its nn.Identity default
                norm="identity",
                activation="gelu",
                use_sn=self.use_sn,
                impl=self.impl,
                name=f"block{itr}",
            )(feat, train)
            in_ch = self.ndf * m * 2
        feat = FFC_BN_ACT(
            in_channels=in_ch,
            out_channels=1,
            kernel_size=4,
            ratio_gin=0.5,
            ratio_gout=0.0,
            stride=1,
            padding=0,
            norm="identity",
            activation="sigmoid",
            use_sn=self.use_sn,
            impl=self.impl,
            name="head",
        )(feat, train)
        out = resize_output(feat)
        return out.reshape(b, 1)
