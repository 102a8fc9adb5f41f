"""SNGAN ResNet backbones (GBlock / DBlock / DBlockOptimized).

Re-designs of the reference's inline mimicry-style SNGAN blocks
(reference fgan128_complete.py:75-438; duplicated in
resnet_complete.py:26-427):

  * GBlock: BN -> ReLU -> [bilinear x2] -> SN conv3x3 -> BN -> ReLU ->
    SN conv3x3, with a learnable (SN 1x1) shortcut when shape changes;
    optional conditional BN;
  * DBlock: ReLU -> SN conv3x3 -> ReLU -> SN conv3x3 [-> avgpool2], SN
    1x1 shortcut; DBlockOptimized is the stem variant (conv first,
    pool in both paths);
  * SNGANGenerator / SNGANDiscriminator at 128px (5 blocks, ngf 1024)
    and 32px (3 blocks, ngf 256 — the standard SNGAN-CIFAR recipe; the
    reference's resnet_complete.py intends this config but is broken as
    checked in, see SURVEY §1).

Init: xavier-uniform gain sqrt(2) on residual convs, gain 1 on shortcuts
and heads — the SNGAN paper recipe the reference follows.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import (
    BatchNorm,
    ConditionalBatchNorm,
    SNConv2d,
    SNDense,
)
from ..ops.conv import avg_pool2d, upsample_bilinear_torch

xavier2 = nn.initializers.variance_scaling(2.0, "fan_avg", "uniform")
xavier1 = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


class GBlock(nn.Module):
    out_channels: int
    hidden_channels: Optional[int] = None
    upsample: bool = False
    num_classes: int = 0

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool, y: Optional[jax.Array] = None
    ) -> jax.Array:
        in_ch = x.shape[-1]
        hidden = self.hidden_channels or self.out_channels
        learnable_sc = in_ch != self.out_channels or self.upsample

        def norm(v, name):
            if self.num_classes > 0 and y is not None:
                return ConditionalBatchNorm(self.num_classes, name=name)(
                    v, y, train
                )
            return BatchNorm(name=name)(v, train)

        h = norm(x, "b1")
        h = nn.relu(h)
        if self.upsample:
            h = upsample_bilinear_torch(h, 2)
        h = SNConv2d(hidden, 3, padding=1, kernel_init=xavier2, name="c1")(
            h, train
        )
        h = norm(h, "b2")
        h = nn.relu(h)
        h = SNConv2d(
            self.out_channels, 3, padding=1, kernel_init=xavier2, name="c2"
        )(h, train)

        sc = x
        if learnable_sc:
            if self.upsample:
                sc = upsample_bilinear_torch(sc, 2)
            sc = SNConv2d(
                self.out_channels, 1, kernel_init=xavier1, name="c_sc"
            )(sc, train)
        return h + sc


class DBlock(nn.Module):
    out_channels: int
    hidden_channels: Optional[int] = None
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        in_ch = x.shape[-1]
        hidden = self.hidden_channels or in_ch
        learnable_sc = in_ch != self.out_channels or self.downsample

        h = nn.relu(x)
        h = SNConv2d(hidden, 3, padding=1, kernel_init=xavier2, name="c1")(
            h, train
        )
        h = nn.relu(h)
        h = SNConv2d(
            self.out_channels, 3, padding=1, kernel_init=xavier2, name="c2"
        )(h, train)
        if self.downsample:
            h = avg_pool2d(h)

        sc = x
        if learnable_sc:
            sc = SNConv2d(
                self.out_channels, 1, kernel_init=xavier1, name="c_sc"
            )(sc, train)
            if self.downsample:
                sc = avg_pool2d(sc)
        return h + sc


class DBlockOptimized(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        h = SNConv2d(
            self.out_channels, 3, padding=1, kernel_init=xavier2, name="c1"
        )(x, train)
        h = nn.relu(h)
        h = SNConv2d(
            self.out_channels, 3, padding=1, kernel_init=xavier2, name="c2"
        )(h, train)
        h = avg_pool2d(h)
        sc = SNConv2d(
            self.out_channels, 1, kernel_init=xavier1, name="c_sc"
        )(avg_pool2d(x), train)
        return h + sc


class SNGANGenerator(nn.Module):
    """ResNet generator; num_blocks upsampling GBlocks from bottom_width.

    128px: ngf=1024, 5 blocks (reference SNGANGenerator128,
    fgan128_complete.py:334-404). 32px: ngf=256, 3 blocks.
    """

    nz: int = 128
    ngf: int = 1024
    bottom_width: int = 4
    num_blocks: int = 5
    num_classes: int = 0

    @nn.compact
    def __call__(
        self, z: jax.Array, train: bool, y: Optional[jax.Array] = None
    ) -> jax.Array:
        b = z.shape[0]
        h = nn.Dense(
            (self.bottom_width**2) * self.ngf, kernel_init=xavier1, name="l1"
        )(z)
        h = h.reshape(b, self.bottom_width, self.bottom_width, self.ngf)
        for i in range(self.num_blocks):
            # 128px ladder halves channels each block after the first
            # (ngf, ngf/2, ..., ngf/16); 32px keeps ngf throughout.
            out_ch = self.ngf >> i if self.num_blocks == 5 else self.ngf
            h = GBlock(
                out_ch,
                upsample=True,
                num_classes=self.num_classes,
                name=f"block{i + 2}",
            )(h, train, y)
        h = BatchNorm(name="b_out")(h, train)
        h = nn.relu(h)
        # final RGB conv is NOT spectral-normed in the reference
        from ..nn.layers import Conv2d

        h = Conv2d(3, 3, padding=1, use_bias=True, kernel_init=xavier1,
                   name="c_out")(h)
        return jnp.tanh(h)


class SNGANDiscriminator(nn.Module):
    """ResNet discriminator: DBlockOptimized stem, downsampling DBlocks,
    final non-downsampling DBlock, ReLU, global sum pool, SN linear."""

    ndf: int = 1024
    num_blocks: int = 5  # total residual blocks incl. stem

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.num_blocks == 5:  # 128px ladder
            widths = [self.ndf >> 4, self.ndf >> 3, self.ndf >> 2,
                      self.ndf >> 1, self.ndf]
        else:  # 32px ladder (SNGAN-CIFAR): ndf stem + 2 down + final
            widths = [self.ndf] * self.num_blocks
        h = DBlockOptimized(widths[0], name="block1")(x, train)
        for i, w in enumerate(widths[1:], start=2):
            h = DBlock(w, downsample=True, name=f"block{i}")(h, train)
        h = DBlock(widths[-1], downsample=False, name=f"block{len(widths) + 1}")(
            h, train
        )
        h = nn.relu(h)
        h = jnp.sum(h, axis=(1, 2))  # global sum pooling
        return SNDense(1, kernel_init=xavier1, name="l_out")(h, train)


def sngan_generator_128(nz: int = 128, ngf: int = 1024) -> SNGANGenerator:
    return SNGANGenerator(nz=nz, ngf=ngf, bottom_width=4, num_blocks=5)


def sngan_discriminator_128(ndf: int = 1024) -> SNGANDiscriminator:
    return SNGANDiscriminator(ndf=ndf, num_blocks=5)


def sngan_generator_32(nz: int = 128, ngf: int = 256) -> SNGANGenerator:
    return SNGANGenerator(nz=nz, ngf=ngf, bottom_width=4, num_blocks=3)


def sngan_discriminator_32(ndf: int = 128) -> SNGANDiscriminator:
    return SNGANDiscriminator(ndf=ndf, num_blocks=3)
