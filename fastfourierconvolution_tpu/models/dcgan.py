"""Vanilla DCGAN models — the plain-conv A/B baselines.

Re-designs of the reference's torch-tutorial DCGAN
(reference models/generator.py:10-48, models/discriminator.py:9-47,
models/sn/sn_discriminator.py:5-39) plus the attention generator kept
inline in the reference training script (fgan_complete.py:34-79).
NHWC; the z input is a flat (B, nz) vector (the reference's
(B, nz, 1, 1) NCHW convention collapses to this).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import (
    BatchNorm,
    Conv2d,
    ConvTranspose2d,
    SelfAttention,
    SNConv2d,
    dense_init,
)


class DCGANGenerator(nn.Module):
    """5-step ConvTranspose ladder: z -> 4x4 -> ... -> 64x64
    (reference models/generator.py:22-43)."""

    nz: int = 100
    nc: int = 3
    ngf: int = 64

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        x = z.reshape(z.shape[0], 1, 1, self.nz)
        for i, mult in enumerate((8, 4, 2, 1)):
            stride, pad = (1, 0) if i == 0 else (2, 1)
            x = ConvTranspose2d(
                self.ngf * mult, 4, stride=stride, padding=pad,
                name=f"convt{i}",
            )(x)
            x = BatchNorm(name=f"bn{i}")(x, train)
            x = nn.relu(x)
        x = ConvTranspose2d(self.nc, 4, stride=2, padding=1, name="to_rgb")(x)
        return jnp.tanh(x)


class DCGANDiscriminator(nn.Module):
    """Mirror conv ladder with BN + LeakyReLU(0.2), sigmoid head
    (reference models/discriminator.py:21-42). Output (B, 1) in (0, 1)."""

    nc: int = 3
    ndf: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        for i, mult in enumerate((1, 2, 4, 8)):
            x = Conv2d(self.ndf * mult, 4, stride=2, padding=1,
                       name=f"conv{i}")(x)
            if i > 0:
                x = BatchNorm(name=f"bn{i}")(x, train)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = Conv2d(1, 4, stride=1, padding=0, name="head")(x)
        return nn.sigmoid(x.reshape(x.shape[0], 1))


class SNDCGANDiscriminator(nn.Module):
    """DCGAN discriminator with spectral norm and no BN
    (reference models/sn/sn_discriminator.py:17-36)."""

    nc: int = 3
    ndf: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        for i, mult in enumerate((1, 2, 4, 8)):
            x = SNConv2d(self.ndf * mult, 4, stride=2, padding=1,
                         use_bias=True, name=f"conv{i}")(x, train)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = SNConv2d(1, 4, stride=1, padding=0, use_bias=True, name="head")(
            x, train
        )
        return nn.sigmoid(x.reshape(x.shape[0], 1))


class AttnConvGenerator(nn.Module):
    """ConvTranspose generator with SAGAN self-attention before the RGB
    head (reference fgan_complete.py:34-79): Dense stem -> 3 ConvT blocks
    512->256->128->64 -> Self_Attn -> 3x3 ConvT -> tanh. 32px at mg=4."""

    z_size: int = 128
    mg: int = 4
    ngf: int = 64

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        b = z.shape[0]
        x = nn.Dense(
            self.mg * self.mg * self.ngf * 8,
            kernel_init=dense_init,
            name="noise_to_feature",
        )(z)
        x = x.reshape(b, self.mg, self.mg, self.ngf * 8)
        for i, mult in enumerate((4, 2, 1)):
            x = ConvTranspose2d(self.ngf * mult, 4, stride=2, padding=1,
                                name=f"convt{i}")(x)
            x = BatchNorm(name=f"bn{i}")(x, train)
            x = nn.relu(x)
        x, _ = SelfAttention(name="attn")(x)
        x = ConvTranspose2d(3, 3, stride=1, padding=1, name="to_rgb")(x)
        return jnp.tanh(x)
