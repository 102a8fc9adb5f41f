"""SAGAN comparator models (reference benchmark_models/sagan/).

G: SN ConvTranspose ladder (stem k4 from 1x1, then k4 s2 p1 blocks with
BN+ReLU), SelfAttention on the 64-channel map, ConvT to RGB + tanh
(reference sagan_models.py:42-111). D: SN conv ladder with
LeakyReLU(0.1), SelfAttention at 256 channels, 4x4 conv head
(reference sagan_models.py:114-164). Supports image_size 32/64; note the
reference's 64px forward is broken as checked in (it constructs layer4
but skips it, leaving a channel mismatch at the head) — here the 64px
path applies the extra layer and works; 32px matches the reference's
working CIFAR-10 configuration.

Training recipe for parity (reference benchmark_models/sagan/
parameter.py:23-31, trainer.py): TTUR g_lr 1e-4 / d_lr 4e-4,
Adam(0.0, 0.9), d_iters 5, hinge or wgan-gp.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import (
    BatchNorm,
    ConvTranspose2d,
    SelfAttention,
    SNConv2d,
    SNConvTranspose2d,
)


class SAGANGenerator(nn.Module):
    image_size: int = 64
    z_dim: int = 100
    conv_dim: int = 64

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        import numpy as np

        b = z.shape[0]
        repeat_num = int(np.log2(self.image_size)) - 3
        mult = 2**repeat_num
        x = z.reshape(b, 1, 1, self.z_dim)

        curr = self.conv_dim * mult
        x = SNConvTranspose2d(curr, 4, name="l1_conv")(x, train)
        x = BatchNorm(name="l1_bn")(x, train)
        x = nn.relu(x)

        layer_idx = 2
        while curr > self.conv_dim:
            x = SNConvTranspose2d(
                curr // 2, 4, stride=2, padding=1, name=f"l{layer_idx}_conv"
            )(x, train)
            x = BatchNorm(name=f"l{layer_idx}_bn")(x, train)
            x = nn.relu(x)
            curr //= 2
            layer_idx += 1

        x, attn = SelfAttention(name="attn2")(x)
        x = ConvTranspose2d(3, 4, stride=2, padding=1, use_bias=True,
                            name="last")(x)
        return jnp.tanh(x), attn


class SAGANDiscriminator(nn.Module):
    image_size: int = 64
    conv_dim: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        b = x.shape[0]
        curr = self.conv_dim
        x = SNConv2d(curr, 4, stride=2, padding=1, name="l1_conv")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.1)
        n_layers = 3 if self.image_size == 32 else 4
        for i in range(2, n_layers + 1):
            x = SNConv2d(curr * 2, 4, stride=2, padding=1,
                         name=f"l{i}_conv")(x, train)
            x = nn.leaky_relu(x, negative_slope=0.1)
            curr *= 2
            if i == 3:  # reference: attn1 after l3 (256ch at conv_dim=64)
                x, attn = SelfAttention(name="attn1")(x)
        x = SNConv2d(1, 4, stride=1, padding=0, name="last")(x, train)
        return x.reshape(b, 1), attn
