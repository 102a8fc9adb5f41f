"""Flax modules: FFC layer family + building blocks."""

from .ffc import (  # noqa: F401
    FFC,
    FFC_BN_ACT,
    FFCTranspose,
    FourierUnit,
    SpectralTransform,
    resize_output,
    split_channels,
)
from .layers import (  # noqa: F401
    ACTIVATIONS,
    BatchNorm,
    ConditionalBatchNorm,
    Conv2d,
    ConvTranspose2d,
    GaussianNoise,
    NoiseInjection,
    SELayer,
    SelfAttention,
    SNConv2d,
    SNDense,
)
