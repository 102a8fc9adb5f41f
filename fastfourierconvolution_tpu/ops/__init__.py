"""Pure functional ops: Fourier transforms, convolutions, spectral norm.

These are the building blocks underneath the flax modules in
``fastfourierconvolution_tpu.nn`` — stateless functions over arrays,
designed for XLA fusion on TPU (and Pallas kernels for the fused
spectral pipeline in ``ops.pallas``).
"""

from . import conv, fourier, spectral_norm  # noqa: F401
from .conv import (  # noqa: F401
    avg_pool2d,
    conv2d,
    conv_transpose2d,
    global_avg_pool,
    upsample_nearest2x,
)
from .fourier import (  # noqa: F401
    irfft2_ortho,
    rfft2_ortho,
    set_default_impl,
    set_dft_precision,
    spectral_channel_mix,
)
from .spectral_norm import power_iteration, spectral_normalize  # noqa: F401
