"""fastfourierconvolution_tpu — a TPU-native Fast Fourier Convolution GAN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
phbgomes22/FastFourierConvolution (PyTorch): FFC layers with local/global
channel splits and spectral-domain channel mixing, DCGAN/SNGAN-style
generators and discriminators, conditional variants, spectral
normalisation, hinge-loss GAN training, and a jit'd FID/IS/KID evaluation
pipeline.

Design stance (not a port):
  * channels-last NHWC layouts (TPU native),
  * functional ops + flax.linen modules, explicit PRNG keys,
  * the FourierUnit spectral pipeline runs as MXU matmuls
    (DFT-as-matmul) with an optional fused Pallas kernel,
  * data/tensor parallelism via jax.sharding.Mesh + jit shardings,
  * one config tree + one driver instead of per-script argparse clones.

Reference layer map: see SURVEY.md §1-2 (layers/ffc/*, models/*,
torch_fidelity/* of the reference repo).
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
