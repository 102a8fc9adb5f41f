"""Building-block flax modules: spectral-normed layers, noise, attention.

TPU-native re-designs of the reference's layer library (reference
layers/*.py): NHWC layouts, explicit PRNG collections ("noise"), state in
flax variable collections ("batch_stats" for BN running stats, "spectral"
for SN power-iteration vectors) instead of in-place buffer mutation.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import conv as conv_ops
from ..ops import spectral_norm as sn_ops

# Reference init scheme (reference fgan_complete.py:22-31): convs N(0, 0.02),
# BatchNorm scale N(1, 0.02) / bias 0. Linear layers keep torch's default
# kaiming-uniform, i.e. U(+-sqrt(1/fan_in)).
conv_init = nn.initializers.normal(stddev=0.02)
dense_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-compatible hyper-parameters.

    torch defaults: eps 1e-5, running-stat momentum 0.1 (i.e. flax
    momentum 0.9); reference weights_init draws scale from N(1, 0.02).
    Running stats live in the "batch_stats" collection; train mode uses
    batch statistics, eval mode the running averages — the asymmetry the
    reference's uint8 eval-output contract depends on.
    """

    use_scale_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        in_dtype = x.dtype
        out = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            use_scale=self.use_scale_bias,
            use_bias=self.use_scale_bias,
            scale_init=bn_scale_init,
            dtype=jnp.float32,  # stats/normalisation always in f32
        )(x.astype(jnp.float32))
        return out.astype(in_dtype)


class ConditionalBatchNorm(nn.Module):
    """Class-conditional BN (reference layers/cond/cond_bn.py:5-23).

    BN without affine params + per-class (gamma, beta) from an embedding
    table; gamma init N(1, 0.02), beta init 0.
    """

    num_classes: int

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array, train: bool) -> jax.Array:
        c = x.shape[-1]
        in_dtype = x.dtype
        out = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            use_scale=False,
            use_bias=False,
            dtype=jnp.float32,
        )(x.astype(jnp.float32))
        gamma_tbl = self.param(
            "gamma", bn_scale_init, (self.num_classes, c)
        )
        beta_tbl = self.param("beta", nn.initializers.zeros, (self.num_classes, c))
        y = y.reshape(-1).astype(jnp.int32)
        gamma = gamma_tbl[y][:, None, None, :]
        beta = beta_tbl[y][:, None, None, :]
        return (gamma * out + beta).astype(in_dtype)


def _sn_u_init(key, rows: int) -> jax.Array:
    u = jax.random.normal(key, (rows,))
    return u / (jnp.linalg.norm(u) + 1e-12)


class _SpectralMixin:
    """Shared spectral-norm application over a kernel param.

    Semantics: one power iteration per training forward, stored ``u``
    reused at eval (reference torch.nn.utils.spectral_norm;
    benchmark_models/sagan/spectral.py:23-35). ``u`` lives in the
    "spectral" variable collection — callers pass
    ``mutable=["spectral", ...]`` during training.
    """

    def _apply_sn(self, kernel: jax.Array, train: bool) -> jax.Array:
        rows = kernel.shape[-1]
        u_var = self.variable(
            "spectral",
            "u",
            lambda: _sn_u_init(self.make_rng("params"), rows),
        )
        w_norm, u_new = sn_ops.spectral_normalize(
            kernel, u_var.value, update=train
        )
        if train and not self.is_initializing():
            u_var.value = u_new
        return w_norm


class SNDense(nn.Module, _SpectralMixin):
    """Spectral-normalised linear layer."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = dense_init

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        from ..utils.policy import cast_compute

        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features)
        )
        kernel = self._apply_sn(kernel, train)
        y = cast_compute(x) @ cast_compute(kernel)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class SNConv2d(nn.Module, _SpectralMixin):
    """Spectral-normalised 2-D convolution (NHWC)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = conv_init

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, x.shape[-1], self.features)
        )
        kernel = self._apply_sn(kernel, train)
        y = conv_ops.conv2d(x, kernel, stride=self.stride, padding=self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class Conv2d(nn.Module):
    """Plain 2-D convolution (NHWC), reference-init."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    kernel_init: Callable = conv_init

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (k, k, x.shape[-1] // self.groups, self.features),
        )
        y = conv_ops.conv2d(
            x,
            kernel,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class ConvTranspose2d(nn.Module):
    """Transposed 2-D convolution with torch output geometry (NHWC)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    kernel_init: Callable = conv_init

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (k, k, x.shape[-1] // self.groups, self.features),
        )
        y = conv_ops.conv_transpose2d(
            x,
            kernel,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
            dilation=self.dilation,
            groups=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class SNConvTranspose2d(nn.Module, _SpectralMixin):
    """Spectral-normalised transposed convolution (the SAGAN generator's
    SpectralNorm(ConvTranspose2d), reference
    benchmark_models/sagan/sagan_models.py:55-75)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = conv_init

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, cin, self.features)
        )
        # torch stores ConvTranspose2d weights as (in, out, kh, kw) and
        # spectral_norm's default dim=0 matricizes with rows = INPUT
        # channels (reference sagan/spectral.py:23 w.view(height, -1));
        # the (out, -1) view has a different largest singular value, so
        # use the input-rows matricization here
        u_var = self.variable(
            "spectral", "u",
            lambda: _sn_u_init(self.make_rng("params"), cin),
        )
        # spectral_normalize matricizes with rows = LAST dim, so hand it
        # the (out*kh*kw, cin) orientation to make rows = cin
        w_t = kernel.transpose(2, 3, 0, 1).reshape(cin, -1).T
        w_norm_t, u_new = sn_ops.spectral_normalize(
            w_t, u_var.value, update=train
        )
        if train and not self.is_initializing():
            u_var.value = u_new
        kernel = w_norm_t.T.reshape(
            cin, self.features, k, k
        ).transpose(2, 3, 0, 1)
        y = conv_ops.conv_transpose2d(
            x,
            kernel,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class ConvKernelHolder(nn.Module):
    """Parameter holder with the exact tree of Conv2d/ConvTranspose2d.

    The packed-branch FFC path (nn/ffc.py, FFC_TPU_PACKED) assembles one
    block-structured kernel out of the l2l/l2g/g2l branch kernels instead
    of running three half-lane convolutions. This holder declares the
    same ``kernel``/``bias`` params (same names, shapes, inits) as the
    conv modules it stands in for, so checkpoints are interchangeable
    between packed and unpacked execution.
    """

    in_features: int
    features: int
    kernel_size: int
    use_bias: bool = False
    kernel_init: Callable = conv_init

    @nn.compact
    def __call__(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, self.in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class _BNVarsLeaf(nn.Module):
    """flax ``nn.BatchNorm``'s exact param/variable tree, stats computed
    by the caller (the packed-branch BN computes one set of per-channel
    statistics over the concatenated branches — mathematically identical
    to per-branch BN — and hands each branch its slice here)."""

    features: int
    use_scale_bias: bool = True

    @nn.compact
    def __call__(
        self,
        batch_mean: Optional[jax.Array],
        batch_var: Optional[jax.Array],
        train: bool,
    ):
        ra_mean = self.variable(
            "batch_stats",
            "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats",
            "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        scale = bias = None
        if self.use_scale_bias:
            scale = self.param("scale", bn_scale_init, (self.features,))
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
        if train:
            if not self.is_initializing():
                mom = 0.9
                ra_mean.value = mom * ra_mean.value + (1 - mom) * batch_mean
                ra_var.value = mom * ra_var.value + (1 - mom) * batch_var
            return batch_mean, batch_var, scale, bias
        return ra_mean.value, ra_var.value, scale, bias


class BatchNormHolder(nn.Module):
    """Tree-twin of :class:`BatchNorm` for the packed-branch path: same
    nested ``BatchNorm_0`` param/stat layout, statistics supplied by the
    caller."""

    features: int
    use_scale_bias: bool = True

    @nn.compact
    def __call__(self, batch_mean, batch_var, train: bool):
        return _BNVarsLeaf(
            self.features, self.use_scale_bias, name="BatchNorm_0"
        )(batch_mean, batch_var, train)


class NoiseWeightHolder(nn.Module):
    """Tree-twin of :class:`NoiseInjection` for the packed-branch path:
    declares the same per-channel ``weight`` and draws the same
    (B, H, W, 1) noise from the same "noise" stream (identical module
    path => identical fold => identical draw); the caller applies it to
    its branch slice."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        weight = self.param(
            "weight", nn.initializers.zeros, (1, 1, 1, self.features)
        )
        noise = jax.random.normal(
            self.make_rng("noise"),
            (x.shape[0], x.shape[1], x.shape[2], 1),
            dtype=x.dtype,
        )
        return weight, noise


class NoiseInjection(nn.Module):
    """StyleGAN-style learnable noise (reference layers/noise_injection.py:20-31).

    Adds ``weight * N(0,1)`` single-channel spatial noise; per-channel
    weight initialised to zero. Noise is drawn from the "noise" PRNG
    collection.
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.zeros, (1, 1, 1, c))
        # draw in the activation dtype: f32 noise maps forced f32
        # intermediates into otherwise-bf16 fusions (profiled round 2)
        noise = jax.random.normal(
            self.make_rng("noise"),
            (x.shape[0], x.shape[1], x.shape[2], 1),
            dtype=x.dtype,
        )
        return x + weight.astype(x.dtype) * noise


class GaussianNoise(nn.Module):
    """Input-noise regulariser, active only in training
    (reference layers/gaussian_noise.py:6-15)."""

    stddev: float = 0.05

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if not train or self.stddev == 0.0:
            return x
        noise = self.stddev * jax.random.normal(
            self.make_rng("noise"), x.shape, dtype=x.dtype
        )
        return x + noise


class SelfAttention(nn.Module):
    """SAGAN self-attention (reference layers/attention_layer.py:8-40).

    q/k project to C/8, softmax over the key axis, residual scaled by a
    learnable scalar gamma initialised at 0. The N x N attention matrix is
    two batched matmuls — MXU-friendly at the <=64x64 maps this runs on.
    Returns ``(out, attention)`` like the reference.
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        from ..utils.policy import cast_compute

        b, h, w, c = x.shape
        n = h * w
        q = Conv2d(c // 8, 1, use_bias=True)(x).reshape(b, n, c // 8)
        k = Conv2d(c // 8, 1, use_bias=True)(x).reshape(b, n, c // 8)
        v = Conv2d(c, 1, use_bias=True)(x).reshape(b, n, c)
        energy = jnp.einsum(
            "bic,bjc->bij",
            cast_compute(q),
            cast_compute(k),
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(energy, axis=-1)  # f32 softmax
        out = jnp.einsum(
            "bij,bjc->bic",
            cast_compute(attn),
            cast_compute(v),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma.astype(x.dtype) * out + x, attn


class SELayer(nn.Module):
    """Squeeze-and-excite gate (reference layers/ffc/spectral_transform.py:12-28)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..utils.policy import compute_dtype

        c = x.shape[-1]
        hidden = max(c // self.reduction, 1)
        dt = compute_dtype()
        y = conv_ops.global_avg_pool(x)  # (B, C)
        y = nn.Dense(hidden, use_bias=False, kernel_init=dense_init, dtype=dt)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, kernel_init=dense_init, dtype=dt)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


# Fast-GELU gate. torch nn.GELU's default (the reference's choice,
# fgan128_complete.py:458-479) is the exact erf form; its erfc/exp
# polynomial chains are VPU-bound on TPU — the round-3 128px trace put
# the GELU elementwise fusions at ~6.5 ms of a 71 ms step, and the
# tanh form measured 40% faster on the (64,128,128,128) map (fwd 1.71
# vs 2.82 ms, grad 1.70 vs 2.96). The tanh approximation's max abs
# deviation from exact GELU is 4.3e-4 — ~10x BELOW bf16 output
# quantization (1 ulp at unit scale is 3.9e-3, tests/test_layers.py
# bound) — so a bf16 activation pipeline cannot meaningfully
# distinguish the two. Policy default: tanh iff the value being
# activated is bf16; f32 runs (golden/parity tests, f32 training)
# always get exact erf. FFC_TPU_FAST_GELU=0/1 forces either way.
_FAST_GELU = os.environ.get("FFC_TPU_FAST_GELU", "policy")


def set_fast_gelu(mode) -> None:
    """mode: "policy" (tanh iff bf16 input), True/1 force tanh,
    False/0 force exact erf."""
    global _FAST_GELU
    _FAST_GELU = (
        mode if mode == "policy" else ("1" if mode and mode != "0" else "0")
    )


def gelu_is_fast(dtype) -> bool:
    """Whether :func:`gelu` uses the tanh form for this dtype under the
    current policy (consulted by the fused BN+GELU dispatch,
    ops/pallas/bn_act.py)."""
    if _FAST_GELU == "policy":
        return dtype == jnp.bfloat16
    return _FAST_GELU != "0"


def gelu(x: jax.Array) -> jax.Array:
    return nn.gelu(x, approximate=gelu_is_fast(x.dtype))


# Activation registry (reference passes activation classes around;
# FFC_BN_ACT gives LeakyReLU slope 0.1, reference layers/ffc/ffc_bn_act.py:66-67).
ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "identity": lambda x: x,
    "relu": nn.relu,
    # exact (erf) gelu for f32, tanh form for bf16 (see gate above)
    "gelu": gelu,
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
    "leaky_relu_0.2": lambda x: nn.leaky_relu(x, negative_slope=0.2),
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
}
