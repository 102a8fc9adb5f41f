"""Interpret-mode parity tests for the fused packed-BN + tanh-GELU
Pallas family (ops/pallas/bn_act.py) against the exact jnp chain it
replaces — forward values, the fully coupled BN backward (including the
batch-stat output cotangents), multi-step grid accumulation, and the
module-level integration in FFC_BN_ACT's packed path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastfourierconvolution_tpu.ops.pallas import bn_act as B


def _data(shape, dtype, seed=0):
    rng = np.random.RandomState(seed)
    c = shape[-1]
    x = jnp.asarray(rng.randn(*shape) * 1.5 + 0.3, dtype)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    bias = jnp.asarray(rng.randn(c) * 0.2, jnp.float32)
    return x, scale, bias


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(8, 8, 8, 128), (4, 8, 16, 256)])
def test_forward_parity(dtype, shape):
    x, scale, bias = _data(shape, dtype)
    out, m, v = B.packed_bn_gelu(x, scale, bias, True)
    want, wm, wv = B.bn_gelu_chain_jnp(x, scale, bias)
    np.testing.assert_allclose(np.asarray(m), np.asarray(wm),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(wv),
                               rtol=1e-4, atol=1e-5)
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=atol,
    )


def test_forward_accumulation_multi_tile():
    """Grid accumulation across many tiles: C=512 forces a small row
    tile so the stats output block is revisited and accumulated."""
    x, scale, bias = _data((8, 16, 32, 512), jnp.float32, seed=3)
    rows = 8 * 16 * 32
    tr = B._tile_rows(rows, 512, 4)
    assert rows // tr >= 4  # genuinely multi-step
    out, m, v = B.packed_bn_gelu(x, scale, bias, True)
    want, wm, wv = B.bn_gelu_chain_jnp(x, scale, bias)
    np.testing.assert_allclose(np.asarray(m), np.asarray(wm),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(wv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grad_parity_coupled_bn_backward(dtype):
    """jax.grad through the fused op must match grad through the jnp
    chain — a scalar loss weighting out AND bmean AND bvar exercises
    the stats-output cotangent terms of the coupled backward."""
    shape = (8, 8, 8, 128)
    x, scale, bias = _data(shape, dtype, seed=1)
    rng = np.random.RandomState(2)
    r_out = jnp.asarray(rng.randn(*shape), jnp.float32)
    r_m = jnp.asarray(rng.randn(shape[-1]), jnp.float32)
    r_v = jnp.asarray(rng.randn(shape[-1]), jnp.float32)

    def loss(fn, x, s, b):
        out, m, v = fn(x, s, b)
        return (
            jnp.sum(out.astype(jnp.float32) * r_out)
            + jnp.sum(m * r_m)
            + jnp.sum(v * r_v)
        )

    gx, gs, gb = jax.grad(
        lambda x, s, b: loss(
            lambda *a: B.packed_bn_gelu(*a, True), x, s, b
        ),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    wx, ws, wb = jax.grad(
        lambda x, s, b: loss(B.bn_gelu_chain_jnp, x, s, b),
        argnums=(0, 1, 2),
    )(x, scale, bias)

    if dtype == jnp.float32:
        atol_x, atol_v = 2e-3, 2e-2  # grads are O(1e1) sums over 512 rows
    else:
        atol_x, atol_v = 2e-1, 2.0
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), np.asarray(wx, np.float32),
        atol=atol_x,
    )
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws),
                               rtol=2e-2, atol=atol_v)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(wb),
                               rtol=2e-2, atol=atol_v)


def test_shape_gate():
    assert B.fused_shape_legal((64, 8, 8, 512), jnp.bfloat16)
    assert B.fused_shape_legal((64, 128, 128, 128), jnp.bfloat16)
    assert not B.fused_shape_legal((64, 32, 32, 64), jnp.bfloat16)  # C%128
    assert not B.fused_shape_legal((2, 4, 4, 128), jnp.bfloat16)  # rows
    assert not B.fused_shape_legal((64, 8, 8, 512), jnp.float16)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_noise_variant_forward_and_grad_parity(dtype):
    """The noise-folded op vs the jnp chain + packed_noise_inject math:
    forward values and gradients for every input incl. the per-channel
    noise weight and both noise maps."""
    shape, cl = (8, 8, 8, 128), 48
    x, scale, bias = _data(shape, dtype, seed=4)
    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(shape[-1]) * 0.3, jnp.float32)
    n_l = jnp.asarray(rng.randn(*shape[:3], 1), dtype)
    n_g = jnp.asarray(rng.randn(*shape[:3], 1), dtype)

    out, m, v = B.packed_bn_gelu_noise(x, scale, bias, w, n_l, n_g, cl,
                                       True)
    want, wm, wv = B.bn_gelu_noise_chain_jnp(x, scale, bias, w, n_l,
                                             n_g, cl)
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=atol,
    )
    np.testing.assert_allclose(np.asarray(m), np.asarray(wm), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(wv), atol=1e-4)

    r_out = jnp.asarray(rng.randn(*shape), jnp.float32)

    def loss(fn, *args):
        out, m, v = fn(*args)
        return (
            jnp.sum(out.astype(jnp.float32) * r_out)
            + jnp.sum(m) + jnp.sum(v)
        )

    grads_f = jax.grad(
        lambda *a: loss(
            lambda *b: B.packed_bn_gelu_noise(*b, cl, True), *a
        ),
        argnums=(0, 1, 2, 3, 4, 5),
    )(x, scale, bias, w, n_l, n_g)
    grads_j = jax.grad(
        lambda *a: loss(
            lambda *b: B.bn_gelu_noise_chain_jnp(*b, cl), *a
        ),
        argnums=(0, 1, 2, 3, 4, 5),
    )(x, scale, bias, w, n_l, n_g)
    for gf, gj in zip(grads_f, grads_j):
        a = np.asarray(gf, np.float32)
        b = np.asarray(gj, np.float32)
        if dtype == jnp.float32:
            np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-3)
        else:
            # bf16: the jnp path reduces in bf16 while the kernel
            # accumulates in f32 — the disagreement is the jnp side's
            # quantization noise; bound it relative to the grad scale
            assert np.abs(a - b).max() <= 0.05 * max(
                1.0, np.abs(b).max()
            ), (np.abs(a - b).max(), np.abs(b).max())


def test_generator_fused_vs_default_end_to_end():
    """FFCGenerator forward+backward with the fused family (incl. the
    noise fold) must match the default packed path: same output, same
    gradients w.r.t. params, identical param/variable trees — the flip
    is numerics-parity-safe like the packed flip itself."""
    from fastfourierconvolution_tpu.models import FFCGenerator
    from fastfourierconvolution_tpu.nn import layers as L

    gen = FFCGenerator(
        z_size=32, ngf=32, ratio_g=0.25, mg=4, channel_mults=(4,),
        packed=True,
    )
    z = jax.random.normal(jax.random.PRNGKey(0), (8, 32))
    init_rngs = {"params": jax.random.PRNGKey(1),
                 "noise": jax.random.PRNGKey(2)}

    old_fast = L._FAST_GELU
    L.set_fast_gelu(True)
    try:
        B.set_fused_bn_enabled(True)
        try:
            v_fused = gen.init(init_rngs, z, True)
        finally:
            B.set_fused_bn_enabled(False)
        v_plain = gen.init(init_rngs, z, True)
        assert jax.tree_util.tree_structure(
            v_fused
        ) == jax.tree_util.tree_structure(v_plain)

        def fwd(variables, fused):
            B.set_fused_bn_enabled(fused)
            try:
                out, _ = gen.apply(
                    variables, z, True,
                    rngs={"noise": jax.random.PRNGKey(2)},
                    mutable=["batch_stats"],
                )
            finally:
                B.set_fused_bn_enabled(False)
            return out

        out_f = fwd(v_plain, True)
        out_j = fwd(v_plain, False)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_j),
                                   atol=2e-5)

        def loss(variables, fused):
            return jnp.sum(jnp.square(fwd(variables, fused)))

        gf = jax.grad(lambda v: loss(v, True))(v_plain)["params"]
        gj = jax.grad(lambda v: loss(v, False))(v_plain)["params"]
        leaves_f, _ = jax.tree_util.tree_flatten(gf)
        leaves_j, _ = jax.tree_util.tree_flatten(gj)
        for a, b in zip(leaves_f, leaves_j):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-3
            )
    finally:
        L.set_fast_gelu(old_fast)


def test_cond_generator_fused_vs_default_end_to_end():
    """FFCCondGenerator (packed, unconditional-BN) with the fused family
    must match the default packed path — the conditional ladder gets the
    same noise-fold dispatch as FFCGenerator (round-4 review item)."""
    from fastfourierconvolution_tpu.models.conditional import (
        FFCCondGenerator,
    )
    from fastfourierconvolution_tpu.nn import layers as L

    gen = FFCCondGenerator(
        z_size=32, ngf=32, ratio_g=0.25, num_classes=10, mg=4,
        channel_mults=(4,), stem="dense", cond_bn=False, packed=True,
    )
    z = jax.random.normal(jax.random.PRNGKey(0), (8, 32))
    y = jnp.arange(8) % 10
    init_rngs = {"params": jax.random.PRNGKey(1),
                 "noise": jax.random.PRNGKey(2)}

    old_fast = L._FAST_GELU
    L.set_fast_gelu(True)
    try:
        variables = gen.init(init_rngs, z, True, y)

        def fwd(fused):
            B.set_fused_bn_enabled(fused)
            try:
                out, _ = gen.apply(
                    variables, z, True, y,
                    rngs={"noise": jax.random.PRNGKey(2)},
                    mutable=["batch_stats"],
                )
            finally:
                B.set_fused_bn_enabled(False)
            return out

        np.testing.assert_allclose(
            np.asarray(fwd(True)), np.asarray(fwd(False)), atol=2e-5
        )
    finally:
        L.set_fast_gelu(old_fast)


def test_module_integration_fused_vs_jnp():
    """FFC_BN_ACT packed path with the fused kernels forced ON must
    reproduce the jnp path: same output, same running-stat updates,
    identical variable trees (checkpoints interchangeable)."""
    from flax.core import FrozenDict

    from fastfourierconvolution_tpu.nn import layers as L
    from fastfourierconvolution_tpu.nn.ffc import FFC_BN_ACT, Packed

    mod = FFC_BN_ACT(
        in_channels=128, out_channels=128, kernel_size=3,
        ratio_gin=0.5, ratio_gout=0.5, padding=1,
        norm="batch", activation="gelu", packed=True,
    )
    rng = np.random.RandomState(0)
    x = Packed(jnp.asarray(rng.randn(8, 8, 8, 128), jnp.float32), 64)
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)}

    old_fast = L._FAST_GELU
    L.set_fast_gelu(True)  # tanh form for f32 too, so both paths agree
    try:
        variables = mod.init(init_rngs, x, True)

        def run(fused):
            B.set_fused_bn_enabled(fused)
            try:
                (out, _), updates = mod.apply(
                    variables, x, True, mutable=["batch_stats"],
                    rngs={"noise": jax.random.PRNGKey(1)},
                    method=lambda m, a, t: (m(a, t).x, 0),
                )
            finally:
                B.set_fused_bn_enabled(False)
            return out, updates["batch_stats"]

        out_f, stats_f = run(True)
        out_j, stats_j = run(False)
    finally:
        L.set_fast_gelu(old_fast)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_j),
                               atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        FrozenDict(stats_f), FrozenDict(stats_j),
    )
