"""FFC layer-family tests: channel-split arithmetic, shapes, branch
elision, statefulness (BN running stats, SN u updates), noise RNG."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fastfourierconvolution_tpu.nn as fnn
from fastfourierconvolution_tpu.nn.ffc import split_channels


@pytest.mark.parametrize(
    "c,r,expected",
    [(64, 0.25, (48, 16)), (64, 0.5, (32, 32)), (3, 0.0, (3, 0)),
     (10, 0.3, (7, 3)), (256, 0.25, (192, 64))],
)
def test_split_channels_reference_arithmetic(c, r, expected):
    # int(c * ratio) truncation, exactly like reference ffc.py:33-36
    assert split_channels(c, r) == expected


def _init_and_apply(module, x, train=True, y=None, rngs=None):
    rngs = rngs or {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = module.init(rngs, x, train, y) if y is not None else module.init(rngs, x, train)
    mutable = ["batch_stats", "spectral"]
    args = (x, train, y) if y is not None else (x, train)
    out, updates = module.apply(
        variables, *args, rngs={"noise": rngs["noise"]}, mutable=mutable
    )
    return out, variables, updates


def test_fourier_unit_shape_and_finiteness():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 8).astype(np.float32))
    fu = fnn.FourierUnit(channels=8)
    out, _, _ = _init_and_apply(fu, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_spectral_transform_stride2_down_and_up():
    x = jnp.zeros((2, 16, 16, 8))
    st_down = fnn.SpectralTransform(out_channels=12, stride=2, upsample=False)
    out, _, _ = _init_and_apply(st_down, x)
    assert out.shape == (2, 8, 8, 12)
    st_up = fnn.SpectralTransform(out_channels=12, stride=2, upsample=True)
    out, _, _ = _init_and_apply(st_up, x)
    assert out.shape == (2, 32, 32, 12)


def test_ffc_branch_shapes():
    x_l = jnp.zeros((2, 16, 16, 24))
    x_g = jnp.zeros((2, 16, 16, 8))
    ffc = fnn.FFC(32, 64, 3, ratio_gin=0.25, ratio_gout=0.25, padding=1)
    (out_l, out_g), _, _ = _init_and_apply(ffc, (x_l, x_g))
    assert out_l.shape == (2, 16, 16, 48)
    assert out_g.shape == (2, 16, 16, 16)


def test_ffc_elides_missing_branches():
    # ratio_gin=0, ratio_gout=0: pure local conv, no spectral params
    x = jnp.zeros((2, 16, 16, 8))
    ffc = fnn.FFC(8, 16, 3, ratio_gin=0.0, ratio_gout=0.0, padding=1)
    (out_l, out_g), variables, _ = _init_and_apply(ffc, (x, None))
    assert out_g is None
    assert out_l.shape == (2, 16, 16, 16)
    names = set(variables["params"].keys())
    assert names == {"convl2l"}, names


def test_ffc_ratio1_global_only():
    x_g = jnp.zeros((2, 8, 8, 16))
    ffc = fnn.FFC(16, 16, 3, ratio_gin=1.0, ratio_gout=1.0, padding=1)
    (out_l, out_g), variables, _ = _init_and_apply(ffc, (None, x_g))
    assert out_l is None
    assert out_g.shape == (2, 8, 8, 16)
    assert set(variables["params"].keys()) == {"convg2g"}


@pytest.mark.slow
def test_ffc_transpose_upsamples_2x():
    x_l = jnp.zeros((2, 8, 8, 24))
    x_g = jnp.zeros((2, 8, 8, 8))
    ffct = fnn.FFCTranspose(32, 16, 4, ratio_gin=0.25, ratio_gout=0.25,
                            stride=2, padding=1)
    (out_l, out_g), _, _ = _init_and_apply(ffct, (x_l, x_g))
    assert out_l.shape == (2, 16, 16, 12)
    assert out_g.shape == (2, 16, 16, 4)


@pytest.mark.slow
def test_ffc_bn_act_full_block():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 32).astype(np.float32))
    blk = fnn.FFC_BN_ACT(32, 16, 4, ratio_gin=0.0, ratio_gout=0.25, stride=2,
                         padding=1, norm="batch", activation="gelu",
                         upsampling=True)
    (out_l, out_g), _, updates = _init_and_apply(blk, (x, None))
    assert out_l.shape == (2, 16, 16, 12)
    assert out_g.shape == (2, 16, 16, 4)
    # BN running stats must update in train mode
    assert "batch_stats" in updates
    flat = flax.traverse_util.flatten_dict(updates["batch_stats"])
    assert any(np.abs(np.asarray(v)).sum() > 0 for k, v in flat.items() if k[-1] == "mean")


@pytest.mark.slow
def test_conditional_bn_path():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 16).astype(np.float32))
    y = jnp.asarray([0, 1, 2, 3])
    blk = fnn.FFC_BN_ACT(16, 16, 3, ratio_gin=0.25, ratio_gout=0.25, padding=1,
                         norm="batch", activation="relu", num_classes=10)
    (out_l, out_g), variables, _ = _init_and_apply(blk, (x[..., :12], x[..., 12:]), y=y)
    flat = flax.traverse_util.flatten_dict(variables["params"])
    assert any("gamma" in k for k in flat), "conditional BN gamma table missing"
    assert out_l.shape == (4, 8, 8, 12)


def test_sn_conv_updates_u_in_train_only():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4).astype(np.float32))
    m = fnn.SNConv2d(8, 3, padding=1)
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, True)
    u0 = np.asarray(variables["spectral"]["u"])
    _, ups = m.apply(variables, x, True, mutable=["spectral"])
    u1 = np.asarray(ups["spectral"]["u"])
    assert not np.allclose(u0, u1)
    _, ups = m.apply(variables, x, False, mutable=["spectral"])
    u2 = np.asarray(ups["spectral"]["u"])
    np.testing.assert_array_equal(u0, u2)


def test_noise_injection_zero_at_init():
    # weight starts at zero => output == input (reference noise_injection.py)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4).astype(np.float32))
    m = fnn.NoiseInjection()
    variables = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    out = m.apply(variables, x, rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_gaussian_noise_train_eval():
    x = jnp.zeros((2, 4, 4, 3))
    m = fnn.GaussianNoise(stddev=0.5)
    variables = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x, True)
    out_train = m.apply(variables, x, True, rngs={"noise": jax.random.PRNGKey(2)})
    out_eval = m.apply(variables, x, False, rngs={"noise": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(out_train)).sum() > 0
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))


def test_self_attention_residual_identity_at_init():
    # gamma starts at 0 => out == x
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16).astype(np.float32))
    m = fnn.SelfAttention()
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    out, attn = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    assert attn.shape == (2, 64, 64)
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-5)


def test_resize_output():
    a = jnp.ones((1, 2, 2, 3))
    b = jnp.zeros((1, 2, 2, 5))
    assert fnn.resize_output((a, None)).shape == (1, 2, 2, 3)
    assert fnn.resize_output((a, b)).shape == (1, 2, 2, 8)
    assert fnn.resize_output(a).shape == (1, 2, 2, 3)


@pytest.mark.slow
def test_lfu_enabled_works():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16).astype(np.float32))
    st = fnn.SpectralTransform(out_channels=16, enable_lfu=True)
    out, _, _ = _init_and_apply(st, x)
    assert out.shape == (2, 16, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_ffc_transpose_use_sn():
    """SN on the transposed conv branches (the reference SNFFCTranspose
    intent — its checked-in class is broken, SURVEY §1)."""
    from fastfourierconvolution_tpu.nn.ffc import FFCTranspose

    m = FFCTranspose(8, 8, 4, 0.5, 0.5, stride=2, padding=1, use_sn=True)
    x = jnp.ones((2, 4, 4, 8))
    xl, xg = x[..., :4], x[..., 4:]
    variables = m.init(
        {"params": jax.random.PRNGKey(0)}, (xl, xg), False
    )
    assert "spectral" in variables  # SN u-vectors present
    (ol, og), updates = m.apply(
        variables, (xl, xg), True, mutable=["spectral", "batch_stats"]
    )
    assert ol.shape == (2, 8, 8, 4) and og.shape == (2, 8, 8, 4)
    # u advances in train mode
    import jax.flatten_util as fu

    before, _ = fu.ravel_pytree(variables["spectral"])
    after, _ = fu.ravel_pytree(updates["spectral"])
    assert float(jnp.max(jnp.abs(before - after))) > 0


def test_fourier_unit_param_tree_impl_independent():
    """A checkpoint written under one transform impl must load and match
    under the other (VERDICT r1 weak-2): the FourierUnit owns ONE flat
    param layout (mix_kernel + bn_scale/bn_bias + batch_stats mean/var)
    regardless of resolve_impl / fused dispatch."""
    from fastfourierconvolution_tpu.ops import fourier as fops

    x = jnp.asarray(
        np.random.RandomState(7).randn(2, 16, 16, 8).astype(np.float32)
    )
    rngs = {"params": jax.random.PRNGKey(0)}
    prev = fops._DEFAULT_IMPL
    try:
        fops.set_default_impl("dft")  # fused path on any backend
        variables = fnn.FourierUnit(channels=8).init(rngs, x, True)
        flat_dft = set(
            flax.traverse_util.flatten_dict(variables["params"]).keys()
        )
        fops.set_default_impl("fft")  # unfused jnp.fft path
        variables_fft = fnn.FourierUnit(channels=8).init(rngs, x, True)
        flat_fft = set(
            flax.traverse_util.flatten_dict(variables_fft["params"]).keys()
        )
        assert flat_dft == flat_fft == {
            ("mix_kernel",), ("bn_scale",), ("bn_bias",)
        }

        # apply the dft-initialised checkpoint under BOTH impls, in both
        # train and eval mode: no missing params, numerics agree
        for train in (True, False):
            outs = {}
            for impl in ("dft", "fft"):
                fops.set_default_impl(impl)
                out, updates = fnn.FourierUnit(channels=8).apply(
                    variables, x, train, mutable=["batch_stats"]
                )
                outs[impl] = (np.asarray(out), updates["batch_stats"])
            np.testing.assert_allclose(
                outs["dft"][0], outs["fft"][0], atol=5e-5, rtol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(outs["dft"][1]["mean"]),
                np.asarray(outs["fft"][1]["mean"]),
                atol=5e-5, rtol=1e-4,
            )
    finally:
        fops.set_default_impl(prev)


def test_fast_gelu_policy_and_error_bound():
    """The policy-gated GELU: tanh form iff the input is bf16, exact erf
    otherwise; the tanh approximation's deviation from exact GELU must
    stay an order below bf16 output quantization (nn/layers.py gate)."""
    from fastfourierconvolution_tpu.nn import layers as L

    x32 = jnp.linspace(-6.0, 6.0, 4097, dtype=jnp.float32)
    # f32 input under the default policy -> exact erf
    got = L.ACTIVATIONS["gelu"](x32)
    want = jax.nn.gelu(x32, approximate=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # bf16 input -> tanh form
    xb = x32.astype(jnp.bfloat16)
    got_b = L.ACTIVATIONS["gelu"](xb)
    want_b = jax.nn.gelu(xb, approximate=True)
    np.testing.assert_array_equal(
        np.asarray(got_b, np.float32), np.asarray(want_b, np.float32)
    )
    # approximation quality: tanh-GELU within 5e-4 of exact in f32 —
    # ~10x below the 3.9e-3 bf16 ulp at unit scale
    approx = jax.nn.gelu(x32, approximate=True)
    assert float(jnp.max(jnp.abs(approx - want))) < 5e-4
    # the force-off override restores exact erf for bf16 too
    L.set_fast_gelu(False)
    try:
        got_off = L.ACTIVATIONS["gelu"](xb)
        want_off = jax.nn.gelu(xb, approximate=False)
        np.testing.assert_array_equal(
            np.asarray(got_off, np.float32), np.asarray(want_off, np.float32)
        )
    finally:
        L.set_fast_gelu("policy")
