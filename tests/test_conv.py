"""Shape/geometry parity tests for NHWC conv ops vs torch formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastfourierconvolution_tpu.ops import conv


@pytest.mark.parametrize(
    "hw,k,s,p",
    [(32, 3, 1, 1), (32, 4, 2, 1), (48, 4, 2, 1), (32, 3, 2, 1), (9, 3, 1, 0)],
)
def test_conv2d_shapes_match_torch(hw, k, s, p):
    x = jnp.zeros((2, hw, hw, 5))
    kern = jnp.zeros((k, k, 5, 7))
    out = conv.conv2d(x, kern, stride=s, padding=p)
    expected = (hw + 2 * p - k) // s + 1
    assert out.shape == (2, expected, expected, 7)


@pytest.mark.parametrize(
    "hw,k,s,p,op",
    [(4, 4, 2, 1, 0), (8, 4, 2, 1, 0), (16, 3, 1, 1, 0), (8, 4, 2, 1, 1)],
)
def test_conv_transpose2d_shapes_match_torch(hw, k, s, p, op):
    x = jnp.zeros((2, hw, hw, 5))
    kern = jnp.zeros((k, k, 5, 7))
    out = conv.conv_transpose2d(
        x, kern, stride=s, padding=p, output_padding=op
    )
    expected = (hw - 1) * s - 2 * p + (k - 1) + op + 1
    assert out.shape == (2, expected, expected, 7)


def test_conv2d_values_match_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 10, 10).astype(np.float32)
    w = rng.randn(4, 3, 3, 3).astype(np.float32)  # torch OIHW
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1
    ).numpy()
    out = conv.conv2d(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # OIHW -> HWIO
        stride=2,
        padding=1,
        precision="highest",
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-4
    )


@pytest.mark.parametrize("k,p,co", [(3, 1, 3), (5, 2, 1), (3, 0, 4)])
def test_tapmix_matches_direct_conv(k, p, co):
    """The tapmix reformulation (channel-mix matmul + shifted adds) must
    be numerically equivalent to the direct lax conv it replaces, in
    forward and gradient, on shapes that trigger its heuristic gate."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 32).astype(np.float32))
    kern = jnp.asarray(rng.randn(k, k, 32, co).astype(np.float32) * 0.1)
    assert conv._tapmix_applicable(x, kern, 1, 1, p, p, 1, 1, 1)

    def run(enabled):
        conv.set_tapmix_enabled(enabled)
        try:
            def f(x, kern):
                return conv.conv2d(x, kern, stride=1, padding=p)

            out, vjp = jax.vjp(f, x, kern)
            gx, gk = vjp(jnp.ones_like(out))
            return out, gx, gk
        finally:
            conv.set_tapmix_enabled(True)

    out_t, gx_t, gk_t = run(True)
    out_d, gx_d, gk_d = run(False)
    assert out_t.shape == out_d.shape
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_d),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_d),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gk_t), np.asarray(gk_d),
                               atol=2e-3, rtol=2e-4)


def test_tapmix_bf16_follows_policy():
    """Default "policy" mode: bf16 tap partials engage exactly when the
    compute policy is bf16 (the measured +2.1% 128px win —
    RUNS/convt_ab_r3.json tapmix_bf16 block) and stay f32 under the f32
    policy, so the exactness assertions above stay meaningful. Forced
    overrides ("0"/"1") beat the policy in both directions."""
    from fastfourierconvolution_tpu.utils import policy

    prior_mode = conv._TAPMIX_BF16
    prior_dtype = policy.compute_dtype()
    try:
        conv.set_tapmix_bf16("policy")
        policy.set_compute_dtype("f32")
        assert not conv._tapmix_bf16_active()
        policy.set_compute_dtype("bf16")
        assert conv._tapmix_bf16_active()
        conv.set_tapmix_bf16(False)
        assert not conv._tapmix_bf16_active()
        policy.set_compute_dtype("f32")
        conv.set_tapmix_bf16(True)
        assert conv._tapmix_bf16_active()
    finally:
        conv._TAPMIX_BF16 = prior_mode
        policy.set_compute_dtype(prior_dtype)


@pytest.mark.slow
def test_tapmix_model_level_equivalence(monkeypatch):
    """The 64px FFC generator's to_rgb local head (24->3 on a 64x64 map
    with ngf=32, ratio .25) crosses the tapmix gate; the full model
    forward must be unchanged by it. A counter proves the path actually
    fired (with ngf=16 the head is 12->3 and the ci>=8*co floor would
    make this test vacuous)."""
    from fastfourierconvolution_tpu.models import FFCGenerator

    g = FFCGenerator.for_resolution(64, z_size=32, ngf=32)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
    variables = g.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        z, True,
    )

    calls = []
    real_tapmix = conv._conv2d_tapmix
    monkeypatch.setattr(
        conv, "_conv2d_tapmix",
        lambda *a, **kw: (calls.append(1), real_tapmix(*a, **kw))[1],
    )

    def fwd():
        return g.apply(
            variables, z, False, rngs={"noise": jax.random.PRNGKey(3)}
        )

    conv.set_tapmix_enabled(True)
    try:
        out_t = fwd()
    finally:
        conv.set_tapmix_enabled(False)
    assert calls, "tapmix never engaged — test would be vacuous"
    try:
        out_d = fwd()
    finally:
        conv.set_tapmix_enabled(True)
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(out_d), atol=5e-4, rtol=5e-4
    )


def test_tapmix_matches_direct_conv_bf16_policy():
    """Under the bf16 compute policy (the shipped training config) the
    tapmix path must track the direct conv within bf16 rounding: both
    run bf16 MXU matmuls with f32 accumulation — tapmix keeps per-tap
    partials in f32, so the only divergence is bf16 operand rounding."""
    from fastfourierconvolution_tpu.utils import policy

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 32).astype(np.float32))
    kern = jnp.asarray(rng.randn(3, 3, 32, 3).astype(np.float32) * 0.1)
    policy.set_compute_dtype("bf16")
    try:
        conv.set_tapmix_enabled(True)
        out_t = conv.conv2d(x, kern, stride=1, padding=1)
        conv.set_tapmix_enabled(False)
        out_d = conv.conv2d(x, kern, stride=1, padding=1)
    finally:
        policy.set_compute_dtype("f32")
        conv.set_tapmix_enabled(True)
    np.testing.assert_allclose(
        np.asarray(out_t, dtype=np.float32),
        np.asarray(out_d, dtype=np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_tapmix_gate_excludes_ineligible_shapes():
    x_small = jnp.zeros((2, 16, 16, 32))
    x_big = jnp.zeros((2, 64, 64, 32))
    kern = jnp.zeros((3, 3, 32, 3))
    # spatial floor
    assert not conv._tapmix_applicable(x_small, kern, 1, 1, 1, 1, 1, 1, 1)
    # stride
    assert not conv._tapmix_applicable(x_big, kern, 2, 2, 1, 1, 1, 1, 1)
    # wide C_out (healthy lanes already)
    wide = jnp.zeros((3, 3, 32, 64))
    assert not conv._tapmix_applicable(x_big, wide, 1, 1, 1, 1, 1, 1, 1)
    # 1x1 (already a matmul)
    one = jnp.zeros((1, 1, 32, 3))
    assert not conv._tapmix_applicable(x_big, one, 1, 1, 0, 0, 1, 1, 1)


def test_avg_pool_and_upsample():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    pooled = conv.avg_pool2d(x)
    assert pooled.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(pooled)[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4)
    up = conv.upsample_nearest2x(pooled)
    assert up.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(up)[0, :2, :2, 0], np.asarray(pooled)[0, 0, 0, 0])


def test_global_avg_pool():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 5, 6, 3).astype(np.float32))
    np.testing.assert_allclose(
        conv.global_avg_pool(x), np.asarray(x).mean(axis=(1, 2)), atol=1e-6
    )


# --- conv-transpose alternative lowerings (round 2) ---------------------------


@pytest.fixture(params=["subpixel", "fusedk"])
def convt_mode(request):
    conv.set_convt_mode(request.param)
    yield request.param
    conv.set_convt_mode("lhs")


def _count_alt_engagements(monkeypatch):
    """Instrument both alt lowerings so tests can assert they actually
    ran (the dispatch gate requires precision=None — passing
    precision='highest' silently falls back to lhs and the comparison
    becomes lhs-vs-lhs, which round 2's tests did; ADVICE r2)."""
    calls = []
    real_sub = conv._conv_transpose2d_subpixel
    real_fused = conv._conv_transpose2d_fusedk
    monkeypatch.setattr(
        conv, "_conv_transpose2d_subpixel",
        lambda *a, **kw: (calls.append("subpixel"), real_sub(*a, **kw))[1],
    )
    monkeypatch.setattr(
        conv, "_conv_transpose2d_fusedk",
        lambda *a, **kw: (calls.append("fusedk"), real_fused(*a, **kw))[1],
    )
    return calls


@pytest.mark.parametrize(
    "hw,k,s,p,op,ci,co",
    [
        (8, 4, 2, 1, 0, 16, 8),   # the FFC-ladder up-block geometry
        (16, 4, 2, 1, 0, 8, 16),
        (8, 4, 2, 2, 0, 8, 8),    # even output with p=2
        (8, 2, 2, 0, 0, 8, 8),    # k == s (pure pixel-shuffle case)
        (8, 6, 2, 1, 0, 4, 4),    # 3 taps per phase
        (9, 3, 3, 0, 0, 4, 4),    # stride 3
        (8, 4, 2, 1, 1, 8, 8),    # output_padding -> odd length: must
                                  # fall back to lhs (gate rejects)
    ],
)
def test_convt_alt_matches_lhs_dilated(convt_mode, hw, k, s, p, op, ci, co,
                                       monkeypatch):
    """The phase-decomposed lowerings must be EXACT (same contractions,
    reassociated) vs the lhs-dilated reference form in f32 (default
    precision, engaging the real dispatch path); geometries the gate
    rejects must still produce correct results via fallback."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, hw, hw, ci), jnp.float32)
    kern = jnp.asarray(rng.randn(k, k, ci, co), jnp.float32)
    out_len = (hw - 1) * s - 2 * p + k + op
    applicable = out_len % s == 0
    assert conv._convt_alt_applicable(
        x, kern, s, s, 1, 1, 1, p, p, op, op
    ) == applicable
    calls = _count_alt_engagements(monkeypatch)
    got = conv.conv_transpose2d(x, kern, stride=s, padding=p,
                                output_padding=op)
    assert bool(calls) == applicable, (
        f"{convt_mode} engagement mismatch: calls={calls}, "
        f"applicable={applicable}"
    )
    conv.set_convt_mode("lhs")
    want = conv.conv_transpose2d(x, kern, stride=s, padding=p,
                                 output_padding=op)
    conv.set_convt_mode(convt_mode)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4
    )


def test_convt_alt_gradients_match(convt_mode, monkeypatch):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 8), jnp.float32)
    kern = jnp.asarray(rng.randn(4, 4, 8, 4), jnp.float32)

    def loss(x, k):
        y = conv.conv_transpose2d(x, k, stride=2, padding=1)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    calls = _count_alt_engagements(monkeypatch)
    gx, gk = jax.grad(loss, argnums=(0, 1))(x, kern)
    assert calls, f"{convt_mode} never engaged — test would be vacuous"
    conv.set_convt_mode("lhs")
    gx2, gk2 = jax.grad(loss, argnums=(0, 1))(x, kern)
    conv.set_convt_mode(convt_mode)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk2), rtol=1e-5, atol=1e-4)


def test_convt_alt_gate_rejects_unsupported():
    x = jnp.zeros((1, 8, 8, 4))
    conv.set_convt_mode("subpixel")
    try:
        # stride 1: nothing to decompose
        assert not conv._convt_alt_applicable(
            x, jnp.zeros((4, 4, 4, 4)), 1, 1, 1, 1, 1, 1, 1, 0, 0
        )
        # grouped
        assert not conv._convt_alt_applicable(
            x, jnp.zeros((4, 4, 2, 4)), 2, 2, 1, 1, 2, 1, 1, 0, 0
        )
        # dilated
        assert not conv._convt_alt_applicable(
            x, jnp.zeros((4, 4, 4, 4)), 2, 2, 2, 2, 1, 1, 1, 0, 0
        )
    finally:
        conv.set_convt_mode("lhs")


@pytest.mark.parametrize("mode", ["subpixel", "fusedk"])
def test_convt_mode_model_level_equivalence(mode, monkeypatch):
    """The 64px FFC generator's up-blocks are k4 s2 p1 convTs — the
    alternative lowerings must leave the full model forward unchanged,
    and must actually engage."""
    from fastfourierconvolution_tpu.models import FFCGenerator

    g = FFCGenerator.for_resolution(64, z_size=32, ngf=32)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
    variables = g.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        z, True,
    )

    calls = []
    real_sub = conv._conv_transpose2d_subpixel
    real_fused = conv._conv_transpose2d_fusedk
    monkeypatch.setattr(
        conv, "_conv_transpose2d_subpixel",
        lambda *a, **kw: (calls.append(1), real_sub(*a, **kw))[1],
    )
    monkeypatch.setattr(
        conv, "_conv_transpose2d_fusedk",
        lambda *a, **kw: (calls.append(1), real_fused(*a, **kw))[1],
    )

    def fwd():
        return g.apply(
            variables, z, False, rngs={"noise": jax.random.PRNGKey(3)}
        )

    conv.set_convt_mode(mode)
    try:
        out_alt = fwd()
    finally:
        conv.set_convt_mode("lhs")
    assert calls, f"{mode} never engaged — test would be vacuous"
    out_ref = fwd()
    np.testing.assert_allclose(
        np.asarray(out_alt), np.asarray(out_ref), atol=5e-4, rtol=5e-4
    )
