"""Packed-branch FFC execution mode (``FFC_TPU_PACKED``) parity tests.

Packed mode stores the FFC local/global branches as ONE channel-packed
array so the conv/BN/noise chains run at full TPU lane density
(``nn/ffc.py`` ``Packed``). It must be an exact drop-in for the tuple
path: the *same* parameter/variable tree (checkpoints interchangeable —
asserted bit-exactly, since identical module paths give identical PRNG
folds), the same outputs, gradients, and batch-stat updates, and the
same per-step noise draws. The reference has a single execution path
(reference layers/ffc/ffc.py:84-99); both of ours must equal it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fastfourierconvolution_tpu.nn.ffc as ffc_mod
from fastfourierconvolution_tpu.models.ffc_gan import FFCGenerator
from fastfourierconvolution_tpu.nn.ffc import FFC_BN_ACT, Packed


def _tree_allclose(a, b, atol, rtol=1e-5):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(la, np.float32),
            np.asarray(lb, np.float32),
            atol=atol,
            rtol=rtol,
        )


def _count_packed_engagements(monkeypatch):
    calls = []
    orig = ffc_mod._packed_ffc_call

    def counted(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(ffc_mod, "_packed_ffc_call", counted)
    return calls


def _tiny_gen(packed: bool, ratio: float) -> FFCGenerator:
    return FFCGenerator(
        z_size=16,
        ngf=16,
        ratio_g=ratio,
        mg=4,
        channel_mults=(4, 2, 1),
        packed=packed,
    )


@pytest.mark.parametrize("ratio", [0.25, 0.5])
def test_generator_packed_matches_tuple(monkeypatch, ratio):
    calls = _count_packed_engagements(monkeypatch)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(7),
    }
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 16), jnp.float32)
    g_t, g_p = _tiny_gen(False, ratio), _tiny_gen(True, ratio)

    v_t = g_t.init(rngs, z, True)
    v_p = g_p.init(rngs, z, True)
    # identical tree structure AND identical values: same module paths =>
    # same PRNG folds => checkpoints interchangeable between modes
    assert jax.tree_util.tree_structure(v_t) == jax.tree_util.tree_structure(
        v_p
    )
    _tree_allclose(v_t, v_p, atol=0.0, rtol=0.0)
    assert calls, "packed path never engaged — test would be vacuous"

    noise_rng = {"noise": jax.random.PRNGKey(9)}
    out_t, mut_t = g_t.apply(
        v_t, z, True, rngs=noise_rng, mutable=["batch_stats"]
    )
    out_p, mut_p = g_p.apply(
        v_t, z, True, rngs=noise_rng, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(out_p), atol=2e-5, rtol=1e-5
    )
    _tree_allclose(mut_t, mut_p, atol=1e-6)

    # eval mode (running stats, no noise)
    e_t = g_t.apply(v_t, z, False)
    e_p = g_p.apply(v_t, z, False)
    np.testing.assert_allclose(
        np.asarray(e_t), np.asarray(e_p), atol=2e-5, rtol=1e-5
    )


def test_generator_packed_gradients_match():
    rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(7),
    }
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16), jnp.float32)
    g_t, g_p = _tiny_gen(False, 0.5), _tiny_gen(True, 0.5)
    v = g_t.init(rngs, z, True)
    params, rest = v["params"], {k: v[k] for k in v if k != "params"}

    def loss(model):
        def f(p):
            out, _ = model.apply(
                {"params": p, **rest},
                z,
                True,
                rngs={"noise": jax.random.PRNGKey(9)},
                mutable=["batch_stats"],
            )
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return jax.grad(f)(params)

    _tree_allclose(loss(g_t), loss(g_p), atol=3e-5, rtol=2e-4)


def test_ffc_bn_act_downsampling_packed_matches_tuple():
    """FFC (non-transpose) packed parity incl. use_bias=True and
    stride 2 — the discriminator-side geometry."""
    kw = dict(
        in_channels=16,
        out_channels=24,
        kernel_size=4,
        ratio_gin=0.5,
        ratio_gout=0.25,
        stride=2,
        padding=1,
        use_bias=True,
        norm="batch",
        activation="leaky_relu",
        upsampling=False,
    )
    m_t = FFC_BN_ACT(**kw)
    m_p = FFC_BN_ACT(**kw, packed=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 16), jnp.float32)
    x_t = (x[..., :8], x[..., 8:])
    x_p = Packed(x, 8)
    k = jax.random.PRNGKey(0)
    v_t = m_t.init({"params": k}, x_t, True)
    v_p = m_p.init({"params": k}, x_p, True)
    assert jax.tree_util.tree_structure(v_t) == jax.tree_util.tree_structure(
        v_p
    )
    _tree_allclose(v_t, v_p, atol=0.0, rtol=0.0)

    (l_t, g_t), mut_t = m_t.apply(v_t, x_t, True, mutable=["batch_stats"])
    p_out, mut_p = m_p.apply(v_t, x_p, True, mutable=["batch_stats"])
    got = np.asarray(p_out.x)
    want = np.concatenate([np.asarray(l_t), np.asarray(g_t)], axis=-1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    _tree_allclose(mut_t, mut_p, atol=1e-6)


def test_cond_generator_packed_matches_tuple():
    """FFCCondGenerator (the tex128 shape: convt stem, cond_bn=False —
    the only conditional preset at/above the packed size gate) must be
    mode-invariant like the unconditional ladder."""
    from fastfourierconvolution_tpu.models.conditional import (
        FFCCondGenerator,
    )

    def make(packed):
        return FFCCondGenerator(
            z_size=16,
            num_classes=3,
            ngf=16,
            ratio_g=0.5,
            mg=4,
            channel_mults=(4, 2, 1),
            stem="convt",
            cond_bn=False,
            packed=packed,
        )

    rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(7),
    }
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 16), jnp.float32)
    y = jnp.array([0, 2, 1])
    g_t, g_p = make(False), make(True)
    v_t = g_t.init(rngs, z, True, y)
    v_p = g_p.init(rngs, z, True, y)
    assert jax.tree_util.tree_structure(v_t) == jax.tree_util.tree_structure(
        v_p
    )
    _tree_allclose(v_t, v_p, atol=0.0, rtol=0.0)

    noise_rng = {"noise": jax.random.PRNGKey(9)}
    out_t, mut_t = g_t.apply(
        v_t, z, True, y, rngs=noise_rng, mutable=["batch_stats"]
    )
    out_p, mut_p = g_p.apply(
        v_t, z, True, y, rngs=noise_rng, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(out_p), atol=2e-5, rtol=1e-5
    )
    _tree_allclose(mut_t, mut_p, atol=1e-6)

    # cond_bn presets must silently stay on the tuple path even when
    # packed is requested (no conditional-BN packed support)
    g_cbn = FFCCondGenerator(
        z_size=16, num_classes=3, ngf=16, mg=4, channel_mults=(2, 1),
        stem="dense", cond_bn=True, packed=True,
    )
    v = g_cbn.init(rngs, z, True, y)
    out = g_cbn.apply(
        v, z, True, y, rngs=noise_rng, mutable=["batch_stats"]
    )[0]
    assert out.shape == (3, 16, 16, 3)


def test_packed_env_gate(monkeypatch):
    monkeypatch.setenv("FFC_TPU_PACKED", "1")
    assert ffc_mod.packed_enabled()
    monkeypatch.setenv("FFC_TPU_PACKED", "0")
    assert not ffc_mod.packed_enabled()
    # model default (packed=None) follows the env at trace time
    g = FFCGenerator(z_size=16, ngf=16, mg=4, channel_mults=(2, 1))
    monkeypatch.setenv("FFC_TPU_PACKED", "1")
    z = jnp.zeros((1, 16))
    v = g.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        z,
        True,
    )
    # the tree is mode-independent; a second init with the gate off must
    # produce the identical tree
    monkeypatch.setenv("FFC_TPU_PACKED", "0")
    v2 = g.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        z,
        True,
    )
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    _tree_allclose(v, v2, atol=0.0, rtol=0.0)
