"""WGAN-GP and aw-method wired into GANTrainer (VERDICT round-1 item 7;
reference benchmark_models/sagan/trainer.py:107-148, layers/aw_loss.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastfourierconvolution_tpu.models import FFCGenerator, SNConvDiscriminator
from fastfourierconvolution_tpu.train import GANTrainer
from fastfourierconvolution_tpu.train import losses as L


def _tiny_pair():
    # 4x4 output generator vs tiny SN discriminator
    g = FFCGenerator(z_size=16, ngf=8, ratio_g=0.25, mg=2, channel_mults=(2,))
    d = SNConvDiscriminator(ladder=((8, 3, 1), (8, 4, 2)), mg=2)
    return g, d


def _params_delta(a, b):
    fa, _ = jax.flatten_util.ravel_pytree(a)
    fb, _ = jax.flatten_util.ravel_pytree(b)
    return float(jnp.max(jnp.abs(fa - fb)))


def test_gradient_penalty_unit_norm_is_zero():
    """GP of a D with exactly unit input-gradient norm is ~0."""
    w = jnp.zeros((4 * 4 * 3,)).at[0].set(1.0)

    def d_apply(x):
        return x.reshape(x.shape[0], -1) @ w[:, None]

    rng = jax.random.PRNGKey(0)
    real = jax.random.normal(rng, (8, 4, 4, 3))
    fake = jax.random.normal(jax.random.fold_in(rng, 1), (8, 4, 4, 3))
    gp = L.gradient_penalty(d_apply, real, fake, jax.random.PRNGKey(2))
    assert float(gp) < 1e-10

    # scaling D by 3 makes the norm 3 -> penalty (3-1)^2 = 4
    gp3 = L.gradient_penalty(
        lambda x: 3.0 * d_apply(x), real, fake, jax.random.PRNGKey(2)
    )
    np.testing.assert_allclose(float(gp3), 4.0, rtol=1e-5)


def test_wgan_gp_train_step_runs_and_updates():
    g, d = _tiny_pair()
    trainer = GANTrainer(
        g, d, z_size=16, total_steps=10, loss="wgan-gp", gp_lambda=10.0
    )
    real = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 3))
    state = trainer.init(jax.random.PRNGKey(1), real)
    new_state, metrics = jax.jit(trainer.update_step)(state, real)
    assert np.isfinite(float(metrics["loss_g"]))
    assert np.isfinite(float(metrics["loss_d"]))
    assert _params_delta(state.d.params, new_state.d.params) > 0

    # the GP term contributes: same step without GP gives a different D loss
    plain = GANTrainer(g, d, z_size=16, total_steps=10, loss="wgan")
    _, m2 = jax.jit(plain.update_step)(state, real)
    assert abs(float(metrics["loss_d"]) - float(m2["loss_d"])) > 1e-6


@pytest.mark.parametrize(
    "kwargs",
    [dict(loss="wgan-gp", gp_lambda=10.0), dict(loss="hinge", aw_method=True)],
    ids=["wgan-gp", "aw"],
)
def test_remat_composes_with_gp_and_aw(kwargs):
    """remat wraps the GP double-backprop and the aw real/fake passes
    too (they would otherwise silently keep no-remat memory); the step
    must compile, stay finite, and match the un-rematerialised one."""
    g, d = _tiny_pair()
    base = GANTrainer(g, d, z_size=16, total_steps=10, **kwargs)
    rmt = GANTrainer(g, d, z_size=16, total_steps=10, remat="dots", **kwargs)
    real = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 3))
    state = base.init(jax.random.PRNGKey(1), real)
    s_base, m_base = jax.jit(base.update_step)(state, real)
    s_rmt, m_rmt = jax.jit(rmt.update_step)(state, real)
    assert np.isfinite(float(m_rmt["loss_d"]))
    np.testing.assert_allclose(
        float(m_base["loss_d"]), float(m_rmt["loss_d"]), rtol=1e-4
    )
    assert _params_delta(s_base.d.params, s_rmt.d.params) < 1e-5


def test_aw_method_train_step_runs_and_updates():
    g, d = _tiny_pair()
    trainer = GANTrainer(
        g, d, z_size=16, total_steps=10, loss="hinge", aw_method=True
    )
    real = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 3))
    state = trainer.init(jax.random.PRNGKey(1), real)
    new_state, metrics = jax.jit(trainer.update_step)(state, real)
    assert np.isfinite(float(metrics["loss_g"]))
    assert np.isfinite(float(metrics["loss_d"]))
    assert _params_delta(state.d.params, new_state.d.params) > 0


def test_aw_combine_weight_selection():
    """Weight case analysis (reference aw_loss.py Algorithm 1)."""
    grads_real = {"w": jnp.asarray([1.0, 0.0])}
    grads_fake = {"w": jnp.asarray([0.0, 2.0])}  # orthogonal: rdotf=0 (<=0)

    # balanced scores -> mid case: w_r ~ 1/|r|, w_f ~ 1/|f|
    logits_mid = jnp.asarray([[0.0]])
    _, w_r, w_f = L.aw_combine(
        grads_real, grads_fake, logits_mid, logits_mid, epsilon=0.0
    )
    np.testing.assert_allclose(float(w_r), 1.0 / np.sqrt(1.0 + 1e-4), rtol=1e-4)
    np.testing.assert_allclose(float(w_f), 1.0 / np.sqrt(4.0 + 1e-4), rtol=1e-4)

    # real side losing (rs < alpha1): w_r = 1/|r|, w_f = -rdotf/(fdotf |r|)=0
    real_losing = jnp.asarray([[-5.0]])  # sigmoid ~ 0
    _, w_r, w_f = L.aw_combine(
        grads_real, grads_fake, real_losing, real_losing, epsilon=0.0
    )
    np.testing.assert_allclose(float(w_r), 1.0 / np.sqrt(1.0 + 1e-4), rtol=1e-4)
    np.testing.assert_allclose(float(w_f), 0.0, atol=1e-6)

    # real side winning (rs > alpha2): w_f = 1/|f|, w_r = 0
    real_winning = jnp.asarray([[5.0]])  # sigmoid ~ 1
    _, w_r, w_f = L.aw_combine(
        grads_real, grads_fake, real_winning, real_winning, epsilon=0.0
    )
    np.testing.assert_allclose(float(w_f), 1.0 / np.sqrt(4.0 + 1e-4), rtol=1e-4)
    np.testing.assert_allclose(float(w_r), 0.0, atol=1e-6)


def test_aw_rejects_fused_batch():
    g, d = _tiny_pair()
    with pytest.raises(AssertionError):
        GANTrainer(
            g, d, z_size=16, total_steps=10,
            aw_method=True, fused_dis_batch=True,
        )


def test_d_first_update_order():
    """train_cond/SAGAN ordering: D updates on the CURRENT generator,
    then the G update (reference train_cond.py:169-220) — after one
    d_first step, D's update must not have seen the new G params."""
    g, d = _tiny_pair()
    real = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 3))

    tr_d = GANTrainer(g, d, z_size=16, total_steps=10,
                      update_order="d_first")
    tr_g = GANTrainer(g, d, z_size=16, total_steps=10,
                      update_order="g_first")
    state = tr_d.init(jax.random.PRNGKey(1), real)
    sd, md = jax.jit(tr_d.update_step)(state, real)
    sg, mg = jax.jit(tr_g.update_step)(state, real)
    # both orders make finite progress on both nets
    for s, m in ((sd, md), (sg, mg)):
        assert np.isfinite(float(m["loss_g"]))
        assert np.isfinite(float(m["loss_d"]))
        assert _params_delta(state.g.params, s.g.params) > 0
        assert _params_delta(state.d.params, s.d.params) > 0
    # the orderings produce different trajectories from identical state
    assert _params_delta(sd.d.params, sg.d.params) > 0


def test_update_order_validated():
    g, d = _tiny_pair()
    with pytest.raises(AssertionError):
        GANTrainer(g, d, z_size=16, total_steps=10, update_order="bogus")
