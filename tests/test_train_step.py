"""End-to-end GAN train-step tests: the flagship FFC generator + SN
discriminator pair, jitted, on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastfourierconvolution_tpu.models import (
    FFCGenerator,
    SNConvDiscriminator,
    to_uint8,
)
from fastfourierconvolution_tpu.train import GANTrainer


@pytest.fixture(scope="module")
def tiny_trainer_and_state():
    # mg=2 -> 16x16 output; small ngf to keep CPU tests quick
    g = FFCGenerator(z_size=32, ngf=16, ratio_g=0.25, mg=2, channel_mults=(4, 2, 1))
    d = SNConvDiscriminator(
        ladder=((16, 3, 1), (16, 4, 2), (32, 4, 2), (64, 4, 2)), mg=2
    )
    trainer = GANTrainer(g, d, z_size=32, total_steps=100)
    real = jnp.zeros((8, 16, 16, 3))
    state = trainer.init(jax.random.PRNGKey(0), real)
    return trainer, state


@pytest.mark.slow
def test_generator_output_shape(tiny_trainer_and_state):
    trainer, state = tiny_trainer_and_state
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    out = trainer.generate(state, z)
    assert out.shape == (4, 16, 16, 3)
    assert np.asarray(out).min() >= -1.0 and np.asarray(out).max() <= 1.0


def test_uint8_eval_contract(tiny_trainer_and_state):
    trainer, state = tiny_trainer_and_state
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    out = trainer.generate(state, z, uint8=True)
    assert out.dtype == jnp.uint8
    x = jnp.asarray([-1.5, -1.0, 0.0, 1.0, 1.5])
    np.testing.assert_array_equal(np.asarray(to_uint8(x)), [0, 0, 127, 255, 255])


@pytest.mark.slow
def test_update_step_changes_params_and_decreases_nothing_nan(
    tiny_trainer_and_state,
):
    trainer, state = tiny_trainer_and_state
    real = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 16, 3))
    real = jnp.tanh(real)
    step = jax.jit(trainer.update_step)
    new_state, metrics = step(state, real)
    assert np.isfinite(float(metrics["loss_g"]))
    assert np.isfinite(float(metrics["loss_d"]))
    assert int(new_state.step) == 1

    def l2_diff(a, b):
        fa, _ = jax.flatten_util.ravel_pytree(a)
        fb, _ = jax.flatten_util.ravel_pytree(b)
        return float(jnp.linalg.norm(fa - fb))

    assert l2_diff(state.g.params, new_state.g.params) > 0
    assert l2_diff(state.d.params, new_state.d.params) > 0
    # SN u vectors advanced
    assert l2_diff(state.d.spectral, new_state.d.spectral) > 0
    # BN running stats advanced
    assert l2_diff(state.g.batch_stats, new_state.g.batch_stats) > 0
    # another step stays finite
    new_state, metrics = step(new_state, real)
    assert np.isfinite(float(metrics["loss_g"]))
    fg, _ = jax.flatten_util.ravel_pytree(new_state.g.params)
    assert np.isfinite(np.asarray(fg)).all()


@pytest.mark.slow
def test_num_dis_updates(tiny_trainer_and_state):
    g = FFCGenerator(z_size=32, ngf=16, ratio_g=0.25, mg=2, channel_mults=(4, 2, 1))
    d = SNConvDiscriminator(
        ladder=((16, 3, 1), (16, 4, 2), (32, 4, 2), (64, 4, 2)), mg=2
    )
    trainer = GANTrainer(g, d, z_size=32, total_steps=100, num_dis_updates=2)
    real = jnp.zeros((4, 16, 16, 3))
    state = trainer.init(jax.random.PRNGKey(0), real)
    new_state, metrics = jax.jit(trainer.update_step)(state, real)
    assert np.isfinite(float(metrics["loss_d"]))


@pytest.mark.slow
@pytest.mark.parametrize("remat", ["dots", "full"])
def test_remat_matches_no_remat(tiny_trainer_and_state, remat):
    """jax.checkpoint changes scheduling, not math: an update step under
    remat must produce the same state as the un-rematerialised step."""
    trainer, state = tiny_trainer_and_state
    g = trainer.g_model
    d = trainer.d_model
    r_trainer = GANTrainer(g, d, z_size=32, total_steps=100, remat=remat)
    real = jnp.tanh(jax.random.normal(jax.random.PRNGKey(2), (8, 16, 16, 3)))
    base_state, base_m = jax.jit(trainer.update_step)(state, real)
    r_state, r_m = jax.jit(r_trainer.update_step)(state, real)
    np.testing.assert_allclose(
        float(base_m["loss_g"]), float(r_m["loss_g"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(base_m["loss_d"]), float(r_m["loss_d"]), rtol=1e-5
    )
    # not bit-identical: remat changes XLA's fusion grouping, so f32
    # rounding can differ in the last ulps; tolerances cover that while
    # still catching any real math divergence
    fa, _ = jax.flatten_util.ravel_pytree(base_state.g.params)
    fb, _ = jax.flatten_util.ravel_pytree(r_state.g.params)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               atol=2e-5, rtol=1e-4)
    fa, _ = jax.flatten_util.ravel_pytree(base_state.d.params)
    fb, _ = jax.flatten_util.ravel_pytree(r_state.d.params)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               atol=2e-5, rtol=1e-4)


def test_linear_lr_decay_schedule():
    from fastfourierconvolution_tpu.train.gan import linear_decay_schedule

    sched = linear_decay_schedule(2e-4, 100)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 2e-4)
    np.testing.assert_allclose(float(sched(jnp.asarray(50))), 1e-4)
    np.testing.assert_allclose(float(sched(jnp.asarray(100))), 0.0)
    np.testing.assert_allclose(float(sched(jnp.asarray(200))), 0.0)


@pytest.mark.slow
def test_bce_dcgan_pair():
    from fastfourierconvolution_tpu.models import (
        DCGANDiscriminator,
        DCGANGenerator,
    )

    g = DCGANGenerator(nz=16, nc=3, ngf=8)
    d = DCGANDiscriminator(nc=3, ndf=8)
    trainer = GANTrainer(
        g, d, z_size=16, total_steps=100, loss="bce", optimizer="adam"
    )
    real = jnp.zeros((4, 64, 64, 3))
    state = trainer.init(jax.random.PRNGKey(0), real)
    out = trainer.generate(state, jax.random.normal(jax.random.PRNGKey(1), (2, 16)))
    assert out.shape == (2, 64, 64, 3)
    new_state, metrics = jax.jit(trainer.update_step)(state, real)
    assert np.isfinite(float(metrics["loss_g"]))


def test_256px_ladder_shapes():
    """Beyond-reference resolution: the 256px G/D presets resolve to a
    256x256 generator and an mg x mg x 512 discriminator head (the
    reference stops at 128px; its ladder pattern is extended one
    doubling — see models/ffc_gan.py _D_LADDERS[256])."""
    from fastfourierconvolution_tpu.models import (
        FFCGenerator,
        SNConvDiscriminator,
    )

    g = FFCGenerator.for_resolution(256, z_size=32, ngf=16)
    d = SNConvDiscriminator.for_resolution(256)
    z = jnp.zeros((1, 32))

    def g_fwd():
        v = g.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
            z, True,
        )
        return g.apply(
            v, z, True, rngs={"noise": jax.random.PRNGKey(3)},
            mutable=["batch_stats", "spectral"],
        )

    out = jax.eval_shape(g_fwd)
    assert out[0].shape == (1, 256, 256, 3)

    x = jnp.zeros((1, 256, 256, 3))

    def d_fwd():
        v = d.init({"params": jax.random.PRNGKey(4)}, x, True)
        return d.apply(v, x, True, mutable=["spectral"])

    logits = jax.eval_shape(d_fwd)
    assert logits[0].shape == (1, 1)
