"""Conditional model tests: shapes, conditioning effects, cond train step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastfourierconvolution_tpu.models import (
    CondDCGANDiscriminator,
    CondDCGANGenerator,
    CondSNDiscriminator,
    FFCCondDCGANDiscriminator,
    FFCCondDiscriminator,
    FFCCondGenerator,
)
from fastfourierconvolution_tpu.train import GANTrainer

pytestmark = pytest.mark.slow

RNGS = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}


def _apply(m, *args):
    variables = m.init(RNGS, *args)
    out, _ = m.apply(
        variables,
        *args,
        rngs={"noise": jax.random.PRNGKey(2)},
        mutable=["batch_stats", "spectral"],
    )
    return out, variables


def test_ffc_cond_generator_convt_stem():
    g = FFCCondGenerator(z_size=32, ngf=16, num_classes=10, mg=4,
                         channel_mults=(4, 2, 1))
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 32))
    y = jnp.asarray([0, 1, 2, 3])
    out, variables = _apply(g, z, True, y)
    assert out.shape == (4, 32, 32, 3)
    # conditional BN gamma tables exist
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    assert any("gamma" in k for k in flat)


def test_ffc_cond_generator_dense_stem_48():
    g = FFCCondGenerator.for_preset("stl48", z_size=32, ngf=16)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
    y = jnp.asarray([1, 5])
    out, _ = _apply(g, z, True, y)
    assert out.shape == (2, 48, 48, 3)


def test_ffc_cond_generator_128_preset():
    g = FFCCondGenerator.for_preset("tex128", z_size=8, ngf=4)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 8))
    y = jnp.asarray([0, 1])
    out, _ = _apply(g, z, True, y)
    assert out.shape == (2, 128, 128, 3)


def test_labels_change_generator_output():
    g = FFCCondGenerator(z_size=16, ngf=16, num_classes=10, mg=4,
                         channel_mults=(2, 1))
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    variables = g.init(RNGS, z, False, jnp.asarray([0, 0]))
    out0 = g.apply(variables, z, False, jnp.asarray([0, 0]),
                   rngs={"noise": jax.random.PRNGKey(2)})
    out1 = g.apply(variables, z, False, jnp.asarray([7, 7]),
                   rngs={"noise": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_cond_sn_discriminator():
    d = CondSNDiscriminator(num_classes=10, resolution=32)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 32, 32, 3))
    y = jnp.asarray([0, 1, 2, 3])
    out, _ = _apply(d, x, True, y)
    assert out.shape == (4, 1)


def test_ffc_cond_discriminator():
    d = FFCCondDiscriminator(num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 32, 32, 3))
    y = jnp.asarray([0, 1, 2, 3])
    out, _ = _apply(d, x, True, y)
    assert out.shape == (4, 1)


def test_cond_dcgan_pair_64():
    g = CondDCGANGenerator(nz=16, nc=3, ngf=32, num_classes=10)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    y = jnp.asarray([3, 4])
    out, _ = _apply(g, z, True, y)
    assert out.shape == (2, 32, 32, 3)
    d = CondDCGANDiscriminator(nc=3, ndf=32, num_classes=10, use_sn=True)
    logits, _ = _apply(d, out, True, y)
    assert logits.shape == (2, 1)
    assert (np.asarray(logits) >= 0).all() and (np.asarray(logits) <= 1).all()


def test_ffc_cond_dcgan_discriminator_64():
    d = FFCCondDCGANDiscriminator(nc=3, ndf=32, num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    y = jnp.asarray([0, 9])
    out, _ = _apply(d, x, True, y)
    assert out.shape == (2, 1)


def test_conditional_train_step():
    g = FFCCondGenerator(z_size=16, ngf=16, num_classes=10, mg=4,
                         channel_mults=(2, 1))
    d = CondSNDiscriminator(num_classes=10, resolution=16)
    # resolution 16 not in ladder table; use explicit tiny D instead
    from fastfourierconvolution_tpu.models import SNConvDiscriminator

    trainer = GANTrainer(
        g,
        CondSNDiscriminatorTiny(),
        z_size=16,
        total_steps=50,
        conditional=True,
        num_classes=10,
    )
    real = jnp.tanh(jax.random.normal(jax.random.PRNGKey(5), (8, 16, 16, 3)))
    labels = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7])
    state = trainer.init(jax.random.PRNGKey(0), real)
    step = jax.jit(trainer.update_step)
    state, metrics = step(state, real, labels)
    assert np.isfinite(float(metrics["loss_g"]))
    assert np.isfinite(float(metrics["loss_d"]))


class CondSNDiscriminatorTiny(CondSNDiscriminator):
    """16px test double: small explicit ladder."""

    import flax.linen as fnn

    @fnn.compact
    def __call__(self, x, train, y):
        import flax.linen as fnn
        import jax.numpy as jnp

        from fastfourierconvolution_tpu.nn.layers import SNConv2d, SNDense

        b, h, w, _ = x.shape
        y = y.reshape(-1).astype(jnp.int32)
        tbl = self.param(
            "label_embed",
            fnn.initializers.normal(1.0),
            (self.num_classes, h * w),
        )
        plane = tbl[y].reshape(b, h, w, 1)
        x = jnp.concatenate([x, plane], axis=-1)
        for i, (feat, k, s) in enumerate(((16, 3, 1), (16, 4, 2), (32, 4, 2))):
            x = SNConv2d(feat, k, stride=s, padding=1, name=f"conv{i}")(x, train)
            x = fnn.leaky_relu(x, negative_slope=0.1)
        return SNDense(1, name="fc")(x.reshape(b, -1), train)


def test_cond_dcgan_noise_decays_with_progress():
    """The library-path D's input noise is 0.1*0.01**progress
    (reference cond_discriminator.py get_noise_decay): at progress ~inf
    the noise vanishes and the output matches the noise-free model."""
    d_noisy = CondDCGANDiscriminator(nc=3, ndf=32, num_classes=10,
                                     use_noise=True)
    d_clean = CondDCGANDiscriminator(nc=3, ndf=32, num_classes=10,
                                     use_noise=False)
    x = jnp.tanh(jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)))
    y = jnp.asarray([1, 2])
    variables = d_clean.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        x, True, y,
    )
    base = d_clean.apply(variables, x, True, y,
                         rngs={"noise": jax.random.PRNGKey(3)},
                         mutable=["batch_stats"])[0]
    far = d_noisy.apply(variables, x, True, y, 100.0,
                        rngs={"noise": jax.random.PRNGKey(3)},
                        mutable=["batch_stats"])[0]
    near = d_noisy.apply(variables, x, True, y, 0.0,
                         rngs={"noise": jax.random.PRNGKey(3)},
                         mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(far), np.asarray(base), atol=1e-6)
    assert not np.allclose(np.asarray(near), np.asarray(base), atol=1e-6)


def test_checkpoint_prefix_families_isolated(tmp_path):
    """Pruning and discovery are per-prefix: saving one family must
    never delete or shadow another's checkpoints in the same dir."""
    from fastfourierconvolution_tpu.train.checkpoint import (
        get_latest_checkpoint,
        save_checkpoint,
    )

    d = str(tmp_path)
    save_checkpoint({"v": np.zeros(2)}, d, 500, prefix="netG", keep=1)
    save_checkpoint({"v": np.zeros(2)}, d, 1000, prefix="netD", keep=1)
    save_checkpoint({"v": np.zeros(2)}, d, 2000, prefix="netD", keep=1)
    names = sorted(os.listdir(d))
    assert "netG_500_steps.ckpt" in names
    assert "netD_2000_steps.ckpt" in names
    assert "netD_1000_steps.ckpt" not in names  # pruned within family
    assert get_latest_checkpoint(d, "netG").endswith("netG_500_steps.ckpt")
    assert get_latest_checkpoint(d, "netD").endswith("netD_2000_steps.ckpt")
