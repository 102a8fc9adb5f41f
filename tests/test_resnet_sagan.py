"""SNGAN-ResNet and SAGAN model tests (small configs for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np

from fastfourierconvolution_tpu.models import (
    DBlock,
    DBlockOptimized,
    GBlock,
    SAGANDiscriminator,
    SAGANGenerator,
    SNGANDiscriminator,
    SNGANGenerator,
)
from fastfourierconvolution_tpu.ops.conv import upsample_bilinear_torch
import pytest

pytestmark = pytest.mark.slow

RNGS = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}


def _apply(m, *args):
    variables = m.init(RNGS, *args)
    out, _ = m.apply(
        variables, *args, mutable=["batch_stats", "spectral"]
    )
    return out, variables


def test_bilinear_upsample_matches_torch():
    import pytest

    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 5, 7).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="bilinear",
        align_corners=False,
    ).numpy()
    got = upsample_bilinear_torch(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 2
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-5
    )


def test_gblock_upsample_and_shortcut():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16))
    out, _ = _apply(GBlock(out_channels=8, upsample=True), x, True)
    assert out.shape == (2, 16, 16, 8)
    # identity shortcut when shapes match
    out, variables = _apply(GBlock(out_channels=16, upsample=False), x, True)
    assert out.shape == (2, 8, 8, 16)
    assert "c_sc" not in variables["params"]


def test_gblock_conditional():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 16))
    y = jnp.asarray([0, 1, 2, 3])
    m = GBlock(out_channels=16, upsample=True, num_classes=10)
    variables = m.init(RNGS, x, True, y)
    out, _ = m.apply(variables, x, True, y, mutable=["batch_stats", "spectral"])
    assert out.shape == (4, 16, 16, 16)


def test_dblocks():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    out, _ = _apply(DBlockOptimized(out_channels=32), x, True)
    assert out.shape == (2, 8, 8, 32)
    out2, _ = _apply(DBlock(out_channels=64, downsample=True), out, True)
    assert out2.shape == (2, 4, 4, 64)
    out3, _ = _apply(DBlock(out_channels=64, downsample=False), out2, True)
    assert out3.shape == (2, 4, 4, 64)


def test_sngan_32_pair():
    g = SNGANGenerator(nz=16, ngf=32, bottom_width=4, num_blocks=3)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    out, _ = _apply(g, z, True)
    assert out.shape == (2, 32, 32, 3)
    d = SNGANDiscriminator(ndf=32, num_blocks=3)
    logits, _ = _apply(d, out, True)
    assert logits.shape == (2, 1)


def test_sngan_128_channel_ladder():
    g = SNGANGenerator(nz=8, ngf=64, bottom_width=4, num_blocks=5)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 8))
    out, variables = _apply(g, z, True)
    assert out.shape == (1, 128, 128, 3)
    # halving ladder: block2 out ngf, block6 out ngf/16
    p = variables["params"]
    assert p["block2"]["c2"]["kernel"].shape[-1] == 64
    assert p["block6"]["c2"]["kernel"].shape[-1] == 4


def test_sagan_pair_32():
    g = SAGANGenerator(image_size=32, z_dim=16, conv_dim=16)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    (out, attn), _ = _apply(g, z, True)
    assert out.shape == (2, 32, 32, 3)
    d = SAGANDiscriminator(image_size=32, conv_dim=16)
    (logits, d_attn), _ = _apply(d, out, True)
    assert logits.shape == (2, 1)


def test_sagan_pair_64():
    g = SAGANGenerator(image_size=64, z_dim=16, conv_dim=16)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    (out, _), _ = _apply(g, z, True)
    assert out.shape == (2, 64, 64, 3)
    d = SAGANDiscriminator(image_size=64, conv_dim=16)
    (logits, _), _ = _apply(d, out, True)
    assert logits.shape == (2, 1)
