"""Model registry: ModelConfig -> (generator, discriminator) modules."""

from __future__ import annotations

from typing import Tuple

from . import models as M
from .utils.config import Config, ModelConfig


def build_generator(cfg: Config):
    m, d = cfg.model, cfg.data
    if m.generator == "ffc":
        kw = dict(
            z_size=m.z_size,
            out_channels=d.channels,
            ngf=m.ngf,
            ratio_g=m.ratio_g,
            impl=m.fourier_impl,
        )
        if d.image_size not in (32, 48, 64, 96, 128):
            kw["mg"] = m.mg  # generic ladder derivation
        return M.FFCGenerator.for_resolution(d.image_size, **kw)
    if m.generator == "ffc_cond":
        preset = m.gen_preset or "cifar32"
        return M.FFCCondGenerator.for_preset(
            preset,
            z_size=m.z_size,
            num_classes=m.num_classes,
            ngf=m.ngf,
            ratio_g=m.ratio_g,
            out_channels=d.channels,
            impl=m.fourier_impl,
        )
    if m.generator == "dcgan":
        return M.DCGANGenerator(nz=m.z_size, nc=d.channels, ngf=m.ngf)
    if m.generator == "cond_dcgan":
        return M.CondDCGANGenerator(
            nz=m.z_size, nc=d.channels, ngf=m.ngf, num_classes=m.num_classes
        )
    if m.generator == "attn_dcgan":
        return M.AttnConvGenerator(z_size=m.z_size, mg=m.mg, ngf=m.ngf)
    if m.generator == "sngan_resnet":
        num_blocks = 5 if d.image_size >= 128 else 3
        return M.SNGANGenerator(
            nz=m.z_size, ngf=m.ngf, bottom_width=4, num_blocks=num_blocks
        )
    if m.generator == "sagan":
        return M.SAGANGenerator(
            image_size=d.image_size, z_dim=m.z_size, conv_dim=m.ngf
        )
    raise KeyError(f"unknown generator '{m.generator}'")


def build_discriminator(cfg: Config):
    m, d = cfg.model, cfg.data
    if m.discriminator == "sn_conv":
        return M.SNConvDiscriminator.for_resolution(d.image_size, mg=m.mg,
                                                    in_channels=d.channels)
    if m.discriminator == "cond_sn_conv":
        return M.CondSNDiscriminator(
            num_classes=m.num_classes, resolution=d.image_size
        )
    if m.discriminator == "ffc":
        return M.FFCDiscriminator(mg=m.mg, ratio_g=m.ratio_g,
                                  in_channels=d.channels,
                                  impl=m.fourier_impl)
    if m.discriminator == "ffc_cond":
        return M.FFCCondDiscriminator(
            num_classes=m.num_classes, ratio_g=m.ratio_g,
            impl=m.fourier_impl,
        )
    if m.discriminator == "dcgan":
        return M.DCGANDiscriminator(nc=d.channels, ndf=m.ndf)
    if m.discriminator == "sn_dcgan":
        return M.SNDCGANDiscriminator(nc=d.channels, ndf=m.ndf)
    if m.discriminator == "cond_dcgan":
        # reference train_cond.py:98 builds CondDiscriminator with
        # uses_sn=False (BN conv ladder), uses_noise=True (decaying
        # input noise)
        return M.CondDCGANDiscriminator(
            nc=d.channels, ndf=m.ndf, num_classes=m.num_classes,
            use_sn=False, use_noise=True,
        )
    if m.discriminator == "ffc_cond_dcgan":
        return M.FFCCondDCGANDiscriminator(
            nc=d.channels, ndf=m.ndf, num_classes=m.num_classes,
            impl=m.fourier_impl,
        )
    if m.discriminator == "sngan_resnet":
        num_blocks = 5 if d.image_size >= 128 else 3
        return M.SNGANDiscriminator(ndf=m.ndf, num_blocks=num_blocks)
    if m.discriminator == "sagan":
        return M.SAGANDiscriminator(image_size=d.image_size, conv_dim=m.ndf)
    raise KeyError(f"unknown discriminator '{m.discriminator}'")


class TupleHeadWrapper:
    """Adapts modules returning (logits/images, attention) tuples — the
    SAGAN pair — to the trainer's single-output protocol."""

    def __init__(self, module):
        self.module = module

    def init(self, *a, **k):
        return self.module.init(*a, **k)

    def apply(self, *a, **k):
        out = self.module.apply(*a, **k)
        if isinstance(out, tuple) and len(out) == 2 and isinstance(out[0], tuple):
            (main, _attn), updates = out
            return main, updates
        if isinstance(out, tuple) and len(out) == 2 and not isinstance(out[0], tuple):
            # either (main, attn) without mutable, or (out, updates)
            if k.get("mutable"):
                main, updates = out
                if isinstance(main, tuple):
                    main = main[0]
                return main, updates
            return out[0]
        return out


def build_models(cfg: Config) -> Tuple[object, object]:
    if cfg.model.conditional and cfg.model.num_classes < 2:
        # fail fast: a 0-row label-embedding table surfaces as an
        # inscrutable XLA gather error only at first trace
        raise ValueError(
            "model.conditional=true requires model.num_classes >= 2 "
            "(conditional presets set it; the train driver infers it "
            "from labeled datasets)"
        )
    g = build_generator(cfg)
    d = build_discriminator(cfg)
    if cfg.model.generator == "sagan":
        g = TupleHeadWrapper(g)
    if cfg.model.discriminator == "sagan":
        d = TupleHeadWrapper(d)
    return g, d
