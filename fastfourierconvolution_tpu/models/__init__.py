"""Model zoo: FFC GANs, vanilla DCGANs, conditional / SNGAN / SAGAN."""

from .dcgan import (  # noqa: F401
    AttnConvGenerator,
    DCGANDiscriminator,
    DCGANGenerator,
    SNDCGANDiscriminator,
)
from .conditional import (  # noqa: F401
    CondDCGANDiscriminator,
    CondDCGANGenerator,
    CondSNDiscriminator,
    FFCCondDCGANDiscriminator,
    FFCCondDiscriminator,
    FFCCondGenerator,
)
from .ffc_gan import (  # noqa: F401
    FFCDiscriminator,
    FFCGenerator,
    SNConvDiscriminator,
    to_uint8,
)
from .sagan import SAGANDiscriminator, SAGANGenerator  # noqa: F401
from .sngan_resnet import (  # noqa: F401
    DBlock,
    DBlockOptimized,
    GBlock,
    SNGANDiscriminator,
    SNGANGenerator,
    sngan_discriminator_32,
    sngan_discriminator_128,
    sngan_generator_32,
    sngan_generator_128,
)
