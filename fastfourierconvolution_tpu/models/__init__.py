"""Model zoo: FFC GANs, vanilla DCGANs, conditional / SNGAN / SAGAN."""

from .dcgan import (  # noqa: F401
    AttnConvGenerator,
    DCGANDiscriminator,
    DCGANGenerator,
    SNDCGANDiscriminator,
)
from .ffc_gan import (  # noqa: F401
    FFCDiscriminator,
    FFCGenerator,
    SNConvDiscriminator,
    to_uint8,
)
