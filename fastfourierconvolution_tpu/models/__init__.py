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
