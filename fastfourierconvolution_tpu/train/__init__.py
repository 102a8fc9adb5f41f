"""Training: losses, GAN trainer, checkpointing."""

from . import losses  # noqa: F401
from .gan import GANState, GANTrainer, NetState, make_optimizer  # noqa: F401
