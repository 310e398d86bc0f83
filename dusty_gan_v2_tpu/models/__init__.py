from . import dusty_v1, dusty_v2, vanilla
from .builder import build_discriminator, build_generator
from .loss import GAN_OBJECTIVES, gan_loss_d, gan_loss_g

__all__ = [
    "dusty_v1",
    "dusty_v2",
    "vanilla",
    "build_discriminator",
    "build_generator",
    "GAN_OBJECTIVES",
    "gan_loss_d",
    "gan_loss_g",
]
