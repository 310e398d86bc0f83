from . import dusty_v1, dusty_v2, vanilla
from .builder import build_discriminator, build_generator
from .dusty_v2 import build_pe_cache
from .loss import GAN_OBJECTIVES, gan_loss_d, gan_loss_g

__all__ = [
    "dusty_v1",
    "dusty_v2",
    "vanilla",
    "build_discriminator",
    "build_generator",
    "build_pe_cache",
    "GAN_OBJECTIVES",
    "gan_loss_d",
    "gan_loss_g",
]
