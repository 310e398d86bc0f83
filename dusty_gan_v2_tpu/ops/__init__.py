"""TPU-native differentiable op library (JAX/XLA/Pallas).

Re-exports every op used by the model zoo; the TPU-native equivalent of the reference's
`gans/models/ops/` layer (L1 in SURVEY.md).
"""

from .act import FusedLeakyReLU, fused_leaky_relu, fused_leaky_relu_pallas
from .fourier import FourierFeature, fourier_out_ch
from .gumbel import gumbel_sigmoid, sample_logistic
from .linear import EqualLRConv2d, EqualLRConvTranspose2d, EqualLRDense, RingConv2d
from .modconv import ModConv2d
from .noise import NoiseInjection
from .normalize import minibatch_stddev, pixel_norm
from .pad import filter2d, pad2d, pad_ring
from .resample import ResamplePlan, blur_vh, make_resample, resample, resample_sumsq

__all__ = [
    "FusedLeakyReLU",
    "fused_leaky_relu",
    "fused_leaky_relu_pallas",
    "FourierFeature",
    "fourier_out_ch",
    "gumbel_sigmoid",
    "sample_logistic",
    "EqualLRConv2d",
    "EqualLRConvTranspose2d",
    "EqualLRDense",
    "RingConv2d",
    "ModConv2d",
    "NoiseInjection",
    "minibatch_stddev",
    "pixel_norm",
    "filter2d",
    "pad2d",
    "pad_ring",
    "ResamplePlan",
    "blur_vh",
    "make_resample",
    "resample",
    "resample_sumsq",
]
