from .train_state import GANTrainState, d_variables, g_ema_variables, g_variables
from .trainer import Trainer, fetch_reals, make_blur_kernel, warmup_fn

__all__ = [
    "GANTrainState",
    "Trainer",
    "fetch_reals",
    "warmup_fn",
    "make_blur_kernel",
    "d_variables",
    "g_variables",
    "g_ema_variables",
]
