"""Small utilities: range-image value maps, colorization, seeding, spectra.

Behavioral equivalents of reference `gans/utils.py` helpers (sigmoid/tanh maps :96-105,
colorize :167-191, points_to_normal_2d :198-202, power_spectrum_2d :205-209,
masked_loss :225-234).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sigmoid_to_tanh",
    "tanh_to_sigmoid",
    "colorize",
    "points_to_normal_2d",
    "power_spectrum_2d",
    "masked_loss",
    "init_random_seed",
]


def sigmoid_to_tanh(x):
    """[0,1] -> [-1,+1]"""
    return x * 2.0 - 1.0


def tanh_to_sigmoid(x):
    """[-1,+1] -> [0,1]"""
    return (x + 1.0) / 2.0


def _get_cmap_lut(cmap: str, n: int = 256) -> np.ndarray:
    import matplotlib.cm

    return np.asarray(matplotlib.colormaps[cmap](np.linspace(0, 1, n)))[:, :3]


def colorize(tensor: jnp.ndarray, cmap="turbo") -> jnp.ndarray:
    """(B,1,H,W) or (B,H,W) values in [0,1] -> (B,3,H,W) LUT colors."""
    if tensor.ndim == 4:
        assert tensor.shape[1] == 1, tensor.shape
        tensor = tensor[:, 0]
    assert tensor.ndim == 3
    lut = jnp.asarray(
        cmap if isinstance(cmap, np.ndarray) else _get_cmap_lut(cmap), jnp.float32
    )
    n = lut.shape[0]
    idx = jnp.clip(tensor * n, 0, n - 1).astype(jnp.int32)
    return lut[idx].transpose(0, 3, 1, 2)


def points_to_normal_2d(points_map, mode="closest", d=2):
    from ..geometry.normals import estimate_surface_normal

    normals = -estimate_surface_normal(points_map, d=d, mode=mode)
    normals = jnp.nan_to_num(normals, nan=0.0)
    return jnp.clip(tanh_to_sigmoid(normals), 0.0, 1.0)


def power_spectrum_2d(x):
    """10*log10 |FFT2|^2 with DC centered, forward normalization.

    Host-side numpy on purpose: this is a rank-0 TensorBoard panel on a handful of
    images, and FFT is UNIMPLEMENTED on the TPU backend — a jnp.fft version crashes
    train_gan's logging path on real hardware (found r2 driving the CLI on-chip).
    """
    x = np.asarray(x)
    spec = np.fft.fft2(x, norm="forward")
    spec = np.fft.fftshift(spec, axes=(-1, -2))
    return 10.0 * np.log10(np.abs(spec) ** 2 + 1e-24)


def masked_loss(img_ref, img_gen, mask, distance="l1"):
    """Per-sample mean absolute/squared error over valid pixels."""
    if distance == "l1":
        loss = jnp.abs(img_ref - img_gen)
    elif distance == "l2":
        loss = (img_ref - img_gen) ** 2
    else:
        raise NotImplementedError(distance)
    loss = jnp.sum(loss * mask, axis=(1, 2, 3))
    return loss / jnp.sum(mask, axis=(1, 2, 3))


def init_random_seed(seed: int):
    """Seed numpy + return a jax PRNG key; jax randomness is otherwise explicit."""
    np.random.seed(seed)
    import random

    random.seed(seed)
    return jax.random.PRNGKey(seed)


def save_video(frames, filename: str, fps: int = 30, save_frames: bool = False):
    """Save a sequence of HxWx3 uint8 frames as an animated GIF (+ optional PNGs).

    Equivalent role to reference gans/utils.py:141-164 (which used cv2/mp4; this
    environment has PIL only — GIF keeps the artifact viewable anywhere).
    """
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    out = f"{filename}.gif"
    imgs[0].save(
        out, save_all=True, append_images=imgs[1:],
        duration=max(1, int(1000 / fps)), loop=0,
    )
    if save_frames:
        for i, im in enumerate(imgs):
            im.save(f"{filename}_{i:05d}.png")
    return out
