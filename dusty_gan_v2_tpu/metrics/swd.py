"""Sliced Wasserstein Distance over Laplacian-pyramid patch descriptors.

Behavioral equivalent of reference `gans/metrics/swd.py:14-144` (itself a port of the
ProgressiveGAN metric): gaussian pyramid with reflect padding, 7x7 patch descriptors
(128/image), per-channel standardization, random 1-D projections + sort.

TPU-first notes: the whole metric runs ON DEVICE in two jitted programs — one per-batch
program producing every pyramid level's patch descriptors (pyramid + patch gather +
subsample), and one per-level program doing standardization + random projections + sort.
The eager form dispatched hundreds of small ops per batch, which through a
tunnel-attached TPU cost ~79 s at 512 images; only the final per-level scalars leave
the device.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["compute_swd", "laplacian_pyramid", "pyramid_down", "pyramid_up"]

_G5 = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float32)
_G5 /= _G5.sum()


def _reflect_pad(x, p):
    from ..ops.pad import _pad_axis

    x = _pad_axis(x, -1, p, p, "reflect")
    return _pad_axis(x, -2, p, p, "reflect")


def _dwconv(x, kern, stride=1):
    C = x.shape[1]
    k = jnp.broadcast_to(jnp.asarray(kern)[None, None], (C, 1, *kern.shape))
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
    )


def pyramid_down(x):
    return _dwconv(_reflect_pad(x, 2), _G5, stride=2)


def pyramid_up(x):
    B, C, H, W = x.shape
    # zero-insertion upsample; the reference's conv_transpose([0,1,0] outer, stride 2)
    # places samples at ODD indices, then crops the trailing row/col
    up = jnp.zeros((B, C, H * 2 + 1, W * 2 + 1), x.dtype).at[:, :, 1::2, 1::2].set(x)
    up = up[..., : H * 2, : W * 2]
    return _dwconv(_reflect_pad(up, 2), _G5 * 4.0)


def laplacian_pyramid(images, num_levels):
    pyramid = [images]
    for _ in range(1, num_levels):
        pyramid.append(pyramid_down(pyramid[-1]))
        pyramid[-2] = pyramid[-2] - pyramid_up(pyramid[-1])
    return pyramid


def _extract_patches(x, patch_size, num_patches, rng):
    B, C, H, W = x.shape
    pH, pW = patch_size
    nH, nW = H - pH + 1, W - pW + 1
    # all overlapping patches via gather of shifted slices
    rows = []
    for dy in range(pH):
        cols = []
        for dx in range(pW):
            cols.append(x[:, :, dy : dy + nH, dx : dx + nW])
        rows.append(jnp.stack(cols, axis=-1))
    patches = jnp.stack(rows, axis=-2)  # (B,C,nH,nW,pH,pW)
    patches = patches.reshape(B, C, nH * nW, pH, pW).transpose(0, 2, 1, 3, 4)
    inds = jax.random.permutation(rng, nH * nW)[:num_patches]
    return patches[:, inds]  # (B, P, C, pH, pW)


def _finalize(desc):
    mean = jnp.mean(desc, axis=(0, 1, 3, 4), keepdims=True)
    std = jnp.std(desc, axis=(0, 1, 3, 4), keepdims=True)
    desc = (desc - mean) / (std + 1e-8)
    B, N, C, H, W = desc.shape
    return desc.reshape(-1, C * H * W)


def _swd(desc1, desc2, dir_repeats, dirs_per_repeat, rng):
    D = desc1.shape[1]
    dists = []
    for r in range(dir_repeats):
        k = jax.random.fold_in(rng, r)
        dirs = jax.random.normal(k, (D, dirs_per_repeat))
        dirs = dirs / jnp.std(dirs, axis=0, keepdims=True)
        p1 = jnp.sort(desc1 @ dirs, axis=0)
        p2 = jnp.sort(desc2 @ dirs, axis=0)
        dists.append(jnp.mean(jnp.abs(p1 - p2)))
    return jnp.mean(jnp.stack(dists))


@functools.partial(
    jax.jit, static_argnames=("num_levels", "patch_size", "num_patches")
)
def _batch_descriptors(img, key, num_levels, patch_size, num_patches):
    """One device program per image batch: Laplacian pyramid + per-level patch
    descriptors. Returns a tuple of (B, num_patches, C, pH, pW) arrays, one per level."""
    pyr = laplacian_pyramid(img, num_levels)
    return tuple(
        _extract_patches(pyr[lvl], patch_size, num_patches, jax.random.fold_in(key, lvl))
        for lvl in range(num_levels)
    )


@functools.partial(jax.jit, static_argnames=("dir_repeats", "dirs_per_repeat"))
def _swd_level(d1, d2, rng, dir_repeats, dirs_per_repeat):
    """One device program per pyramid level: standardize + project + sort + L1.
    Every level shares the (N, C*pH*pW) descriptor shape, so this compiles once."""
    return _swd(_finalize(d1), _finalize(d2), dir_repeats, dirs_per_repeat, rng)


def compute_swd(
    img1,
    img2,
    num_levels=None,
    patch_size=(7, 7),
    num_patches=128,
    dir_repeats=4,
    dirs_per_repeat=128,
    batch_size=128,
    rng=None,
) -> Dict[str, float]:
    assert img1.ndim == img2.ndim == 4 and img1.shape == img2.shape
    B, C, H, W = img1.shape
    if num_levels is None:
        num_levels = int(np.log2(min(H, W) // 16) + 1)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if isinstance(patch_size, int):
        patch_size = (patch_size, patch_size)

    desc1 = {i: [] for i in range(num_levels)}
    desc2 = {i: [] for i in range(num_levels)}
    for i in range(0, B, batch_size):
        k = jax.random.fold_in(rng, i)
        for d, img in ((desc1, img1), (desc2, img2)):
            out = _batch_descriptors(
                jnp.asarray(img[i : i + batch_size]), k,
                num_levels, tuple(patch_size), num_patches,
            )
            for lvl in range(num_levels):
                d[lvl].append(out[lvl])

    # per-level scores stay on device until the final per-scalar drain
    scores = [
        _swd_level(
            jnp.concatenate(desc1[lvl], axis=0),
            jnp.concatenate(desc2[lvl], axis=0),
            jax.random.fold_in(rng, 777 + lvl),
            dir_repeats, dirs_per_repeat,
        )
        for lvl in range(num_levels)
    ]
    result = {f"swd-{16 << lvl}": float(s) for lvl, s in enumerate(scores)}
    result["swd-mean"] = float(np.mean(list(result.values())))
    return result
