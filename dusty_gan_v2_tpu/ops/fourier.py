"""Fourier feature positional encoding of the laser-angle grid.

Behavioral equivalent of reference `ops.FourierFeature` (gans/models/ops/fourier.py:11-85):
a frozen frequency bank projects the 2-channel (elevation, azimuth) angle map and the
result is [sin, cos]-encoded. The W frequencies are drawn from a +-2^k log-lattice so the
encoding stays periodic over the azimuth; H frequencies are uniform in band.

The frequency bank and phases are frozen buffers (collection "consts"), not parameters.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FourierFeature", "fourier_out_ch"]


def fourier_out_ch(num_freqs: int, basis_scale: str, resolution, L_offset=(3, -1)) -> int:
    if basis_scale in ("random", "random_2"):
        return (num_freqs // 2) * 2
    if basis_scale == "logscale":
        L_h = int(np.ceil(np.log2(resolution[0]))) + L_offset[0]
        L_w = int(np.ceil(np.log2(resolution[1]))) + L_offset[1]
        L_min = min(L_h, L_w)
        return (L_h + L_w + 2 * L_min) * 2
    raise ValueError(basis_scale)


class FourierFeature(nn.Module):
    resolution: Tuple[int, int]
    basis_scale: str = "random"
    num_freqs: int = 512
    L_offset: Tuple[int, int] = (3, -1)

    @property
    def L_h(self):
        return int(np.ceil(np.log2(self.resolution[0]))) + self.L_offset[0]

    @property
    def L_w(self):
        return int(np.ceil(np.log2(self.resolution[1]))) + self.L_offset[1]

    @property
    def out_ch(self):
        return fourier_out_ch(
            self.num_freqs, self.basis_scale, self.resolution, self.L_offset
        )

    def _init_bank(self, rng):
        L_h, L_w = self.L_h, self.L_w
        band_h = 2.0 ** (L_h - 1)
        band_w = 2.0 ** (L_w - 1)
        n = self.num_freqs // 2
        if self.basis_scale == "random":
            k1, k2, k3 = jax.random.split(rng, 3)
            freqs_h = jax.random.uniform(k1, (n, 1), minval=-band_h, maxval=band_h)
            lattice = np.array(
                [-(2.0**k) for k in range(L_w)] + [0.0] + [2.0**k for k in range(L_w)],
                np.float32,
            )
            freqs_w = jax.random.choice(k2, jnp.asarray(lattice), (n, 1))
            phase = jax.random.uniform(k3, (n,)) * 2 * np.pi
            freqs = jnp.concatenate([freqs_h, freqs_w], axis=-1)
        elif self.basis_scale == "random_2":
            k1, k2, k3 = jax.random.split(rng, 3)
            freqs_h = jax.random.uniform(k1, (n, 1), minval=-band_h, maxval=band_h)
            ar = np.arange(band_w, dtype=np.float32)
            lattice = np.concatenate([-ar, [0.0], ar]).astype(np.float32)
            freqs_w = jax.random.choice(k2, jnp.asarray(lattice), (n, 1))
            phase = jax.random.uniform(k3, (n,)) * 2 * np.pi
            freqs = jnp.concatenate([freqs_h, freqs_w], axis=-1)
        elif self.basis_scale == "logscale":
            L_min = min(L_h, L_w)
            fh = 2.0 ** np.arange(L_h, dtype=np.float32)
            fw = 2.0 ** np.arange(L_w, dtype=np.float32)
            fh_diag = np.concatenate([-fh[:L_min], fh[:L_min]])
            freqs_h = np.concatenate([fh, np.zeros(L_w, np.float32), fh_diag])
            fw_diag = np.concatenate([fw[:L_min], fw[:L_min]])
            freqs_w = np.concatenate([np.zeros(L_h, np.float32), fw, fw_diag])
            freqs = jnp.asarray(np.stack([freqs_h, freqs_w], axis=-1))
            phase = jnp.zeros((freqs.shape[0],), jnp.float32)
        else:
            raise ValueError(self.basis_scale)
        return freqs.astype(jnp.float32), phase.astype(jnp.float32)

    @nn.compact
    def __call__(
        self,
        angle: jnp.ndarray,
        azim_shift=None,
        as_rotation: bool = False,
        precomputed=None,
    ):
        """angle: (B, 2, H, W) -> (B, out_ch, H, W); with as_rotation and azim_shift,
        -> (base encoding, (sin_delta, cos_delta) each (B, F)).

        azim_shift (B,) optional: encodes angle with the azimuth channel shifted by a
        per-sample constant WITHOUT materializing per-sample angle grids — the shift
        enters via the exact identity sin(c + f_w*d) = sin c cos(f_w d) + cos c sin(f_w d),
        so the expensive sin/cos volumes are computed once (batch of `angle`, typically
        1) and combined with per-sample per-frequency scalars. Used by the
        subgrid-consistency augmentation (dusty_v2.py aug_coords).

        precomputed: a previously returned base encoding (the angle grid is fixed
        per sensor, so the sin/cos volumes are pure constants of it) — skips the
        einsum + sin/cos volume computation; rotation coefficients (which depend
        on the per-sample azim_shift) are still produced from the frozen freqs.
        """
        if self.is_initializing():
            bank = self._init_bank(self.make_rng("params"))
        else:
            bank = None
        freqs = self.variable(
            "consts", "freqs", lambda: bank[0] if bank is not None else None
        )
        phase = self.variable(
            "consts", "phase", lambda: bank[1] if bank is not None else None
        )
        f = freqs.value.astype(angle.dtype if angle is not None else precomputed.dtype)
        if precomputed is not None and not self.is_initializing():
            n = precomputed.shape[1] // 2
            s, c = precomputed[:, :n], precomputed[:, n:]
        else:
            coords = jnp.einsum("fc,bchw->bfhw", f, angle) + phase.value.astype(
                angle.dtype
            )[None, :, None, None]
            s, c = jnp.sin(coords), jnp.cos(coords)
        if azim_shift is not None and as_rotation:
            # return the UNSHIFTED encoding plus the per-sample per-frequency
            # rotation coefficients: the caller folds the shift into the consuming
            # modconv's weight columns (ModConv2d shared_rotation), so no per-sample
            # (B, F, H, W) volume is ever materialized.
            delta = f[:, 1][None] * azim_shift[:, None]  # (B, F)
            return jnp.concatenate([s, c], axis=1), (jnp.sin(delta), jnp.cos(delta))
        if azim_shift is not None:
            delta = f[:, 1][None] * azim_shift[:, None]  # (B, F)
            sd = jnp.sin(delta)[:, :, None, None]
            cd = jnp.cos(delta)[:, :, None, None]
            s, c = s * cd + c * sd, c * cd - s * sd
        return jnp.concatenate([s, c], axis=1)
