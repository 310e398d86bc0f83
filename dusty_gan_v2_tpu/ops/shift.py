"""Per-sample fractional column shifts as one-hot MXU matmuls.

Two training-step hot paths resample along W with PER-SAMPLE fractional
offsets: the generator's azimuth-shift cancellation (models/dusty_v2.py,
reference dusty_v2.py:291-297 circular grid_sample) and ADA's W translation
chain (augment/ada.py, reference augment_pipe grid_sample). The natural JAX
form is take_along_axis — but a batched gather's VJP is a scatter-add, the
slow path on TPU (measured on the semseg label lookup: ~30 ms of a 170 ms
step for two small gathers, BASELINE.md "Semseg step bisection").

The matmul form replaces each gather with a 0/1 column-selection operator on
the MXU and recovers the +1 neighbor with a STATIC roll (free: a pure layout
rotate), so the lerp that follows is the exact same elementwise arithmetic as
the gather form — results are bit-exact, and the VJP is a matmul with the
transposed operator (no scatter):

    out[..., o] = x[..., idx[b, o]]          ==  (x @ S)[..., o],
    S[b, s, o] = [s == idx[b, o]]            (exactly 0/1 -> one-term f32 sum)
    x[..., idx[b, o] + 1 mod W]              ==  roll(x, -1)[..., idx[b, o]]

FLOP cost is W x W per output row (B*C*H*W*W total) — with the 1-2 channel
tensors these sites shift, that is well under a millisecond of MXU time at
production shapes, vs a scatter-add VJP that serializes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["select_cols", "gather_cols_mm", "fractional_wrap_lerp"]

# trace-time default for the shift formulation: "matmul" | "gather"
# (both exact; "gather" is the literal-reference form, kept for A/B)
_SHIFT_IMPL = "matmul"


def set_shift_impl(impl: str):
    global _SHIFT_IMPL
    assert impl in ("matmul", "gather"), impl
    _SHIFT_IMPL = impl


def select_cols(idx: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    """One-hot column-selection operator: idx (B, Wo) int -> S (B, n, Wo) with
    S[b, s, o] = (s == idx[b, o]). `x @ S` gathers x's columns at idx."""
    src = jnp.arange(n, dtype=idx.dtype)
    return (src[None, :, None] == idx[:, None, :]).astype(dtype)


def gather_cols_mm(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b, ..., o] = x[b, ..., idx[b, o]] via the one-hot matmul.
    x: (B, C, H, Ws); idx: (B, Wo) int32 in [0, Ws)."""
    S = select_cols(idx, x.shape[-1], x.dtype)
    return jnp.einsum(
        "bchs,bso->bcho", x, S, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def fractional_wrap_lerp(x: jnp.ndarray, idx0: jnp.ndarray, frac: jnp.ndarray,
                         impl=None) -> jnp.ndarray:
    """out[..., o] = lerp(x[..., idx0[o]], x[..., idx0[o]+1 mod Ws], frac[o])
    — the shared kernel of both fractional circular W-shifts.

    x: (B, C, H, Ws); idx0: (B, Wo) int32 in [0, Ws); frac: broadcastable to
    (B, 1, 1, Wo), already cast to the compute dtype. Bit-exact across impls
    (identical final lerp; the matmul path's selections are one-term sums)."""
    if impl is None:
        impl = _SHIFT_IMPL
    if impl == "matmul":
        # one matmul over [x ; roll(x,-1)] stacked on C, then the same lerp
        xx = jnp.concatenate([x, jnp.roll(x, -1, axis=-1)], axis=1)
        g = gather_cols_mm(xx, idx0)
        g0, g1 = jnp.split(g, 2, axis=1)
    else:
        idx1 = (idx0 + 1) % x.shape[-1]
        g0 = jnp.take_along_axis(x, idx0[:, None, None, :], axis=-1)
        g1 = jnp.take_along_axis(x, idx1[:, None, None, :], axis=-1)
    return g0 * (1.0 - frac) + g1 * frac
