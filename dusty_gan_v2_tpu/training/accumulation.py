"""Gradient accumulation for data-parallel training.

The reference suppressed DDP all-reduce on all-but-last micro-batches
(gans/context_manager.py:21-35). In SPMD there is nothing to suppress: accumulate
micro-batch gradients locally (lax.scan) and psum once. In practice the reference runs
num_accumulation=1 (reals are pre-split by per-GPU batch, trainer.py:252-257); this
helper exists for memory-constrained large-batch configs.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["microbatch_value_and_grad"]


def microbatch_value_and_grad(
    loss_fn: Callable, params, batch, num_accumulation: int, *loss_args, **loss_kwargs
):
    """Mean of value_and_grad(loss_fn)(params, micro_batch) over micro-batches.

    `batch` is a pytree whose leaves have a leading batch dim divisible by
    num_accumulation. Returns (mean_loss, mean_grads). Uses lax.scan so memory is
    one micro-batch's activations.
    """
    if num_accumulation <= 1:
        return jax.value_and_grad(loss_fn)(params, batch, *loss_args, **loss_kwargs)

    def split(x):
        B = x.shape[0]
        assert B % num_accumulation == 0
        return x.reshape(num_accumulation, B // num_accumulation, *x.shape[1:])

    micro = jax.tree_util.tree_map(split, batch)

    def body(carry, mb):
        loss_sum, grad_sum = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, mb, *loss_args, **loss_kwargs)
        return (
            loss_sum + loss,
            jax.tree_util.tree_map(jnp.add, grad_sum, grads),
        ), None

    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    (loss_sum, grad_sum), _ = jax.lax.scan(body, (0.0, zero_grads), micro)
    n = float(num_accumulation)
    return loss_sum / n, jax.tree_util.tree_map(lambda g: g / n, grad_sum)
