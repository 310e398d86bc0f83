"""Device-count-invariant randomness and batch statistics.

The reference's DDP training (gans/trainer.py:76-79, per-rank seed offsets
gans/trainer.py:111) is NOT invariant to the number of GPUs: each rank draws its own
latents/noise, and BatchNorm/ModConv-EMA statistics see only the local batch unless
SyncBatchNorm is used (train_semseg.py:173). This rebuild makes the jitted train step a
pure function of (global batch, run key) regardless of mesh size:

- every per-SAMPLE draw derives its key from the sample's GLOBAL index
  (``fold_in(stream_key, global_id)``), so shard i drawing its n_local samples produces
  exactly the rows a single device would draw for those positions;
- every global SCALAR draw (e.g. the style-mixing crossover point) uses the stream key
  directly, which is identical on all shards (the step no longer folds in axis_index);
- batch statistics (BatchNorm moments, ModConv ema_var, w_avg) are pmean'd over the
  data axis when one is bound, matching SyncBatchNorm semantics.

``global_ids`` detects whether the data axis is bound (inside shard_map) and falls back
to ``arange`` outside it, so the same module code runs under SPMD training, single-device
eval, and tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import DATA_AXIS

__all__ = [
    "axis_bound",
    "axis_size",
    "global_ids",
    "per_sample_keys",
    "ps_normal",
    "ps_uniform",
    "ps_bernoulli",
    "ps_randint",
    "PerSampleStream",
    "axis_pmean",
]


def axis_bound(axis_name: str = DATA_AXIS) -> bool:
    """True iff `axis_name` is bound in the current trace (inside shard_map/pmap)."""
    try:
        jax.lax.axis_index(axis_name)
        return True
    except NameError:
        return False


def axis_size(axis_name: str = DATA_AXIS) -> int:
    """Static size of `axis_name` when bound; 1 otherwise."""
    try:
        return jax.lax.axis_size(axis_name)
    except NameError:
        return 1


def global_ids(n_local: int, axis_name: str = DATA_AXIS, offset: int = 0):
    """Global sample indices (uint32) of this shard's `n_local` consecutive samples.

    Inside shard_map over `axis_name`, shard k owns rows [k*n_local, (k+1)*n_local)
    of the global batch (contiguous axis-0 sharding, parallel/mesh.py). Outside any
    mapped axis this is just arange(n_local). `offset` shifts the id space — used to
    keep concatenated sub-batches (e.g. reals ++ fakes) in disjoint id ranges.
    """
    base = jnp.arange(n_local, dtype=jnp.uint32) + jnp.uint32(offset)
    try:
        ax = jax.lax.axis_index(axis_name)
    except NameError:
        return base
    return base + jnp.uint32(ax) * jnp.uint32(n_local)


def per_sample_keys(key, ids):
    """One PRNG key per sample: fold_in(key, global_id)."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(ids)


def _ps(draw_one, key, ids):
    return jax.vmap(draw_one)(per_sample_keys(key, ids))


def ps_normal(key, ids, shape, dtype=jnp.float32):
    """(len(ids), *shape) standard normals, row i a pure function of (key, ids[i])."""
    return _ps(lambda k: jax.random.normal(k, shape, dtype), key, ids)


def ps_uniform(key, ids, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0):
    return _ps(
        lambda k: jax.random.uniform(k, shape, dtype, minval=minval, maxval=maxval),
        key, ids,
    )


def ps_bernoulli(key, ids, p, shape=()):
    return _ps(lambda k: jax.random.bernoulli(k, p, shape), key, ids)


def ps_randint(key, ids, shape=(), minval=0, maxval=2, dtype=jnp.int32):
    return _ps(lambda k: jax.random.randint(k, shape, minval, maxval, dtype), key, ids)


class PerSampleStream:
    """A counter-based stream of per-sample keys for multi-draw consumers (ADA).

    Each `next()` advances a site counter and returns one key per sample,
    ``fold_in(fold_in(stream_key, global_id), site)`` — so every (sample, draw-site)
    pair is a pure function of the stream key and the sample's global index,
    independent of device count and local batch size.
    """

    def __init__(self, key, ids):
        self.keys = per_sample_keys(key, ids)
        self._site = 0

    def next_keys(self):
        c = self._site
        self._site += 1
        return jax.vmap(lambda k: jax.random.fold_in(k, c))(self.keys)

    def _draw(self, draw_one):
        return jax.vmap(draw_one)(self.next_keys())

    def normal(self, shape=(), dtype=jnp.float32):
        return self._draw(lambda k: jax.random.normal(k, shape, dtype))

    def uniform(self, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0):
        return self._draw(
            lambda k: jax.random.uniform(k, shape, dtype, minval=minval, maxval=maxval)
        )

    def randint(self, shape=(), minval=0, maxval=2, dtype=jnp.int32):
        return self._draw(lambda k: jax.random.randint(k, shape, minval, maxval, dtype))

    def bernoulli(self, p, shape=()):
        return self._draw(lambda k: jax.random.bernoulli(k, p, shape))


def axis_pmean(x, axis_name: str = DATA_AXIS):
    """pmean over the data axis when bound; identity otherwise.

    Used for cross-shard batch statistics: BatchNorm moments (SyncBatchNorm
    semantics, reference train_semseg.py:173), ModConv ema_var, w_avg batch means.

    The backward pass is also a pmean (symmetric custom VJP). Under the production
    shard_map wrapper (check_vma=False) a raw ``lax.pmean``'s transpose does NOT sum
    cotangents across shards, which silently drops the cross-shard coupling term of
    any statistic the gradient flows through (e.g. BatchNorm moments): shard i's
    cotangent into the global mean only reflects shard i's own loss. With bwd =
    pmean(ct), pmean-of-local-grads equals the single-device gradient exactly:
    pmean_i[pmean_j(A_j) * dmu_i/dp] = [pmean_j A_j] * [pmean_i dmu_i/dp], the true
    product of global factors (verified by the device-count-invariance tests).
    """
    if axis_bound(axis_name):
        return _pmean_sym(x, axis_name)
    return x


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pmean_sym(x, axis_name):
    return jax.lax.pmean(x, axis_name)


def _pmean_sym_fwd(x, axis_name):
    return jax.lax.pmean(x, axis_name), None


def _pmean_sym_bwd(axis_name, _res, ct):
    return (jax.lax.pmean(ct, axis_name),)


_pmean_sym.defvjp(_pmean_sym_fwd, _pmean_sym_bwd)
