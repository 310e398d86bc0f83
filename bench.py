"""Benchmark: dusty_v2 generator sampling throughput (samples/sec/chip) at the shipped
64x512 KITTI configuration, on whatever accelerator jax provides (TPU under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no numbers; the provisional
baseline is REF_SAMPLES_PER_SEC below — an estimate of the reference PyTorch pipeline's
single-GPU sampling rate at batch 64 (StyleGAN2-class 64x512 generator, fp32, V100-class
GPU). The north-star target is >= 5x that per chip.
"""

import json
import time

import numpy as np

REF_SAMPLES_PER_SEC = 250.0  # provisional PyTorch-GPU estimate; see BASELINE.md

# dense peak of the matrix units, used as the MFU denominator (bf16 FLOPs/s).
# Values are the public spec-sheet numbers.
PEAK_FLOPS_BF16 = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e (Trillium)
}


def _device_peak() -> float:
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS_BF16.items():
        if kind.startswith(k):
            return v
    return 0.0


def _compiled_flops(jitted, *args) -> float:
    """XLA's own FLOP estimate for the compiled executable (0.0 if unavailable)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    import argparse

    from dusty_gan_v2_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _angle, _full_gen_cfg
    from dusty_gan_v2_tpu.models import build_generator

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)  # driver runs the default
    args = p.parse_args()

    res = (64, 512)
    B = args.batch
    cfg = _full_gen_cfg(resolution=res)
    cfg["compute_dtype"] = "bfloat16"  # params fp32; per-block bf16 compute (f32 parity
    # is covered by tests/test_parity.py at compute_dtype=float32)
    G = build_generator(cfg)
    angle = _angle(res)
    z0 = jax.random.normal(jax.random.PRNGKey(0), (B, 512))
    # init at batch 2 directly on the accelerator: the compile is persistent-cached,
    # and CPU-device compiles must be avoided entirely — under the axon tunnel they
    # are compiled on the REMOTE host's CPU, and caching such AOT blobs can SIGILL
    # on this machine (see utils/jax_cache.py)
    variables = G.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        jax.numpy.zeros((2, 512)), angle,
    )

    @jax.jit
    def sample(variables, z, noise):
        o = G.apply(variables, z, angle, truncation_psi=0.7, gumbel_noise=noise)
        return o["image"]

    noise0 = jax.random.logistic(jax.random.PRNGKey(2), (B, 1, *res))
    # warmup / compile
    out = sample(variables, z0, noise0)
    jax.block_until_ready(out)

    n_iters = 30
    zs = [jax.random.normal(jax.random.PRNGKey(i), (B, 512)) for i in range(4)]
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = sample(variables, zs[i % 4], noise0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    samples_per_sec = B * n_iters / dt

    # ground the number: XLA-reported FLOPs of the compiled step -> MFU
    flops_per_batch = _compiled_flops(sample, variables, z0, noise0)
    peak = _device_peak()
    achieved = flops_per_batch * n_iters / dt if flops_per_batch else 0.0
    record = {
        "metric": "dusty_v2 64x512 sampling throughput",
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / REF_SAMPLES_PER_SEC, 3),
        "batch_ms": round(1e3 * dt / n_iters, 3),
        "flops_per_sample": round(flops_per_batch / B) if flops_per_batch else None,
        "mfu_pct": round(100.0 * achieved / peak, 2) if (peak and achieved) else None,
        "device": __import__("jax").devices()[0].device_kind,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
