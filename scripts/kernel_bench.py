#!/usr/bin/env python
"""Kernel microbenchmarks: int8/weight-dequant/packed-W4 GEMMs vs the
bf16 XLA dot on SDXL shapes (the reference's qlinear microbench role,
kernels/quantize_linear_test.py).

Uses chained-dependency timing (see DESIGN_NOTES.md — the only reliable
methodology on this remote TPU).

Usage: python scripts/kernel_bench.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def chained_timeit(fn, x, iters, inner=32):
    """Time ``fn`` by scanning ``inner`` chained evaluations inside ONE jit
    region: each step's carry update depends on the previous output, so
    execution is sequential and can't be elided/deduped, while the ~2 ms
    per-dispatch floor of the remote TPU tunnel is amortized to
    ~2/inner ms (standalone per-call timing measures only that floor for
    sub-ms kernels)."""

    def step(s, _):
        o = fn(s)
        # data-dependent but numerically-null carry update (tiny scale
        # underflows in bf16; XLA can't constant-fold a runtime sum)
        s = s + (jnp.sum(o.astype(jnp.float32)) * 1e-30).astype(s.dtype)
        return s, ()

    @jax.jit
    def run(s):
        s, _ = jax.lax.scan(step, s, None, length=inner)
        return s

    s = run(x)
    jax.block_until_ready(s)
    s = run(s)
    jax.block_until_ready(s)
    t0 = time.time()
    for _ in range(iters):
        s = run(s)
    jax.block_until_ready(s)
    return (time.time() - t0) / (iters * inner) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from mixdq_tpu.ops import qops
    from mixdq_tpu.ops.pallas_qmatmul import (qmatmul, qmatmul_fused,
                                              qmatmul_fused2)
    from mixdq_tpu.ops.pallas_wq_matmul import (pack_w4_halves, wq4_matmul,
                                                wq_matmul)

    print(f"device: {jax.devices()[0]}")
    for M, K, N in [(4096, 640, 640), (1024, 1280, 1280),
                    (1024, 1280, 5120), (1024, 5120, 1280)]:
        kx = jax.random.PRNGKey(0)
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        wb = jax.random.normal(kx, (K, max(K, N)), jnp.bfloat16)[:, :N]
        wi = jax.random.randint(kx, (K, N), -127, 127, jnp.int8)
        wi4 = jnp.clip(wi, -8, 7).astype(jnp.int8)
        sc = jnp.ones((N,), jnp.float32) * 0.01
        b0 = jnp.zeros((N,), jnp.float32)
        si = jnp.float32(10.0)
        zp = jnp.float32(-3.0)
        packed = pack_w4_halves(wi4) if K % 2 == 0 else None

        rows = {
            "bf16 dot": lambda s: jnp.dot(
                s, wb, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            "xla int8 (quant+dot)": lambda s: qops.qlinear(
                qops.quantize_per_tensor(s, si, zp), wi, sc, b0),
            "pallas int8": lambda s: qmatmul(
                qops.quantize_per_tensor(s, si, zp), wi, sc, b0),
            "pallas fused-quant int8": lambda s: qmatmul_fused(
                s, wi, si, zp, sc, b0),
            "pallas fused-quant v2": lambda s: qmatmul_fused2(
                s, wi, si, zp, sc, b0),
            "pallas w8-dequant": lambda s: wq_matmul(s, wi, sc),
        }
        if packed is not None:
            rows["pallas w4-packed"] = lambda s: wq4_matmul(s, packed, sc)

        print(f"\nM={M} K={K} N={N}")
        base = None
        for name, fn in rows.items():
            try:
                ms = chained_timeit(fn, x, args.iters)
                rel = f" ({base/ms:.2f}x vs bf16)" if base else ""
                if base is None:
                    base = ms
                print(f"  {name:<26} {ms:8.3f} ms{rel}")
            except Exception as e:
                print(f"  {name:<26} FAILED: {type(e).__name__}")


if __name__ == "__main__":
    main()
