#!/usr/bin/env python
"""Pallas int8 conv kernel tuning sweep on the real SDXL shapes.

Measures qconv2d_pallas over (bp, bk, bc) block configs against the int8
roofline (394 TOP/s on v5e) and the bf16 XLA conv. Used to pick the
shipped auto-rule / _TUNED table (DESIGN_NOTES has the history).

Explicit block values bypass auto-tuning exactly (None sentinels in the
kernel), so every column is a true A/B point; the 'auto' column is what
ships.

Usage: python scripts/conv_kernel_tune.py [--iters 50] [--batch 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mixdq_tpu.ops.pallas_qconv import qconv2d_pallas

# (H, W, C, K): the distinct stride-1 3x3 SDXL-Turbo conv shapes at B=1
# (incl. the up-block resize convs 32x32x1280->1280 / 64x64x640->640,
# which the in-model trace shows are the single hottest conv ops)
SHAPES = [
    (64, 64, 320, 320),
    (64, 64, 640, 320),
    (64, 64, 640, 640),
    (64, 64, 960, 320),
    (32, 32, 640, 640),
    (32, 32, 960, 640),
    (32, 32, 1280, 640),
    (32, 32, 1280, 1280),
    (32, 32, 1920, 640),
    (16, 16, 1280, 1280),
    (16, 16, 1920, 1280),
    (16, 16, 2560, 1280),
]

# candidate (bp, bk, bc) triples per shape class; None = auto
CONFIGS = [
    None,
    ("full", 512, 512),
    ("full", 640, 512),
    ("full", 640, 640),
    ("full", 256, 256),
    (8, 512, None),
    (16, 512, 512),
    (16, 640, 640),
    (32, 512, 512),
    (32, 256, 256),
]


def timeit(fn, *a, iters=50):
    fn(*a).block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        o = fn(*a)
    o.block_until_ready()
    return (time.time() - t0) / iters * 1e6  # us


def timeit_rounds(fn, *a, iters=10, rounds=5):
    """Median of ``rounds`` independent timings — configs are measured
    round-robin by the caller so host speed drift (this VM migrates
    between host classes mid-run) hits all candidates equally."""
    fn(*a).block_until_ready()  # compile
    return [timeit(fn, *a, iters=iters) for _ in range(rounds)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10,
                    help="timed calls per round")
    ap.add_argument("--rounds", type=int, default=5,
                    help="interleaved timing rounds per shape (median "
                    "reported; fights host speed drift)")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", flush=True)
    winners = {}

    for (H, W, C, K) in SHAPES:
        B = args.batch
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randint(-127, 127, (B, H, W, C)), jnp.int8)
        w = jnp.asarray(rng.randint(-127, 127, (3, 3, C, K)), jnp.int8)
        scale = jnp.ones((K,), jnp.float32) * 1e-3
        bias0 = jnp.zeros((K,), jnp.float32)
        zp = jnp.int8(0)
        gmac = B * 9 * H * W * C * K / 1e9
        ideal_us = gmac * 2 / 394e3 * 1e6  # 394 TOP/s

        # bf16 XLA conv baseline
        xb = x.astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)
        conv = jax.jit(lambda a, b: jax.lax.conv_general_dilated(
            a, b, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        bf16_us = np.median(timeit_rounds(conv, xb, wb, iters=args.iters,
                                          rounds=args.rounds))

        # compile every candidate first, then time round-robin so host
        # drift is shared across candidates instead of biasing late ones
        fns, tags = [], []
        for cfg in CONFIGS:
            if cfg is None:
                bp_t = bk_t = bc_t = None
                tag = "auto"
            else:
                bp_t, bk_t, bc_t = cfg
                bp_t = H if bp_t == "full" else bp_t
                tag = f"{cfg[0]}/{bk_t}/{bc_t}"
            f = jax.jit(lambda a, b, s, b0, z, bp=bp_t, bk=bk_t,
                        bc=bc_t: qconv2d_pallas(
                            a, b, s, b0, z, bp_target=bp,
                            bk_target=bk, bc_target=bc))
            try:
                f(x, w, scale, bias0, zp).block_until_ready()
            except Exception:
                f = None
            fns.append(f)
            tags.append(tag)

        samples = [[] for _ in CONFIGS]
        for _ in range(args.rounds):
            for j, f in enumerate(fns):
                if f is None:
                    continue
                samples[j].append(
                    timeit(f, x, w, scale, bias0, zp, iters=args.iters))

        line = (f"{H}x{W} C={C} K={K}  {gmac:5.2f} GMAC "
                f"ideal={ideal_us:6.1f}us bf16={bf16_us:7.1f}us |")
        best_tag, best_us = None, float("inf")
        for j, tag in enumerate(tags):
            if fns[j] is None:
                line += f" {tag}=ERR"
                continue
            us = float(np.median(samples[j]))
            line += f" {tag}={us:6.1f}"
            if us < best_us:
                best_tag, best_us = (CONFIGS[j], us)
        print(line, flush=True)
        winners[(H, W, C, K)] = (best_tag, round(best_us, 1))

    print("\n-- winners (shape -> (bp,bk,bc), us) --", flush=True)
    for (H, W, C, K), (cfg, us) in winners.items():
        print(f"(3, 3, {H}, {C}, {K}): {cfg},  # {us}us", flush=True)


if __name__ == "__main__":
    main()
