#!/usr/bin/env python
"""Ground-truth probe: which qconv2d_pallas shapes/configs actually
compile under the 16 MB Mosaic scoped-VMEM limit on real TPU hardware.

The conv_fits_vmem gate (ops/pallas_qconv.py) works from a block-set
byte estimate; this probe compiles the kernel AOT at real shapes (the
r4 VAE-decode crash shape [4,128,128,512]x512 among them,
bench_logs/r4_serve_sd15_qvae.err) and records compile-ok vs
scoped-VMEM-OOM per shape, so the estimate can be calibrated against
the compiler instead of guessed. Compile-only (AOT lower+compile) — no
execution, safe to run alongside nothing else.

Usage: python scripts/vmem_probe.py [--run]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def probe(B, H, W, C, K, kh=3, kw=3, run=False, targets=None):
    from mixdq_tpu.ops.pallas_qconv import (_fit_config, conv_fits_vmem,
                                            qconv2d_pallas)

    fits = conv_fits_vmem(H, W, C, K, kh, kw)
    x = jnp.zeros((B, H, W, C), jnp.int8)
    w = jnp.zeros((kh, kw, C, K), jnp.int8)
    s = jnp.ones((K,), jnp.float32)
    b0 = jnp.zeros((K,), jnp.float32)
    zp = jnp.asarray(0, jnp.int8)
    kw_t = {}
    if targets is not None:
        kw_t = dict(bp_target=targets[0], bk_target=targets[1],
                    bc_target=targets[2])
    t0 = time.time()
    row = {"shape": [B, H, W, C, K], "gate": fits, "targets": targets}
    try:
        lowered = jax.jit(
            lambda *a: qconv2d_pallas(*a, **kw_t)).lower(x, w, s, b0, zp)
        cf = lowered.compile()
        row["compile"] = "ok"
        if run:
            out = cf(x, w, s, b0, zp)
            jax.block_until_ready(out)
            t1 = time.time()
            for _ in range(20):
                out = cf(x, w, s, b0, zp)
            jax.block_until_ready(out)
            row["run_us"] = round((time.time() - t1) / 20 * 1e6, 1)
    except ValueError as e:  # gate refusal inside qconv2d_pallas
        row["compile"] = "gate-refused"
    except Exception as e:
        msg = str(e)
        row["compile"] = ("vmem-oom" if "vmem" in msg.lower() else "error")
        row["error"] = msg.splitlines()[0][:160]
    row["secs"] = round(time.time() - t0, 1)
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true",
                    help="also execute + time each compiled kernel")
    args = ap.parse_args()

    shapes = [
        # the r4 crash shape (SD1.5 VAE decoder up_blocks_1 conv1 @128px)
        (4, 128, 128, 512, 512),
        (1, 128, 128, 512, 512),
        # VAE decode neighbours
        (1, 256, 256, 512, 512),
        (1, 256, 256, 256, 256),
        (4, 256, 256, 256, 256),
        # SDXL-1024 top level
        (1, 128, 128, 320, 320),
        (1, 128, 128, 640, 640),
        # SDXL-512 staples (control: known-good)
        (1, 64, 64, 320, 320),
        (1, 16, 16, 1280, 1280),
    ]
    rows = [probe(*s, run=args.run) for s in shapes]
    # gate=False shapes, forced through with explicit block targets: does
    # the compiler accept what the estimate rejected? (If yes AND the
    # timing is competitive, the estimate is too conservative for that
    # class and can be relaxed with hardware evidence.)
    forced = [
        ((1, 128, 128, 320, 320), (8, 320, 320)),
        ((1, 128, 128, 320, 320), (4, 320, 320)),
        ((1, 128, 128, 640, 640), (4, 512, 128)),
        ((1, 256, 256, 512, 512), (4, 512, 128)),
        ((1, 256, 256, 512, 512), (2, 256, 128)),
        ((4, 128, 128, 512, 512), (8, 512, 128)),  # the fixed auto pick
    ]
    for shape, t in forced:
        rows.append(probe(*shape, run=args.run, targets=t))
    bad = [r for r in rows
           if r["gate"] and r["targets"] is None
           and r["compile"] not in ("ok",)]
    print(json.dumps({"n": len(rows), "gate_violations": len(bad)}))


if __name__ == "__main__":
    main()
