#!/usr/bin/env python
"""Controlled batch-size sweep: bf16 vs int8_sec paired at every B in ONE
process/session, round-robin across rounds — so all batch points see the
same host phase (the pool migrates between speed classes; cross-session
absolute numbers are incomparable, DESIGN_NOTES.md). Replaces the
noise-suspect round-2 B=8 line that was measured in a separate session.

Usage: python scripts/batch_sweep.py [--batches 1,2,4,8] [--rounds 3]
Prints one JSON line per B: {"B", "bf16_ms", "int8_ms", "speedup",
"ms_per_img"}.
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--family", default="sdxl-turbo")
    ap.add_argument("--compute", default="int8_sec")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from mixdq_tpu.models.configs import get_family
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import FP_CTX, quantizable_layers, uniform_ctrl

    f = get_family(args.family)
    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(f.unet, dtype=dtype)
    H = f.unet.sample_size
    k = jax.random.PRNGKey(0)

    def make_batch(B):
        sample = jax.random.normal(k, (B, H, H, f.unet.in_channels), dtype)
        t = jnp.asarray(999.0)
        ehs = jax.random.normal(k, (B, 77, f.unet.cross_attention_dim), dtype)
        added = None
        if f.unet.addition_embed_type == "text_time":
            pooled = (f.text_encoder_2.projection_dim
                      if f.text_encoder_2 is not None else 1280)
            added = {"text_embeds": jnp.zeros((B, pooled), dtype),
                     "time_ids": jnp.zeros((B, 6), dtype)}
        return sample, t, ehs, added

    b0 = make_batch(1)
    t0 = time.time()
    variables = jax.jit(unet.init)(jax.random.PRNGKey(0), *b0)
    jax.block_until_ready(variables)
    log(f"init: {time.time()-t0:.1f}s on {jax.devices()[0]}")

    wq = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    aq = QuantSpec(running_stat=True)
    names = quantizable_layers(variables["params"])
    qparams = cal.calibrate(unet, variables, [b0], wq, aq)
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)
    ctx = deploy_unet_ctx(unet, variables, qparams, ctrl, wq, aq,
                          fuse_qkv=True)
    ctx = ctx.replace(deploy_compute=args.compute, attn_impl="auto")
    q_vars = jax.device_put(deployed_params(variables, ctx))
    fp_ctx = FP_CTX.replace(attn_impl="auto")

    inner = args.inner

    def make_runner(fn):
        def scan_fn(s, *rest):
            def body(c, _):
                out = fn(c, *rest)
                return (out / (1.0 + jnp.abs(out))).astype(c.dtype), ()
            s, _ = jax.lax.scan(body, s, None, length=inner)
            return s
        return jax.jit(scan_fn)

    fp_run = make_runner(lambda s, v, tt, e, a: unet.apply(v, s, tt, e, a,
                                                           fp_ctx))
    q_run = make_runner(lambda s, v, c, tt, e, a: unet.apply(v, s, tt, e,
                                                             a, c))

    def timeit(cf, s, *rest):
        s = cf(s, *rest)
        jax.block_until_ready(s)
        t0 = time.time()
        for _ in range(args.iters):
            s = cf(s, *rest)
        jax.block_until_ready(s)
        return (time.time() - t0) / (args.iters * inner) * 1000.0

    data = {B: make_batch(B) for B in batches}
    # compile everything up-front so rounds compare like with like
    for B in batches:
        s, t, e, a = data[B]
        timeit(fp_run, s, variables, t, e, a)
        timeit(q_run, s, q_vars, ctx, t, e, a)
        log(f"B={B}: compiled")

    results = {B: {"fp": [], "q": []} for B in batches}
    for r in range(args.rounds):
        for B in batches:  # round-robin: every B sees every host phase
            s, t, e, a = data[B]
            fp = timeit(fp_run, s, variables, t, e, a)
            qm = timeit(q_run, s, q_vars, ctx, t, e, a)
            results[B]["fp"].append(fp)
            results[B]["q"].append(qm)
            log(f"round {r} B={B}: bf16={fp:.2f}ms {args.compute}={qm:.2f}ms "
                f"ratio={fp/qm:.3f}")

    from mixdq_tpu.utils.profiling import host_fingerprint

    fprint = host_fingerprint()  # host-class attribution (VERDICT Weak #7)
    for B in batches:
        fp = statistics.median(results[B]["fp"])
        qm = statistics.median(results[B]["q"])
        ratios = [a / b for a, b in zip(results[B]["fp"], results[B]["q"])]
        print(json.dumps({
            "B": B, "bf16_ms": round(fp, 2), "int8_ms": round(qm, 2),
            "speedup": round(statistics.median(ratios), 3),
            "ms_per_img": round(qm / B, 2),
            "host_fingerprint_ms": fprint}))


if __name__ == "__main__":
    main()
