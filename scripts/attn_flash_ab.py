#!/usr/bin/env python
"""Interleaved A/B + numerics check for the int8 flash-attention knob.

MIXDQ_INT8_FLASH routes large-T self-attention on the int8_sec deploy
path: "1" = fully-int8 flash (QK^T and P@V on the int8 MXU), "qk" =
int8 QK^T only, "0" = bf16 flash (round-4 behavior). The knob is read
at trace time, so each variant gets its own compiled runner and all
variants are timed round-robin in one process (the only valid
methodology on this host class — DESIGN_NOTES).

Also reports each variant's one-step UNet-output SQNR vs the bf16
reference, so the quantized-attention quality cost is measured in the
same artifact that justifies the latency default.

Usage: python scripts/attn_flash_ab.py --family sdxl [--rounds 5]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


VARIANTS = {"int8qkv": "1", "int8qk": "qk", "bf16": "0"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="int8qkv,int8qk,bf16")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--family", default="sdxl")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    names = [v for v in args.variants.split(",") if v]
    for v in names:
        if v not in VARIANTS:
            raise SystemExit(f"unknown variant {v}; know {list(VARIANTS)}")

    from mixdq_tpu.models.configs import get_family
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import (FP_CTX, quantizable_layers,
                                       uniform_ctrl)

    f = get_family(args.family)
    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(f.unet, dtype=dtype)
    H = f.unet.sample_size
    B = args.batch
    k = jax.random.PRNGKey(0)
    sample = jax.random.normal(k, (B, H, H, f.unet.in_channels), dtype)
    t = jnp.asarray(999.0)
    ehs = jax.random.normal(k, (B, 77, f.unet.cross_attention_dim), dtype)
    added = None
    if f.unet.addition_embed_type == "text_time":
        pooled = (f.text_encoder_2.projection_dim
                  if f.text_encoder_2 is not None else 1280)
        added = {"text_embeds": jnp.zeros((B, pooled), dtype),
                 "time_ids": jnp.zeros((B, 6), dtype)}

    log(f"attn_flash_ab: {args.family} B={B} on {jax.devices()[0]}")
    t0 = time.time()
    variables = jax.jit(unet.init)(jax.random.PRNGKey(0), sample, t, ehs,
                                   added)
    jax.block_until_ready(variables)
    log(f"init: {time.time()-t0:.1f}s")

    wq = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    aq = QuantSpec(running_stat=True)
    layer_names = quantizable_layers(variables["params"])
    qparams = cal.calibrate(unet, variables, [(sample, t, ehs, added)],
                            wq, aq)
    ctrl = uniform_ctrl(layer_names, w_bits=8, a_bits=8)
    ctx = deploy_unet_ctx(unet, variables, qparams, ctrl, wq, aq,
                          fuse_qkv=True)
    ctx = ctx.replace(deploy_compute="int8_sec", attn_impl="auto")
    q_vars = jax.device_put(deployed_params(variables, ctx))

    def make_runner():
        def chained(s, v, c, tt, e, a):
            out = unet.apply(v, s, tt, e, a, c)
            return (out / (1.0 + jnp.abs(out))).astype(s.dtype)

        def scan_fn(s, v, c, tt, e, a):
            def body(carry, _):
                return chained(carry, v, c, tt, e, a), ()
            s, _ = jax.lax.scan(body, s, None, length=args.inner)
            return s

        return jax.jit(scan_fn)

    # bf16 reference output for the numerics column
    step = jax.jit(lambda s, v, c, tt, e, a: unet.apply(v, s, tt, e, a, c))
    ref = step(sample, variables, FP_CTX.replace(attn_impl="auto"), t, ehs,
               added)
    jax.block_until_ready(ref)

    runners, sqnrs = {}, {}
    for v in names:
        os.environ["MIXDQ_INT8_FLASH"] = VARIANTS[v]
        t0 = time.time()
        r = make_runner()
        out = r(sample, q_vars, ctx, t, ehs, added)
        jax.block_until_ready(out)
        one = step(sample, q_vars, ctx, t, ehs, added)
        err = (one.astype(jnp.float32) - ref.astype(jnp.float32))
        sq = 10.0 * jnp.log10(jnp.mean(ref.astype(jnp.float32) ** 2)
                              / jnp.maximum(jnp.mean(err ** 2), 1e-20))
        sqnrs[v] = float(sq)
        runners[v] = r
        log(f"compiled {v} (INT8_FLASH={VARIANTS[v]}): {time.time()-t0:.1f}s"
            f"  sqnr_vs_bf16={sqnrs[v]:.1f} dB")

    def timeit(r):
        s = r(sample, q_vars, ctx, t, ehs, added)
        jax.block_until_ready(s)
        t0 = time.time()
        for _ in range(args.iters):
            s = r(s, q_vars, ctx, t, ehs, added)
        jax.block_until_ready(s)
        return (time.time() - t0) / (args.iters * args.inner) * 1000.0

    times = {v: [] for v in names}
    for rd in range(args.rounds):
        for v in names:
            ms = timeit(runners[v])
            times[v].append(ms)
            log(f"round {rd} {v}: {ms:.3f} ms/step")

    base = statistics.median(times[names[0]])
    print(f"{'variant':>10}  {'median ms':>10}  {'vs ' + names[0]:>10}"
          f"  {'sqnr dB':>8}")
    for v in names:
        med = statistics.median(times[v])
        print(f"{v:>10}  {med:>10.3f}  {base / med:>10.3f}"
              f"  {sqnrs[v]:>8.1f}")


if __name__ == "__main__":
    main()
