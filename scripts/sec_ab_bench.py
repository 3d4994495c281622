#!/usr/bin/env python
"""Same-process interleaved A/B of the int8_sec whole-block fusion knobs.

The whole-block out-GEMM kernels (attn1/attn2/ff) and the in-kernel LN
fold are trace-time env knobs (MIXDQ_SEC_OUTFUSE / MIXDQ_SEC_LNFOLD,
models/attention.py). Standalone microbenches are untrustworthy on this
host class (DESIGN_NOTES "Round-4 findings"), so this harness traces one
UNet runner PER VARIANT (env set just before the first compile) and then
times all variants round-robin in one process, reporting per-variant
medians and ratios vs the first variant.

Usage: python scripts/sec_ab_bench.py --variants all,none,lnoff,attn1,attn2,ff
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


# variant -> (MIXDQ_SEC_OUTFUSE, MIXDQ_SEC_LNFOLD)
VARIANTS = {
    "all": ("1", "1"),        # current default: all 3 sites + LN fold
    "none": ("0", "1"),       # pre-whole-block state (split kernels)
    "lnoff": ("1", "0"),      # whole-block kernels, standalone LN producer
    "attn1": ("attn1", "1"),  # bisect: one site at a time
    "attn2": ("attn2", "1"),
    "ff": ("ff", "1"),
    "attn1_attn2": ("attn1,attn2", "1"),
    "attn1_ff": ("attn1,ff", "1"),
    "attn2_ff": ("attn2,ff", "1"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="all,none,lnoff,attn1,attn2,ff")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--family", default="sdxl-turbo")
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
    from mixdq_tpu.quant.state import quantizable_layers, uniform_ctrl

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

    log(f"sec_ab_bench: {args.family} B={B} on {jax.devices()[0]}")
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
        # ctx (the deploy pytree — GBs of weights) must be a jit ARG, not
        # a captured constant, or every variant bakes its own 2.5GB copy
        def chained(s, v, c, tt, e, a):
            out = unet.apply(v, s, tt, e, a, c)
            return (out / (1.0 + jnp.abs(out))).astype(s.dtype)

        def scan_fn(s, v, c, tt, e, a):
            def body(carry, _):
                return chained(carry, v, c, tt, e, a), ()
            s, _ = jax.lax.scan(body, s, None, length=args.inner)
            return s

        return jax.jit(scan_fn)

    # trace+compile each variant under its env (env is read at trace time)
    runners = {}
    for v in names:
        of, lf = VARIANTS[v]
        os.environ["MIXDQ_SEC_OUTFUSE"] = of
        os.environ["MIXDQ_SEC_LNFOLD"] = lf
        t0 = time.time()
        r = make_runner()
        out = r(sample, q_vars, ctx, t, ehs, added)
        jax.block_until_ready(out)
        runners[v] = r
        log(f"compiled {v} (OUTFUSE={of} LNFOLD={lf}): {time.time()-t0:.1f}s")

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
    print(f"{'variant':>12}  {'median ms':>9}  {'vs ' + names[0]:>9}")
    for v in names:
        m = statistics.median(times[v])
        print(f"{v:>12}  {m:9.3f}  {base/m:9.3f}")


if __name__ == "__main__":
    main()
