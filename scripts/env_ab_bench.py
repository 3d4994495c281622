#!/usr/bin/env python
"""Generic same-process interleaved A/B over trace-time env knobs.

Each variant is an ``NAME=VALUE[;NAME2=VALUE2]`` env spec applied just
before that variant's trace+compile; all variants are then timed
round-robin in one process (the only valid methodology on this host
class — DESIGN_NOTES "Round-4 findings": the machine flaps 10-50x
between speed classes minutes apart, so only paired same-session
medians are comparable).

Examples:
  python scripts/env_ab_bench.py --variants MIXDQ_CROSS_KV=1 MIXDQ_CROSS_KV=0
  python scripts/env_ab_bench.py --family sdxl \
      --variants 'MIXDQ_INT8_FLASH=1;MIXDQ_CROSS_KV=1' MIXDQ_INT8_FLASH=0
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+", required=True,
                    help="env specs, e.g. MIXDQ_CROSS_KV=1 MIXDQ_CROSS_KV=0")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--family", default="sdxl-turbo")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--backend", default="int8_fq_sec",
                    help="bench.py-style mode: int8_fq_sec | int8_fq | bf16")
    args = ap.parse_args()

    def parse(spec):
        pairs = []
        for kv in spec.split(";"):
            kv = kv.strip()
            if not kv:
                continue
            k, _, v = kv.partition("=")
            pairs.append((k.strip(), v.strip()))
        if not pairs:
            raise SystemExit(f"empty variant spec: {spec!r}")
        return pairs

    variants = {spec: parse(spec) for spec in args.variants}

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

    log(f"env_ab_bench: {args.family} B={B} backend={args.backend} "
        f"on {jax.devices()[0]}")
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
    if args.backend == "bf16":
        from mixdq_tpu.quant.state import QuantCtx

        ctx = QuantCtx()
        q_vars = jax.device_put(variables)
    else:
        ctx = deploy_unet_ctx(unet, variables, qparams, ctrl, wq, aq,
                              fuse_qkv="_fq" in args.backend)
        sec = args.backend.endswith("_sec")
        ctx = ctx.replace(deploy_compute="int8_sec" if sec else "int8",
                          attn_impl="auto" if sec else "einsum")
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

    saved = {}
    runners = {}
    for spec, pairs in variants.items():
        for kname, val in pairs:
            if kname not in saved:
                saved[kname] = os.environ.get(kname)
            os.environ[kname] = val
        t0 = time.time()
        r = make_runner()
        out = r(sample, q_vars, ctx, t, ehs, added)
        jax.block_until_ready(out)
        runners[spec] = r
        log(f"compiled {spec}: {time.time()-t0:.1f}s")
    for kname, val in saved.items():
        if val is None:
            os.environ.pop(kname, None)
        else:
            os.environ[kname] = val

    def timeit(r):
        s = r(sample, q_vars, ctx, t, ehs, added)
        jax.block_until_ready(s)
        t0 = time.time()
        for _ in range(args.iters):
            s = r(s, q_vars, ctx, t, ehs, added)
        jax.block_until_ready(s)
        return (time.time() - t0) / (args.iters * args.inner) * 1000.0

    times = {spec: [] for spec in variants}
    for rd in range(args.rounds):
        for spec in variants:
            ms = timeit(runners[spec])
            times[spec].append(ms)
            log(f"round {rd} {spec}: {ms:.3f} ms/step")
    names = list(variants)
    base = statistics.median(times[names[0]])
    w = max(len(s) for s in names)
    print(f"{'variant':>{w}}  {'median ms':>9}  ratio")
    for spec in names:
        m = statistics.median(times[spec])
        print(f"{spec:>{w}}  {m:9.3f}  {base/m:6.3f}")


if __name__ == "__main__":
    main()
