#!/usr/bin/env python
"""Memory comparison: FP vs quantized UNet static/dynamic/peak HBM.

Counterpart of the reference's memory benchmark
(kernels/scripts/run_memory_compare.sh; methodology
kernels/quantize_sdxl.py:337-338,453-456 and the README tables
README.md:41-45: static=weights, dynamic=activations, peak).

Usage: python scripts/memory_compare.py [--family sdxl-turbo] [--batch 1]
       [--w_bits 8|4]
Prints a table like the reference's.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def unet_mem(family, B, quant=None, w_bits=8, pack_w4=False, mp_w=None,
             mp_a=None, act_protect=None):
    """Returns (static_mb, dynamic_mb, peak_mb) for one UNet forward.

    ``pack_w4`` keeps W<=4 weights halves-packed RESIDENT (the pallas
    wq4 route under compute='dequant'; int8 computes would unpack
    in-graph) — the static-memory operating point of the paper's 3.4x
    W4A8 claim (reference README.md:28). ``mp_w``/``mp_a``/``act_protect``
    apply elected mixed-precision YAMLs before deploy."""
    from mixdq_tpu.models.configs import get_family
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.state import QuantCtx, quantizable_layers, uniform_ctrl
    from mixdq_tpu.utils.profiling import device_memory_stats

    f = get_family(family)
    unet = UNet2DConditionModel(f.unet, dtype=jnp.bfloat16)
    H = f.unet.sample_size
    sample = jnp.zeros((B, H, H, 4), jnp.bfloat16)
    t = jnp.asarray(999.0)
    ehs = jnp.zeros((B, 77, f.unet.cross_attention_dim), jnp.bfloat16)
    added = None
    if f.unet.addition_embed_type == "text_time":
        pooled = (f.text_encoder_2.projection_dim
                  if f.text_encoder_2 is not None else 1280)
        added = {"text_embeds": jnp.zeros((B, pooled), jnp.bfloat16),
                 "time_ids": jnp.zeros((B, 6), jnp.bfloat16)}
    variables = jax.jit(unet.init)(jax.random.PRNGKey(0), sample, t, ehs, added)

    ctx = QuantCtx()
    if quant:
        from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params

        wq = QuantSpec(sym=True, channel_wise=True, round_mode="nearest",
                       n_bits=w_bits)
        aq = QuantSpec(running_stat=True)
        names = quantizable_layers(variables["params"])
        qparams = cal.calibrate(unet, variables, [(sample, t, ehs, added)],
                                wq, aq)
        ctrl = uniform_ctrl(names, w_bits=w_bits, a_bits=8)
        if mp_w or mp_a or act_protect:
            import yaml

            from mixdq_tpu.quant.state import (apply_bitwidth_config,
                                               protect_layers)
            cb = wq.candidate_bits
            if mp_w:
                with open(mp_w) as fh:
                    ctrl = apply_bitwidth_config(ctrl, yaml.safe_load(fh),
                                                 "weight", cb)
            if act_protect:
                from mixdq_tpu.mixed_precision.reference_data import (
                    load_act_protect)
                ctrl = protect_layers(ctrl, load_act_protect(act_protect),
                                      "act")
            if mp_a:
                with open(mp_a) as fh:
                    ctrl = apply_bitwidth_config(ctrl, yaml.safe_load(fh),
                                                 "act", cb)
        ctx = deploy_unet_ctx(unet, variables, qparams, ctrl, wq, aq,
                              pack_w4=pack_w4)
        ctx = ctx.replace(deploy_compute=quant)
        variables = jax.device_put(deployed_params(variables, ctx))

    fn = jax.jit(lambda v, c: unet.apply(v, sample, t, ehs, added, c))
    # device memory_stats is unavailable on some backends (returns zeros
    # via the axon tunnel); XLA's compiled memory analysis is exact and
    # backend-independent: static = argument buffers (weights + deploy
    # constants), dynamic = temporaries, peak from buffer assignment.
    compiled = fn.lower(variables, ctx).compile()
    ma = compiled.memory_analysis()
    static = ma.argument_size_in_bytes / 1e6
    dynamic = ma.temp_size_in_bytes / 1e6
    peak = ma.peak_memory_in_bytes / 1e6
    live = device_memory_stats()
    if live.get("peak_bytes_in_use_mb"):
        out = fn(variables, ctx)
        jax.block_until_ready(out)
        live = device_memory_stats()
        peak = max(peak, live["peak_bytes_in_use_mb"])
    return static, dynamic, peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="sdxl-turbo")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--w_bits", type=int, default=8)
    ap.add_argument("--compute", default="int8",
                    choices=["int8", "int8_sec", "dequant"])
    ap.add_argument("--pack_w4", action="store_true",
                    help="keep W<=4 weights halves-packed resident "
                    "(pairs with --compute dequant for the paper's 3.4x "
                    "static claim)")
    ap.add_argument("--mp_w", default=None,
                    help="elected weight MP yaml (per-layer bits)")
    ap.add_argument("--mp_a", default=None,
                    help="elected act MP yaml")
    ap.add_argument("--act_protect", default=None,
                    help="act-protect list (yaml or reference .pt)")
    ap.add_argument("--json", action="store_true",
                    help="also print one machine-readable JSON line")
    args = ap.parse_args()

    print(f"{'config':<16} {'static MB':>10} {'dynamic MB':>11} {'peak MB':>9}")
    s0, d0, p0 = unet_mem(args.family, args.batch)
    print(f"{'bf16':<16} {s0:>10.1f} {d0:>11.1f} {p0:>9.1f}")
    # fresh process-level peak is not resettable; report quant on its own
    s, d, p = unet_mem(args.family, args.batch, quant=args.compute,
                       w_bits=args.w_bits, pack_w4=args.pack_w4,
                       mp_w=args.mp_w, mp_a=args.mp_a,
                       act_protect=args.act_protect)
    if args.mp_w or args.mp_a:
        name = "MP"
        if args.mp_w:
            name += f"-W{os.path.basename(args.mp_w).rsplit('.yaml', 1)[0]}"
        if args.mp_a:
            name += f"-A{os.path.basename(args.mp_a).rsplit('.yaml', 1)[0]}"
    else:
        name = f"W{args.w_bits}A8"
    if args.pack_w4:
        name += "-packed"
    name += f"-{args.compute}"
    print(f"{name:<16} {s:>10.1f} {d:>11.1f} {p:>9.1f}")
    print(f"static saving: {s0/max(s,1e-9):.2f}x  "
          f"peak saving: {p0/max(p,1e-9):.2f}x")
    if args.json:
        import json
        print(json.dumps({
            "family": args.family, "batch": args.batch, "config": name,
            "bf16": {"static_mb": round(s0, 1), "dynamic_mb": round(d0, 1),
                     "peak_mb": round(p0, 1)},
            "quant": {"static_mb": round(s, 1), "dynamic_mb": round(d, 1),
                      "peak_mb": round(p, 1)},
            "static_saving": round(s0 / max(s, 1e-9), 2),
            "peak_saving": round(p0 / max(p, 1e-9), 2),
        }))


if __name__ == "__main__":
    main()
