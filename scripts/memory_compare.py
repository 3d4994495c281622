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


def unet_mem(family, B, quant=None, w_bits=8):
    """Returns (static_mb, dynamic_mb, peak_mb) for one UNet forward."""
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
        ctx = deploy_unet_ctx(unet, variables, qparams, ctrl, wq, aq)
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
    ap.add_argument("--compute", default="int8", choices=["int8", "dequant"])
    args = ap.parse_args()

    print(f"{'config':<16} {'static MB':>10} {'dynamic MB':>11} {'peak MB':>9}")
    s, d, p = unet_mem(args.family, args.batch)
    print(f"{'bf16':<16} {s:>10.1f} {d:>11.1f} {p:>9.1f}")
    fp = (s, d, p)
    # fresh process-level peak is not resettable; report quant on its own
    s, d, p = unet_mem(args.family, args.batch, quant=args.compute,
                       w_bits=args.w_bits)
    name = f"W{args.w_bits}A8-{args.compute}"
    print(f"{name:<16} {s:>10.1f} {d:>11.1f} {p:>9.1f}")
    print(f"static saving: {fp[0]/max(s,1e-9):.2f}x")


if __name__ == "__main__":
    main()
