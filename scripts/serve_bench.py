#!/usr/bin/env python
"""Pipeline-level serving benchmark: FP vs int8, paired.

The reference's pipeline tables (kernels/README.md:73-110) report
whole-pipeline memory and UNet latency; its W8A8 win only shows at the
pipeline level when the UNet dominates. This driver measures end-to-end
imgs/sec at a UNet-dominated operating point (default: 30 denoise steps,
the SDXL-base regime, where the UNet is ~85-95%% of the step budget vs
~10%% at 1-step/B=1) with BOTH engines compiled, alternating batches and
reporting the median paired speedup — robust to the host-class flapping
documented in DESIGN_NOTES.md.

Usage:
  python scripts/serve_bench.py --base_path outputs/x \
      [--steps 30] [--batch_size 4] [--deploy_compute int8_sec]
Prints one JSON line: {"fp_imgs_per_sec", "int8_imgs_per_sec",
"speedup", ...}.
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mixdq_tpu.pipelines.loader import build_pipeline, specs_from_config
from mixdq_tpu.pipelines.serving import ServingEngine
from mixdq_tpu.quant.state import QuantCtx
from mixdq_tpu.utils.config import load_config
from mixdq_tpu.utils.profiling import host_fingerprint
from mixdq_tpu.utils.prompts import load_prompts


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_path", required=True)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--deploy_compute", default="int8_sec")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--fuse_qkv", action="store_true", default=True)
    ap.add_argument("--quantize_vae", action="store_true",
                    help="int8 VAE decoder in the quantized engine "
                         "(beyond-parity TPU surface; the reference keeps "
                         "the VAE fp16, quantize_sdxl.py:31-37)")
    ap.add_argument("--vae_compute", default="int8_sec")
    args = ap.parse_args()

    cfg = load_config(os.path.join(args.base_path, "config.yaml"))
    pipe, params = build_pipeline(cfg)

    from mixdq_tpu.quant.checkpoint import load_qparams
    from mixdq_tpu.quant.deploy import (deploy_unet_ctx,
                                        prune_deployed_kernels)
    from mixdq_tpu.quant.state import quantizable_layers, uniform_ctrl

    qparams = load_qparams(os.path.join(args.base_path, "qparams.msgpack"))
    wq, aq, _ = specs_from_config(cfg)
    names = quantizable_layers(params["unet"])
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)
    ctx = deploy_unet_ctx(pipe.unet, {"params": params["unet"]}, qparams,
                          ctrl, wq, aq, splits=pipe.splits,
                          fuse_qkv=args.fuse_qkv)
    ctx = ctx.replace(deploy_compute=args.deploy_compute)
    q_params = {**params, "unet": prune_deployed_kernels(params["unet"],
                                                         ctx.deploy)}

    vae_kw = {}
    prompts = load_prompts(None, args.batch_size)
    if args.quantize_vae:
        import jax

        from mixdq_tpu.quant.vae_quant import quantize_vae_decoder

        # calibrate on REPRESENTATIVE latents: one FP pipeline run's
        # sampler outputs (random-normal proxies scaled by 0.35 were ~3x
        # too tight — real scaled latents have roughly unit std, so
        # min-max act ranges clipped and degraded the decoded images)
        fp_out = pipe(params, prompts, jax.random.PRNGKey(7),
                      num_inference_steps=args.steps,
                      height=cfg.inference.get("height"),
                      width=cfg.inference.get("width"), decode=False)
        lat = [fp_out.latents]
        log(f"VAE calib latents: std={float(fp_out.latents.std()):.3f}")
        pruned_vae, vctx = quantize_vae_decoder(
            pipe.vae, {"params": params["vae"]}, lat, wq, aq,
            deploy_compute=args.vae_compute)
        q_params = {**q_params, "vae": pruned_vae["params"]}
        vae_kw = dict(vae_ctx=vctx)
        log(f"int8 VAE decoder: {len(vctx.deploy)} layers deployed")

    kw = dict(batch_size=args.batch_size, steps=args.steps,
              height=cfg.inference.get("height"),
              width=cfg.inference.get("width"))
    t0 = time.time()
    eng_fp = ServingEngine(pipe, params, QuantCtx(), **kw).compile()
    log(f"fp engine compiled in {time.time()-t0:.1f}s")
    t0 = time.time()
    eng_q = ServingEngine(pipe, q_params, ctx, **kw, **vae_kw).compile()
    log(f"int8 engine compiled in {time.time()-t0:.1f}s")

    # warmup both; the paired warmup images double as the quality signal
    # (same seed -> same noise), recorded as ssim_vs_fp in the JSON
    fp_imgs = eng_fp.generate(prompts, seed=0)
    q_imgs = eng_q.generate(prompts, seed=0)
    import jax.numpy as jnp

    from mixdq_tpu.utils.metrics import ssim as ssim_fn

    ssim_vs_fp = float(sum(
        float(ssim_fn(jnp.asarray(fp_imgs[i]), jnp.asarray(q_imgs[i]),
                      win_size=min(255, fp_imgs.shape[1] - 1)))
        for i in range(len(prompts))) / len(prompts))
    log(f"quality: mean SSIM(int8, fp) = {ssim_vs_fp:.4f}")

    ratios, fp_ts, q_ts = [], [], []
    for r in range(args.rounds):
        t0 = time.time()
        eng_fp.generate(prompts, seed=r)
        fp_dt = time.time() - t0
        t0 = time.time()
        eng_q.generate(prompts, seed=r)
        q_dt = time.time() - t0
        ratios.append(fp_dt / q_dt)
        fp_ts.append(fp_dt)
        q_ts.append(q_dt)
        log(f"round {r}: fp={fp_dt*1000:.0f}ms int8={q_dt*1000:.0f}ms "
            f"ratio={fp_dt/q_dt:.3f}")

    fp_dt = statistics.median(fp_ts)
    q_dt = statistics.median(q_ts)
    out = {
        "family": cfg.model.family,
        "steps": args.steps,
        "batch_size": args.batch_size,
        "deploy_compute": args.deploy_compute,
        "quantize_vae": bool(args.quantize_vae),
        "fp_imgs_per_sec": round(args.batch_size / fp_dt, 3),
        "int8_imgs_per_sec": round(args.batch_size / q_dt, 3),
        "speedup": round(statistics.median(ratios), 3),
        "ssim_vs_fp": round(ssim_vs_fp, 4),
        # host-class attribution (VERDICT r4 Weak #7)
        "fp_batch_ms": round(fp_dt * 1000, 1),
        "host_fingerprint_ms": host_fingerprint(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
