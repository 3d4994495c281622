#!/usr/bin/env python
"""FP baseline text-to-image generation (reference scripts/txt2img.py).

Usage: python scripts/txt2img.py --config configs/sdxl_turbo.yaml \
           --outdir logs/fp [--prompt "..."] [--n_images 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from mixdq_tpu.pipelines.loader import build_pipeline
from mixdq_tpu.utils.config import load_config
from mixdq_tpu.utils.logging_utils import setup_experiment
from mixdq_tpu.utils.prompts import load_prompts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--n_images", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    cfg = load_config(args.config)
    setup_experiment(args.outdir, args.config)
    pipe, params = build_pipeline(cfg)

    from quant_txt2img import save_images  # same dir

    prompts = ([args.prompt] * args.n_images if args.prompt
               else load_prompts(None, args.n_images))
    key = jax.random.PRNGKey(args.seed)
    inf = cfg.inference
    for i in range(0, len(prompts), args.batch_size):
        key, k = jax.random.split(key)
        out = pipe(params, prompts[i : i + args.batch_size], k,
                   num_inference_steps=inf.get("num_steps"),
                   guidance_scale=inf.get("guidance_scale"),
                   height=inf.get("height"), width=inf.get("width"))
        save_images(out.images, args.outdir, prefix=f"fp_{i:04d}")
    print(f"wrote images to {args.outdir}")


if __name__ == "__main__":
    main()
