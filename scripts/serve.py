#!/usr/bin/env python
"""Batch serving CLI: AOT-compile the full pipeline once, then generate
continuously from prompts on stdin or a prompt file.

Usage:
  python scripts/serve.py --base_path logs/x [--backend fake|int8|fp]
      [--batch_size 4] [--dp 1] [--prompts file.txt] [--outdir out/]
Reports per-batch latency and imgs/sec (the serving-path deliverable of
SURVEY.md §7 step 6).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mixdq_tpu.pipelines.loader import build_pipeline, specs_from_config
from mixdq_tpu.pipelines.serving import ServingEngine
from mixdq_tpu.quant.state import QuantCtx
from mixdq_tpu.utils.config import load_config
from mixdq_tpu.utils.prompts import load_prompts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_path", default=None,
                    help="experiment dir (enables quant backends)")
    ap.add_argument("--config", default=None,
                    help="config yaml (FP serving without experiment dir)")
    ap.add_argument("--backend", choices=["fp", "fake", "int8"], default="fp")
    ap.add_argument("--fuse_qkv", action="store_true",
                    help="int8: fuse attention q/k/v projections into one "
                         "shared-act-scale GEMM")
    ap.add_argument("--deploy_compute", default=None,
                    help="int8 backend compute strategy (int8 | int8_sec "
                         "| dequant); default = the family's measured-best "
                         "(ModelFamilyConfig.default_deploy_compute)")
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel devices (mesh over local devices)")
    ap.add_argument("--prompts", default=None)
    ap.add_argument("--n_batches", type=int, default=2)
    ap.add_argument("--outdir", default="serve_out")
    args = ap.parse_args()

    cfg_path = (os.path.join(args.base_path, "config.yaml")
                if args.base_path else args.config)
    assert cfg_path, "need --base_path or --config"
    cfg = load_config(cfg_path)
    pipe, params = build_pipeline(cfg)

    ctx = QuantCtx()
    if args.backend != "fp":
        assert args.base_path, "quant backends need --base_path"
        from quant_txt2img import build_quant_ctx
        from mixdq_tpu.quant.checkpoint import load_qparams

        qparams = load_qparams(os.path.join(args.base_path, "qparams.msgpack"))

        class _A:  # reuse the ctx builder with no MP overrides
            config_weight_mp = config_act_mp = act_protect = None
            backend = "fake"

        ctx = build_quant_ctx(cfg, pipe, params, qparams, _A)
        if args.backend == "int8":
            from mixdq_tpu.quant.deploy import (deploy_unet_ctx,
                                                prune_deployed_kernels)
            wq, aq, _ = specs_from_config(cfg)
            ctx = deploy_unet_ctx(pipe.unet, {"params": params["unet"]},
                                  qparams, ctx.ctrl, wq, aq,
                                  splits=pipe.splits,
                                  fuse_qkv=args.fuse_qkv)
            ctx = ctx.replace(
                deploy_compute=(args.deploy_compute
                                or pipe.family.default_deploy_compute))
            params = {**params, "unet": prune_deployed_kernels(
                params["unet"], ctx.deploy)}

    mesh = None
    if args.dp > 1:
        from mixdq_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.dp, tp=1)

    t0 = time.time()
    eng = ServingEngine(pipe, params, ctx, batch_size=args.batch_size,
                        steps=args.steps,
                        height=cfg.inference.get("height"),
                        width=cfg.inference.get("width"),
                        mesh=mesh).compile()
    print(f"compiled in {time.time()-t0:.1f}s")

    prompts = load_prompts(args.prompts, args.batch_size * args.n_batches)
    os.makedirs(args.outdir, exist_ok=True)
    from PIL import Image

    n = 0
    for bi in range(args.n_batches):
        batch = prompts[bi * args.batch_size : (bi + 1) * args.batch_size]
        t0 = time.time()
        imgs = eng.generate(batch, seed=bi)
        dt = time.time() - t0
        print(f"batch {bi}: {dt*1000:.1f} ms "
              f"({args.batch_size/dt:.2f} imgs/sec)")
        for img in imgs:
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(args.outdir, f"serve_{n:05d}.png"))
            n += 1
    print(f"wrote {n} images to {args.outdir}")


if __name__ == "__main__":
    main()
