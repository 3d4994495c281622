#!/usr/bin/env python
"""Quantized text-to-image generation (fake-quant simulation path).

TPU-native counterpart of scripts/quant_txt2img.py:30-280: loads the
quant checkpoint, optionally applies per-layer mixed-precision bit YAMLs
(``--config_weight_mp``/``--config_act_mp``) and an act-protect FP list
(``--act_protect``), then generates images. Because per-layer bit
configuration is a jit *argument* here, switching configs costs nothing
(the reference re-runs Python module surgery per config,
quant_txt2img.py:207-245).

Usage:
  python scripts/quant_txt2img.py --base_path logs/x \
      [--config_weight_mp w.yaml --config_act_mp a.yaml \
       --act_protect protected.yaml] \
      [--prompt "a cat"] [--n_images 4] [--backend fake|int8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import yaml

from mixdq_tpu.pipelines.loader import build_pipeline, specs_from_config
from mixdq_tpu.quant.checkpoint import load_qparams
from mixdq_tpu.quant.state import (QuantCtx, apply_bitwidth_config,
                                   protect_layers, quantizable_layers,
                                   uniform_ctrl)
from mixdq_tpu.utils.config import load_config
from mixdq_tpu.utils.logging_utils import setup_experiment
from mixdq_tpu.utils.prompts import load_prompts


def save_images(images, outdir, prefix="img"):
    from PIL import Image
    os.makedirs(outdir, exist_ok=True)
    paths = []
    for i, img in enumerate(images):
        p = os.path.join(outdir, f"{prefix}_{i:04d}.png")
        Image.fromarray((img * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


def build_quant_ctx(cfg, pipe, params, qparams, args):
    """Assemble the QuantCtx: uniform bits from config, then MP yamls,
    then act-protect (the load order of quant_txt2img.py:207-245)."""
    wq, aq, softmax_aq = specs_from_config(cfg)
    # control entries for every calibrated entity, incl. bare q/k/v/softmax
    # act quantizers when qkv-quant configs are in play
    names = set(quantizable_layers(params["unet"])) | set(qparams)
    cb = wq.candidate_bits
    ctrl = uniform_ctrl(sorted(names), w_bits=cfg.quant.weight.n_bits,
                        a_bits=cfg.quant.activation.n_bits,
                        candidate_bits=cb)
    if args.config_weight_mp:
        with open(args.config_weight_mp) as f:
            ctrl = apply_bitwidth_config(ctrl, yaml.safe_load(f), "weight", cb)
    if args.act_protect:
        # YAML list (repo format) or the reference's torch-saved .pt
        # (act_sensitivie_a8_1%.pt, quant_inference_mp.py:239-241)
        from mixdq_tpu.mixed_precision.reference_data import load_act_protect
        ctrl = protect_layers(ctrl, load_act_protect(args.act_protect), "act")
    if args.config_act_mp:
        with open(args.config_act_mp) as f:
            ctrl = apply_bitwidth_config(ctrl, yaml.safe_load(f), "act", cb)
    return QuantCtx(
        qparams=qparams, ctrl=ctrl, mode=args.backend, wq=wq, aq=aq,
        softmax_aq=softmax_aq,
        bos_aware=cfg.inference.get("bos_aware", True),
        qkv_quant=softmax_aq is not None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_path", required=True,
                    help="experiment dir with config.yaml + qparams.msgpack")
    ap.add_argument("--config_weight_mp", default=None)
    ap.add_argument("--config_act_mp", default=None)
    ap.add_argument("--act_protect", default=None,
                    help="layer names kept FP for acts: yaml list or the "
                         "reference's torch-saved .pt list")
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--n_images", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--backend", choices=["fake", "int8"], default="fake")
    ap.add_argument("--fuse_qkv", action="store_true",
                    help="int8: fuse attention q/k/v projections into one "
                         "shared-act-scale GEMM")
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    cfg = load_config(os.path.join(args.base_path, "config.yaml"))
    outdir = args.outdir or os.path.join(args.base_path, "generated_images")
    setup_experiment(outdir)

    pipe, params = build_pipeline(cfg)
    qparams = load_qparams(os.path.join(args.base_path, "qparams.msgpack"))
    ctx = build_quant_ctx(cfg, pipe, params, qparams, args)
    if args.backend == "int8":
        from mixdq_tpu.quant.deploy import (deploy_unet_ctx,
                                            precompute_bos_outputs,
                                            prune_deployed_kernels)
        wq, aq, _ = specs_from_config(cfg)
        bos_aware = cfg.inference.get("bos_aware", True)
        ctx = deploy_unet_ctx(
            pipe.unet, {"params": params["unet"]}, qparams, ctx.ctrl, wq, aq,
            splits=pipe.splits, bos_aware=bos_aware, fuse_qkv=args.fuse_qkv)
        # measured-best compute strategy for the family (configs.py)
        ctx = ctx.replace(
            deploy_compute=pipe.family.default_deploy_compute)
        if bos_aware:
            # BoS encoder output is prompt-independent (causal attention):
            # precompute per-layer k/v BoS outputs offline
            import jax.numpy as jnp
            tokens = jnp.asarray(pipe.tokenizer([""]))
            embeds, _ = pipe.encode_prompt(params, tokens)
            ctx = ctx.replace(deploy=precompute_bos_outputs(
                ctx.deploy, params["unet"], embeds[0, 0]))
        params = {**params,
                  "unet": prune_deployed_kernels(params["unet"], ctx.deploy)}

    prompts = ([args.prompt] * args.n_images if args.prompt
               else load_prompts(None, args.n_images))
    key = jax.random.PRNGKey(args.seed)
    inf = cfg.inference
    all_paths = []
    for i in range(0, len(prompts), args.batch_size):
        key, k = jax.random.split(key)
        out = pipe(params, prompts[i : i + args.batch_size], k,
                   num_inference_steps=inf.get("num_steps"),
                   guidance_scale=inf.get("guidance_scale"),
                   height=inf.get("height"), width=inf.get("width"),
                   ctx=ctx)
        all_paths += save_images(out.images, outdir, prefix=f"quant_{i:04d}")
    print(f"wrote {len(all_paths)} images to {outdir}")


if __name__ == "__main__":
    main()
