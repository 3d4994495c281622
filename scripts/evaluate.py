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


def _load_clip_vision(ckpt_path: str):
    """Build a jitted image->embedding function from a local CLIP vision
    checkpoint (torch .pt/.bin state dict or flax .msgpack params)."""
    from mixdq_tpu.models.clip import CLIPVisionModel, preprocess_images
    from mixdq_tpu.models.configs import CLIPVisionConfig

    if ckpt_path.endswith(".msgpack"):
        from flax import serialization

        with open(ckpt_path, "rb") as f:
            params = serialization.msgpack_restore(f.read())
    else:
        import torch

        from mixdq_tpu.utils.torch_convert import (
            convert_clip_vision_state_dict)

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        params = convert_clip_vision_state_dict(
            {k: v.numpy() for k, v in sd.items()})
    hidden = np.asarray(params["class_embedding"]).shape[-1]
    n_pos = np.asarray(params["position_embedding"]).shape[0]
    patch = np.asarray(params["patch_embedding"]["kernel"]).shape[0]
    proj = (np.asarray(params["visual_projection"]["kernel"]).shape[-1]
            if "visual_projection" in params else None)
    image_size = int(round((n_pos - 1) ** 0.5)) * patch
    cfg = CLIPVisionConfig(
        image_size=image_size, patch_size=patch, hidden_size=hidden,
        num_layers=sum(1 for k in params if k.startswith("layers_")),
        num_heads=hidden // 64,
        intermediate_size=np.asarray(
            params["layers_0"]["fc1"]["kernel"]).shape[-1],
        projection_dim=proj)
    model = CLIPVisionModel(cfg)

    @jax.jit
    def embed(images):
        px = preprocess_images(jnp.asarray(images, jnp.float32),
                               cfg.image_size)
        _, pooled = model.apply({"params": params}, px)
        return pooled

    return embed


def _load_inception(ckpt_path: str):
    """Jitted image->pool3-features function from a local torchvision
    Inception3 state dict (BN folded at conversion)."""
    import torch

    from mixdq_tpu.models.inception import InceptionV3Features
    from mixdq_tpu.utils.torch_convert import convert_inception_state_dict

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    params = convert_inception_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    model = InceptionV3Features()

    @jax.jit
    def feats(images):
        return model.apply({"params": params},
                           jnp.asarray(images, jnp.float32))

    return feats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_path", required=True)
    ap.add_argument("--backend", choices=["fake", "int8"], default="fake")
    ap.add_argument("--deploy_compute", default=None,
                    help="int8 backend compute mode; default 'int8' (the "
                         "plain einsum deploy — round-2 CLI semantics). "
                         "Pass int8_sec to evaluate the shipped Pallas "
                         "serving path.")
    ap.add_argument("--matrix", default=None,
                    help="comma list of deploy configs evaluated in ONE "
                         "process against ONE shared FP run (the r4 "
                         "plain-int8 eval timed out recompiling the FP "
                         "pipeline per invocation): entries from "
                         "{w8_int8, w8_sec, w4_sec, mp_sec}; mp_sec uses "
                         "--config_weight_mp/--config_act_mp/--act_protect. "
                         "Writes eval_<entry>.yaml each. Overrides "
                         "--backend.")
    ap.add_argument("--fuse_qkv", action="store_true",
                    help="int8 backend: fused QKV/KV projections (the "
                         "serving default)")
    ap.add_argument("--n_prompts", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--config_weight_mp", default=None)
    ap.add_argument("--config_act_mp", default=None)
    ap.add_argument("--act_protect", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--clip_vision_ckpt", default=None,
                    help="local torch state dict (or .msgpack flax params) "
                         "of a CLIP vision tower; enables CLIP-score and "
                         "CLIP-FID between the FP and quantized image sets")
    ap.add_argument("--inception_ckpt", default=None,
                    help="local torchvision Inception3 state dict; enables "
                         "true FID (pool3 features) between the FP and "
                         "quantized image sets")
    args = ap.parse_args()

    cfg = load_config(os.path.join(args.base_path, "config.yaml"))
    pipe, params = build_pipeline(cfg)
    qparams = load_qparams(os.path.join(args.base_path, "qparams.msgpack"))

    from quant_txt2img import build_quant_ctx

    def make_deploy(entry):
        """entry -> (tag_fields, ctx, q_params). Matrix entries build a
        deploy per config; everything reuses ONE FP image set below."""
        from mixdq_tpu.quant.deploy import (deploy_unet_ctx,
                                            prune_deployed_kernels,
                                            unpack_packed_entries)
        from mixdq_tpu.quant.state import (apply_bitwidth_config,
                                           protect_layers, quantizable_layers,
                                           uniform_ctrl)
        wq, aq, _ = specs_from_config(cfg)
        cb = wq.candidate_bits
        names = quantizable_layers(params["unet"])
        w_bits = 4 if entry.startswith("w4") else 8
        ctrl = uniform_ctrl(names, w_bits=w_bits, a_bits=8)
        mp = entry.startswith("mp")
        if mp:
            assert args.config_weight_mp and args.config_act_mp, \
                "mp_sec matrix entry needs --config_weight_mp/--config_act_mp"
            with open(args.config_weight_mp) as f:
                ctrl = apply_bitwidth_config(ctrl, yaml.safe_load(f),
                                             "weight", cb)
            if args.act_protect:
                from mixdq_tpu.mixed_precision.reference_data import (
                    load_act_protect)
                ctrl = protect_layers(ctrl, load_act_protect(args.act_protect),
                                      "act")
            with open(args.config_act_mp) as f:
                ctrl = apply_bitwidth_config(ctrl, yaml.safe_load(f),
                                             "act", cb)
        sec = entry.endswith("_sec")
        pack = w_bits == 4 or mp
        ctx = deploy_unet_ctx(pipe.unet, {"params": params["unet"]}, qparams,
                              ctrl, wq, aq, splits=pipe.splits,
                              pack_w4=pack, fuse_qkv=sec)
        if pack:
            ctx = ctx.replace(deploy=unpack_packed_entries(ctx.deploy))
        ctx = ctx.replace(deploy_compute="int8_sec" if sec else "int8",
                          attn_impl="auto" if sec else "einsum")
        qp = {**params, "unet": prune_deployed_kernels(params["unet"],
                                                       ctx.deploy)}
        fields = {"backend": "int8", "deploy_compute": ctx.deploy_compute,
                  "fuse_qkv": sec, "w_bits": w_bits,
                  **({"config_weight_mp": args.config_weight_mp,
                      "config_act_mp": args.config_act_mp,
                      "act_protect": args.act_protect} if mp else {})}
        return fields, ctx, qp

    # Deploy builds are DEFERRED to the per-entry loop: each holds
    # ~2.6 GB of int8 params on device, and building all four matrix
    # entries up front + the 5 GB fp params exhausted HBM before the
    # shared FP pass even ran (bench_logs/r5_eval_matrix.err:
    # RESOURCE_EXHAUSTED at the first key split).
    def build_entry(entry):
        if args.matrix:
            fields, ctx, qp = make_deploy(entry)
            return fields, ctx, qp
        ctx = build_quant_ctx(cfg, pipe, params, qparams, args)
        q_params = params
        fields = {"backend": args.backend}
        if args.backend == "int8":
            from mixdq_tpu.quant.deploy import (deploy_unet_ctx,
                                                prune_deployed_kernels)
            wq, aq, _ = specs_from_config(cfg)
            ctx = deploy_unet_ctx(pipe.unet, {"params": params["unet"]},
                                  qparams, ctx.ctrl, wq, aq,
                                  splits=pipe.splits, fuse_qkv=args.fuse_qkv)
            # plain 'int8' (einsum deploy) unless opted into the Pallas
            # serving path — keeps --backend int8 reproducing the round-2
            # quality line (ADVICE r4: the family-default indirection
            # silently switched the control eval to int8_sec)
            dc = args.deploy_compute or "int8"
            ctx = ctx.replace(deploy_compute=dc,
                              attn_impl="auto" if dc == "int8_sec"
                              else "einsum")
            q_params = {**params, "unet": prune_deployed_kernels(
                params["unet"], ctx.deploy)}
            fields.update(deploy_compute=dc, fuse_qkv=args.fuse_qkv)
        return fields, ctx, q_params

    entry_names = ([e.strip() for e in args.matrix.split(",") if e.strip()]
                   if args.matrix else [args.backend])

    feat_fns = {}
    if args.clip_vision_ckpt:
        feat_fns["clip"] = _load_clip_vision(args.clip_vision_ckpt)
    if args.inception_ckpt:
        feat_fns["inception"] = _load_inception(args.inception_ckpt)

    prompts = load_prompts(None, args.n_prompts)
    inf = cfg.inference
    run_kw = dict(num_inference_steps=inf.get("num_steps"),
                  guidance_scale=inf.get("guidance_scale"),
                  height=inf.get("height"), width=inf.get("width"))

    # ONE shared FP pass (images + latents per batch)
    fp_batches = []
    key = jax.random.PRNGKey(args.seed)
    for i in range(0, len(prompts), args.batch_size):
        batch = prompts[i : i + args.batch_size]
        key, k = jax.random.split(key)
        fp = pipe(params, batch, k, **run_kw)
        fp_batches.append((batch, k, jnp.asarray(fp.images), fp.latents))
    print(f"FP reference: {len(prompts)} images", file=sys.stderr)

    for name in entry_names:
        fields, ctx, q_params = build_entry(name)
        ssims, mses, latent_sqnrs = [], [], []
        fp_feats, q_feats = [], []
        for batch, k, fpi, fp_lat in fp_batches:
            q = pipe(q_params, batch, k, **run_kw, ctx=ctx)
            qi = jnp.asarray(q.images)
            win = min(255, fpi.shape[1] - 1)
            win -= (win + 1) % 2
            for b in range(len(batch)):
                ssims.append(float(ssim(fpi[b], qi[b], win_size=win)))
            mses.append(float(pixel_mse(fpi, qi)))
            latent_sqnrs.append(float(sqnr(fp_lat, q.latents)))
            for kind, fn in feat_fns.items():
                fp_feats.append((kind, np.asarray(fn(fpi))))
                q_feats.append((kind, np.asarray(fn(qi))))

        report = {
            **fields,
            "n_prompts": len(prompts),
            "ssim_mean": float(np.mean(ssims)),
            "pixel_mse_mean": float(np.mean(mses)),
            "latent_sqnr_db_mean": float(np.mean(latent_sqnrs)),
        }
        for kind in feat_fns:
            from mixdq_tpu.utils.fid import fid_from_features

            fa = np.concatenate([f for kk, f in fp_feats if kk == kind])
            qa = np.concatenate([f for kk, f in q_feats if kk == kind])
            # FID between the FP and quantized image distributions (the
            # quant-quality delta; 'inception' = true FID features,
            # 'clip' = CLIP-FID), plus mean embedding cosine similarity
            report[f"{kind}_fid"] = float(fid_from_features(
                jnp.asarray(fa), jnp.asarray(qa)))
            if kind == "clip":
                cos = np.sum(
                    fa / np.linalg.norm(fa, axis=-1, keepdims=True)
                    * qa / np.linalg.norm(qa, axis=-1, keepdims=True),
                    axis=-1)
                report["clip_cosine_mean"] = float(np.mean(cos))
        print(f"== {name} ==")
        print(yaml.safe_dump(report, sort_keys=False).strip())
        out = (args.out if (args.out and not args.matrix)
               else os.path.join(args.base_path, f"eval_{name}.yaml"))
        with open(out, "w") as f:
            yaml.safe_dump(report, f, sort_keys=False)
        print(f"wrote {out}", flush=True)
        # free this entry's device-resident int8 deploy params before
        # the next one builds (HBM holds fp params + ONE deploy at a time)
        del fields, ctx, q_params


if __name__ == "__main__":
    main()
