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
                    help="int8 backend compute mode (e.g. int8_sec to "
                         "evaluate the shipped Pallas serving path; "
                         "default = the family's serving default)")
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

    ctx = build_quant_ctx(cfg, pipe, params, qparams, args)
    q_params = params
    if args.backend == "int8":
        from mixdq_tpu.quant.deploy import (deploy_unet_ctx,
                                            prune_deployed_kernels)
        wq, aq, _ = specs_from_config(cfg)
        ctx = deploy_unet_ctx(pipe.unet, {"params": params["unet"]}, qparams,
                              ctx.ctrl, wq, aq, splits=pipe.splits,
                              fuse_qkv=args.fuse_qkv)
        dc = args.deploy_compute or pipe.family.default_deploy_compute
        ctx = ctx.replace(deploy_compute=dc,
                          attn_impl="auto" if dc == "int8_sec" else "einsum")
        q_params = {**params, "unet": prune_deployed_kernels(
            params["unet"], ctx.deploy)}

    feat_fns = {}
    if args.clip_vision_ckpt:
        feat_fns["clip"] = _load_clip_vision(args.clip_vision_ckpt)
    if args.inception_ckpt:
        feat_fns["inception"] = _load_inception(args.inception_ckpt)

    prompts = load_prompts(None, args.n_prompts)
    inf = cfg.inference
    key = jax.random.PRNGKey(args.seed)
    ssims, mses, latent_sqnrs = [], [], []
    fp_feats, q_feats = [], []
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
        for kind, fn in feat_fns.items():
            fp_feats.append((kind, np.asarray(fn(fpi))))
            q_feats.append((kind, np.asarray(fn(qi))))

    report = {
        "backend": args.backend,
        **({"deploy_compute": ctx.deploy_compute,
            "fuse_qkv": args.fuse_qkv} if args.backend == "int8" else {}),
        "n_prompts": len(prompts),
        "ssim_mean": float(np.mean(ssims)),
        "pixel_mse_mean": float(np.mean(mses)),
        "latent_sqnr_db_mean": float(np.mean(latent_sqnrs)),
    }
    for kind in feat_fns:
        from mixdq_tpu.utils.fid import fid_from_features

        fa = np.concatenate([f for k, f in fp_feats if k == kind])
        qa = np.concatenate([f for k, f in q_feats if k == kind])
        # FID between the FP and quantized image distributions (the
        # quant-quality delta; 'inception' = true FID features, 'clip' =
        # CLIP-FID), plus for CLIP the mean embedding cosine similarity
        report[f"{kind}_fid"] = float(fid_from_features(
            jnp.asarray(fa), jnp.asarray(qa)))
        if kind == "clip":
            cos = np.sum(
                fa / np.linalg.norm(fa, axis=-1, keepdims=True)
                * qa / np.linalg.norm(qa, axis=-1, keepdims=True), axis=-1)
            report["clip_cosine_mean"] = float(np.mean(cos))
    print(yaml.safe_dump(report, sort_keys=False).strip())
    out = args.out or os.path.join(args.base_path,
                                   f"eval_{args.backend}.yaml")
    with open(out, "w") as f:
        yaml.safe_dump(report, f, sort_keys=False)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
