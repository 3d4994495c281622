#!/usr/bin/env python
"""Checkpoint conversion CLI: bring reference/HF artifacts into the TPU
framework.

Modes:
  --mode qparams    reference PTQ ckpt.pth -> qparams.msgpack
                    (counterpart of kernels/convert_ckpt.py:17-46, except
                    one format serves both simulation and deployment here)
  --mode unet|clip|vae
                    HF torch state dict (.bin/.safetensors) -> flax
                    msgpack params fragment

Examples:
  python scripts/convert_checkpoints.py --mode qparams \
      --input ckpt.pth --output logs/x/qparams.msgpack
  python scripts/convert_checkpoints.py --mode unet \
      --input unet/diffusion_pytorch_model.safetensors --output unet.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mixdq_tpu.utils import torch_convert


def load_torch_file(path):
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


def to_numpy_sd(obj):
    import torch

    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: (v.float().numpy() if isinstance(v, torch.Tensor) else v)
            for k, v in obj.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["qparams", "unet", "clip", "vae"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    obj = load_torch_file(args.input)

    if args.mode == "qparams":
        import torch

        ckpt = {}
        for name, entry in obj.items():
            bufs = entry[0] if isinstance(entry, (list, tuple)) else entry
            ckpt[name] = [
                {k: v.float().numpy() if isinstance(v, torch.Tensor) else v
                 for k, v in dict(bufs).items()},
                {},
            ]
        qparams = torch_convert.convert_reference_qparams(ckpt)
        from mixdq_tpu.quant.checkpoint import save_qparams

        save_qparams(qparams, args.output)
        print(f"converted {len(qparams)} layers -> {args.output}")
        return

    sd = obj if isinstance(next(iter(obj.values())), np.ndarray) \
        else to_numpy_sd(obj)
    conv = {"unet": torch_convert.convert_unet_state_dict,
            "clip": torch_convert.convert_clip_state_dict,
            "vae": torch_convert.convert_vae_state_dict}[args.mode]
    params = conv(sd)

    from mixdq_tpu.quant.checkpoint import save_params

    save_params(params, args.output)
    n = len([1 for _ in _leaves(params)])
    print(f"converted {n} tensors -> {args.output}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
