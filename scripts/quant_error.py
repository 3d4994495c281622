#!/usr/bin/env python
"""Quantization-error analysis CLI (counterpart of
analysis_tools/error_func/quant_error.py:396-641 and the model_arch
tools).

Targets:
  unet_output  per-layer/block SQNR+MSE of the UNet output (one target
               quantized at a time)
  weight       direct weight fake-quant error per bit
  act          activation fake-quant error over captured calib acts
  arch         dump quantizable-layer structure to txt

Usage:
  python scripts/quant_error.py --base_path logs/x --target weight \
      [--layers l1 l2 | --limit 16] [--which weight|act] [--out out.yaml]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np
import yaml

from mixdq_tpu.analysis import model_arch, quant_error
from mixdq_tpu.pipelines.loader import build_pipeline, specs_from_config
from mixdq_tpu.quant.checkpoint import load_qparams
from mixdq_tpu.quant.state import quantizable_layers
from mixdq_tpu.utils.config import load_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_path", required=True)
    ap.add_argument("--target", required=True,
                    choices=["unet_output", "weight", "act", "arch"])
    ap.add_argument("--which", default="weight", choices=["weight", "act"])
    ap.add_argument("--layers", nargs="*", default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = load_config(os.path.join(args.base_path, "config.yaml"))
    pipe, params = build_pipeline(cfg)
    wq, aq, _ = specs_from_config(cfg)
    names = sorted(quantizable_layers(params["unet"]))
    targets = args.layers or names
    if args.limit:
        targets = targets[: args.limit]
    variables = {"params": params["unet"]}

    if args.target == "arch":
        text = model_arch.dump_structure(params["unet"])
        out = args.out or os.path.join(args.base_path, "model_structure.txt")
        with open(out, "w") as f:
            f.write(text)
        print(f"wrote {out} ({len(text.splitlines())} layers)")
        return

    qparams = load_qparams(os.path.join(args.base_path, "qparams.msgpack"))

    if args.target == "weight":
        res = quant_error.weight_error(params["unet"], qparams, targets, wq)
    else:
        data = np.load(cfg.calib_data.path)
        cb = min(8, data["xs"].shape[1])
        batch = (jnp.asarray(data["xs"][0, :cb]),
                 jnp.asarray(data["ts"][0]),
                 jnp.asarray(data["text_embs"][:cb]),
                 ({"text_embeds": jnp.asarray(data["text_embeds"][:cb]),
                   "time_ids": jnp.asarray(data["time_ids"][:cb])}
                  if "text_embeds" in data else None))
        if args.target == "act":
            res = quant_error.act_error(pipe.unet, variables, qparams,
                                        targets, batch, aq)
        else:
            fp_out = jnp.asarray(data["outputs"][0, :cb])
            res = quant_error.unet_output_error(
                pipe.unet, variables, qparams, targets, names, batch,
                fp_out, wq, aq, which=args.which)

    out = args.out or os.path.join(args.base_path,
                                   f"quant_error_{args.target}.yaml")
    with open(out, "w") as f:
        yaml.safe_dump(res, f)
    print(f"wrote {out} ({len(res)} entries)")


if __name__ == "__main__":
    main()
