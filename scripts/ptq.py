#!/usr/bin/env python
"""Post-training quantization: fit multi-bit quant parameters from
calibration data and save the quant checkpoint.

TPU-native counterpart of scripts/ptq.py:23-241 in the reference. The
two lazy init passes there (weight pass :126-135, activation running-stat
loop :137-155) become one direct jitted weight fit plus a jitted
stats-collection forward scanned over calibration batches
(mixdq_tpu/quant/calibrate.py).

Usage:
  python scripts/ptq.py --config configs/sdxl_turbo.yaml --outdir logs/x
Optional AdaRound-style reconstruction: --recon layer|block (the
reference's qdiff/optimization, disabled in its shipped configs).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from mixdq_tpu.pipelines.loader import build_pipeline, specs_from_config
from mixdq_tpu.quant import calibrate as cal
from mixdq_tpu.quant.checkpoint import save_qparams
from mixdq_tpu.quant.state import quantizable_layers
from mixdq_tpu.utils.config import load_config
from mixdq_tpu.utils.logging_utils import setup_experiment


def calib_batches_from_npz(data, batch_size, rng=None):
    """Yield (sample, t, ehs, added) tuples: every (timestep, chunk) pair,
    the reference's per-timestep calib slicing (qdiff/utils.py:384-412)."""
    S, N = data["xs"].shape[:2]
    has_added = "text_embeds" in data
    order = np.arange(N)
    if rng is not None:
        rng.shuffle(order)
    for s in range(S):
        for i in range(0, N, batch_size):
            idx = order[i : i + batch_size]
            added = None
            if has_added:
                added = {"text_embeds": jnp.asarray(data["text_embeds"][idx]),
                         "time_ids": jnp.asarray(data["time_ids"][idx])}
            yield (jnp.asarray(data["xs"][s, idx]),
                   jnp.asarray(data["ts"][s]),
                   jnp.asarray(data["text_embs"][idx]),
                   added)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--recon", choices=["layer", "block", "model"],
                    default=None,
                    help="optional AdaRound-style reconstruction")
    ap.add_argument("--recon_iters", type=int, default=200)
    ap.add_argument("--adaround", action="store_true",
                    help="learn per-element AdaRound rounding offsets "
                         "during --recon; saved to alphas.msgpack and "
                         "foldable into deployed int codes")
    args = ap.parse_args()

    cfg = load_config(args.config)
    setup_experiment(args.outdir, args.config)

    pipe, params = build_pipeline(cfg)
    wq, aq, softmax_aq = specs_from_config(cfg)

    data = np.load(cfg.calib_data.path)
    names = quantizable_layers(params["unet"])
    splits = {k: v for k, v in pipe.splits.items() if k in names}

    batches = list(calib_batches_from_npz(
        data, cfg.calib_data.batch_size, np.random.RandomState(0)))
    print(f"calibrating over {len(batches)} batches, {len(names)} layers")

    qparams = cal.calibrate(
        pipe.unet, {"params": params["unet"]}, batches, wq, aq,
        softmax_aq=softmax_aq, splits=splits)

    if args.recon:
        from mixdq_tpu.quant.recon import reconstruct
        out = reconstruct(
            pipe.unet, {"params": params["unet"]}, qparams, batches,
            wq, aq, mode=args.recon, iters=args.recon_iters,
            outdir=args.outdir, adaround=args.adaround,
            return_alphas=args.adaround)
        if args.adaround:
            qparams, alphas = out
            from flax import serialization
            with open(os.path.join(args.outdir, "alphas.msgpack"), "wb") as f:
                f.write(serialization.msgpack_serialize(
                    {k: np.asarray(v) for k, v in alphas.items()}))
        else:
            qparams = out

    ckpt = os.path.join(args.outdir, "qparams.msgpack")
    save_qparams(qparams, ckpt)
    print(f"saved quant checkpoint to {ckpt}")


if __name__ == "__main__":
    main()
