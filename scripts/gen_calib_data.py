#!/usr/bin/env python
"""Generate calibration data: run the FP pipeline over calibration prompts
and record per-timestep UNet inputs/outputs + conditioning.

TPU-native counterpart of scripts/gen_calib_data.py:12-133 in the
reference — the trajectory recording that required forked diffusers
pipelines there (pipeline_stable_diffusion_xl.py:451-472) is just the
scan-captured outputs of our functional sampler.

Saved npz keys (analogous to the reference's save_data dict,
gen_calib_data.py:84-130): ``xs [S,N,h,w,4]``, ``ts [S]``,
``outputs [S,N,h,w,4]``, ``text_embs [N,77,D]``, and for SDXL
``text_embeds [N,P]`` / ``time_ids [N,6]``.

Usage: python scripts/gen_calib_data.py --config configs/sdxl_turbo.yaml
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from mixdq_tpu.pipelines.loader import build_pipeline
from mixdq_tpu.utils.config import load_config
from mixdq_tpu.utils.logging_utils import setup_experiment
from mixdq_tpu.utils.prompts import load_prompts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    cfg = load_config(args.config)
    cd = cfg.calib_data
    out_path = cd.path
    setup_experiment(os.path.dirname(out_path) or ".", args.config)

    pipe, params = build_pipeline(cfg)
    prompts = load_prompts(cd.get("prompts_file"), cd.n_samples)
    bs = cd.batch_size
    key = jax.random.PRNGKey(args.seed)

    xs, outputs, text_embs, text_embeds, time_ids = [], [], [], [], []
    ts = None
    for i in range(0, len(prompts), bs):
        batch = prompts[i : i + bs]
        key, k = jax.random.split(key)
        out = pipe(params, batch, k, num_inference_steps=cd.n_steps,
                   capture_trajectory=True, decode=False,
                   height=cfg.inference.get("height"),
                   width=cfg.inference.get("width"))
        xs.append(np.asarray(out.trajectory, np.float32))
        outputs.append(np.asarray(out.unet_outputs, np.float32))
        text_embs.append(np.asarray(out.text_emb, np.float32))
        ts = np.asarray(out.timesteps, np.float32)
        if out.added_conds is not None:
            text_embeds.append(np.asarray(out.added_conds["text_embeds"], np.float32))
            time_ids.append(np.asarray(out.added_conds["time_ids"], np.float32))
        print(f"collected {min(i + bs, len(prompts))}/{len(prompts)}")

    data = {
        "xs": np.concatenate(xs, axis=1),  # [S, N, h, w, 4]
        "ts": ts,
        "outputs": np.concatenate(outputs, axis=1),
        "text_embs": np.concatenate(text_embs, axis=0),
    }
    if text_embeds:
        data["text_embeds"] = np.concatenate(text_embeds, axis=0)
        data["time_ids"] = np.concatenate(time_ids, axis=0)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **data)
    print(f"saved calib data to {out_path}: "
          + ", ".join(f"{k}{v.shape}" for k, v in data.items()))


if __name__ == "__main__":
    main()
