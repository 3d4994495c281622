#!/usr/bin/env python
"""Metric-decoupled mixed-precision search, phases 2-4.

Reference flow (mixed_precision_search.md:6-40):
  phase 2  per-layer sensitivity sweeps — SSIM for content layers
           (ff/attn2), SQNR for the rest
  phase 3  ILP bit allocation over a (target-bits x k) grid -> candidates
  phase 4  candidate election by pixel MSE vs FP images

Usage:
  python scripts/mixed_precision_search.py --base_path logs/x \
      --target_bits 5.0 [--which weight] [--n_prompts 2] [--quick]
Outputs ``{which}_mp_config.yaml`` (the final per-layer bit map, same
format the reference emits, e.g. final_config/weight/5.02.yaml).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from mixdq_tpu.mixed_precision import election, ilp, sensitivity
from mixdq_tpu.pipelines.loader import build_pipeline, specs_from_config
from mixdq_tpu.quant.checkpoint import load_qparams
from mixdq_tpu.quant.state import get_layer_kernel, quantizable_layers
from mixdq_tpu.utils.config import load_config
from mixdq_tpu.utils.logging_utils import setup_experiment
from mixdq_tpu.utils.prompts import load_prompts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_path", required=True)
    ap.add_argument("--which", choices=["weight", "act"], default="weight")
    ap.add_argument("--target_bits", type=float, default=5.0)
    ap.add_argument("--n_prompts", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--quick", action="store_true",
                    help="limit sweep to 8 layers/group (smoke test)")
    ap.add_argument("--batched", type=int, default=8, metavar="CHUNK",
                    help="vmap chunk for the SQNR sweep (0 = sequential)")
    ap.add_argument("--protect_frac", type=float, default=0.0,
                    help="for --which act: fraction of most-sensitive "
                    "layers kept FP and written to act_protect.yaml "
                    "(the reference ships a hand-picked "
                    "act_sensitivie_a8_1%% list, "
                    "integer_programming.py:292-313; here it is derived "
                    "from the measured sensitivities)")
    ap.add_argument("--artifacts_dir", default=None,
                    help="also mirror outputs reference-style under DIR/"
                    "final_config/{which}/<achieved>.yaml + sensitivity/")
    ap.add_argument("--dp_mesh", type=int, default=0, metavar="N",
                    help="shard sweep points over an N-device dp mesh "
                    "(0 = single device); requires N visible devices")
    args = ap.parse_args()

    cfg = load_config(os.path.join(args.base_path, "config.yaml"))
    setup_experiment(args.base_path)
    pipe, params = build_pipeline(cfg)
    wq, aq, softmax_aq = specs_from_config(cfg)
    qparams = load_qparams(os.path.join(args.base_path, "qparams.msgpack"))

    layers = quantizable_layers(params["unet"])
    names = sorted(layers)
    content, quality = sensitivity.split_metric_groups(names)
    if args.quick:
        content, quality = content[:8], quality[:8]

    if args.which == "weight":
        sizes = {n: int(np.prod(get_layer_kernel(params["unet"],
                                                 layers[n]).shape))
                 for n in names}
    else:
        # activation budgets weight by act tensor sizes (the reference's
        # act_ratio_config, optimize/tensor_ratio/): capture one forward
        from mixdq_tpu.analysis.quant_error import _flatten
        from mixdq_tpu.quant.state import QuantCtx

        d0 = np.load(cfg.calib_data.path)
        cap_batch = (jnp.asarray(d0["xs"][0, :1]), jnp.asarray(d0["ts"][0]),
                     jnp.asarray(d0["text_embs"][:1]),
                     ({"text_embeds": jnp.asarray(d0["text_embeds"][:1]),
                       "time_ids": jnp.asarray(d0["time_ids"][:1])}
                      if "text_embeds" in d0 else None))
        _, st = pipe.unet.apply({"params": params["unet"]}, *cap_batch,
                                QuantCtx(capture_acts=True),
                                mutable=["act_capture"])
        cap = _flatten(st["act_capture"])
        sizes = {n: int(np.prod(cap[n].shape)) for n in names if n in cap}
        for n in names:
            sizes.setdefault(n, 1)
    size_frac = ilp.tensor_size_fractions(sizes)

    # phase 2a: SQNR over quality layers (UNet on calib inputs)
    data = np.load(cfg.calib_data.path)
    cb = min(8, data["xs"].shape[1])
    calib_batch = (jnp.asarray(data["xs"][0, :cb]),
                   jnp.asarray(data["ts"][0]),
                   jnp.asarray(data["text_embs"][:cb]),
                   ({"text_embeds": jnp.asarray(data["text_embeds"][:cb]),
                     "time_ids": jnp.asarray(data["time_ids"][:cb])}
                    if "text_embeds" in data else None))
    fp_out = jnp.asarray(data["outputs"][0, :cb])
    variables = {"params": params["unet"]}
    mesh = None
    if args.dp_mesh:
        from mixdq_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.dp_mesh, tp=1)
    bits_q = (4, 8)
    if args.batched:
        sens_q = sensitivity.sweep_sqnr_batched(
            pipe.unet, variables, qparams, quality, names, calib_batch,
            fp_out, wq, aq, which=args.which, bits=bits_q,
            chunk=args.batched, mesh=mesh)
    else:
        sens_q = sensitivity.sweep_sqnr(
            pipe.unet, variables, qparams, quality, names, calib_batch,
            fp_out, wq, aq, which=args.which, bits=bits_q)

    # phase 2b: SSIM over content layers (image generation)
    prompts = load_prompts(None, args.n_prompts)
    key = jax.random.PRNGKey(args.seed)
    bits_c = tuple(wq.candidate_bits)
    if args.batched:
        sens_c = sensitivity.sweep_ssim_batched(
            pipe, params, qparams, content, names, prompts, key, wq, aq,
            which=args.which, bits=bits_c,
            num_steps=cfg.inference.get("num_steps"),
            chunk=min(args.batched, 4), mesh=mesh)
    else:
        sens_c = sensitivity.sweep_ssim(
            pipe, params, qparams, content, names, prompts, key, wq, aq,
            which=args.which, bits=bits_c,
            num_steps=cfg.inference.get("num_steps"))

    # act-protect election: the most-sensitive act layers stay FP
    # (reference hard-codes 5 SSIM + 5 SQNR layers and ships
    # act_sensitivie_a8_1%.pt; here the list is derived from the measured
    # sweeps: worst score at the largest candidate bit, per metric group)
    protected = []
    if args.protect_frac > 0 and args.which == "act":
        import math
        k_c = math.ceil(args.protect_frac * len(sens_c))
        k_q = math.ceil(args.protect_frac * len(sens_q))
        worst_c = sorted(sens_c, key=lambda n: sens_c[n][-1])[:k_c]
        worst_q = sorted(sens_q, key=lambda n: sens_q[n][-1])[:k_q]
        protected = sorted(worst_c + worst_q)
        sens_c = {n: v for n, v in sens_c.items() if n not in protected}
        sens_q = {n: v for n, v in sens_q.items() if n not in protected}
        prot_path = os.path.join(args.base_path, "act_protect.yaml")
        with open(prot_path, "w") as f:
            yaml.safe_dump(protected, f)
        print(f"protecting {len(protected)} act layers (FP): {prot_path}")

    # phase 3: ILP candidates over the k grid
    candidates = ilp.metric_decoupled_allocation(
        sens_c, sens_q, size_frac, args.target_bits,
        bits_content=bits_c, bits_quality=bits_q)
    print(f"{len(candidates)} ILP candidates")
    if not candidates:
        print("no feasible allocation; relax target_bits")
        return

    # phase 4: election by pixel MSE
    winner, idx, mses = election.elect(
        pipe, params, qparams, names, candidates, args.which, prompts, key,
        wq, aq, num_steps=cfg.inference.get("num_steps"))
    achieved = ilp.achieved_avg_bits(winner, size_frac)
    print(f"elected candidate {idx} (mse={mses[idx]:.6f}); "
          f"achieved avg bits {achieved:.3f} (target {args.target_bits})")

    out_path = os.path.join(args.base_path, f"{args.which}_mp_config.yaml")
    with open(out_path, "w") as f:
        f.write(f"# target_avg_bits: {args.target_bits}  "
                f"achieved_avg_bits: {achieved:.3f}\n")
        yaml.safe_dump({k: int(v) for k, v in winner.items()}, f)
    sens_path = os.path.join(args.base_path,
                             f"sensitivity_{args.which}.yaml")
    with open(sens_path, "w") as f:
        yaml.safe_dump({"meta": {"target_avg_bits": float(args.target_bits),
                                 "achieved_avg_bits": achieved,
                                 "elected_mse": float(mses[idx])},
                        "content": {k: [float(x) for x in v]
                                    for k, v in sens_c.items()},
                        "quality": {k: [float(x) for x in v]
                                    for k, v in sens_q.items()}}, f)
    print(f"wrote {out_path} and {sens_path}")

    if args.artifacts_dir:
        # reference-style artifact mirror (mixed_percision_config/
        # <family>/final_config/{weight,act}/<avg>.yaml + sensitivity logs)
        import shutil
        fc = os.path.join(args.artifacts_dir, "final_config", args.which)
        sl = os.path.join(args.artifacts_dir, "sensitivity_log")
        os.makedirs(fc, exist_ok=True)
        os.makedirs(sl, exist_ok=True)
        shutil.copy(out_path, os.path.join(fc, f"{achieved:.2f}.yaml"))
        shutil.copy(sens_path,
                    os.path.join(sl, f"sensitivity_{args.which}.yaml"))
        if protected:
            shutil.copy(os.path.join(args.base_path, "act_protect.yaml"),
                        os.path.join(args.artifacts_dir,
                                     "act_protect.yaml"))
        print(f"mirrored artifacts under {args.artifacts_dir}")


if __name__ == "__main__":
    main()
