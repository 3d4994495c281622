#!/usr/bin/env python
"""Snapshot a HF model locally (counterpart of
scripts/utils/download_huggingface_model.py in the reference). Gated on
network/huggingface_hub availability — this build environment has no
egress, so the converter pipeline (convert_checkpoints.py) consumes
snapshots produced elsewhere.

Usage:
  python scripts/download_model.py --repo stabilityai/sdxl-turbo --out DIR
  python scripts/download_model.py --all --out DIR   # all three families
"""

import argparse
import os
import sys
import traceback

#: The reference's model families (README.md:96-118): SDXL-Turbo 1-step,
#: SDXL-base 30-step, SD1.5 + LCM-LoRA 4-step.
ALL_REPOS = (
    "stabilityai/sdxl-turbo",
    "stabilityai/stable-diffusion-xl-base-1.0",
    "runwayml/stable-diffusion-v1-5",
    "latent-consistency/lcm-lora-sdv1-5",
)


def fetch(repo: str, out: str, revision=None) -> bool:
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        print(f"FAIL {repo}: huggingface_hub not importable: {e}")
        return False
    try:
        path = snapshot_download(repo, revision=revision, local_dir=out)
    except Exception as e:
        print(f"FAIL {repo}: {type(e).__name__}: {e}")
        traceback.print_exc(limit=2)
        return False
    print(f"OK {repo}: snapshot at {path}")
    print("next: python scripts/convert_checkpoints.py --mode unet "
          f"--input {path}/unet/diffusion_pytorch_model.safetensors "
          "--output unet.msgpack   (and clip/vae similarly)")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo")
    ap.add_argument("--all", action="store_true",
                    help="attempt every reference model family")
    ap.add_argument("--out", default="snapshots")
    ap.add_argument("--revision", default=None)
    args = ap.parse_args()
    if not args.all and not args.repo:
        ap.error("need --repo or --all")

    repos = ALL_REPOS if args.all else (args.repo,)
    ok = 0
    for repo in repos:
        out = (os.path.join(args.out, repo.split("/")[-1])
               if args.all else args.out)
        ok += fetch(repo, out, args.revision)
    print(f"{ok}/{len(repos)} snapshots fetched")
    sys.exit(0 if ok == len(repos) else 1)


if __name__ == "__main__":
    main()
