#!/usr/bin/env python
"""Snapshot a HF model locally (counterpart of
scripts/utils/download_huggingface_model.py in the reference). Gated on
network/huggingface_hub availability — this build environment has no
egress, so the converter pipeline (convert_checkpoints.py) consumes
snapshots produced elsewhere.

Usage: python scripts/download_model.py --repo stabilityai/sdxl-turbo \
           --out /path/to/snapshot
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--revision", default=None)
    args = ap.parse_args()

    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        raise SystemExit("huggingface_hub not available in this environment; "
                         "run this on a machine with network access and copy "
                         "the snapshot over, then use convert_checkpoints.py")

    path = snapshot_download(args.repo, revision=args.revision,
                             local_dir=args.out)
    print(f"snapshot at {path}")
    print("next: python scripts/convert_checkpoints.py --mode unet "
          f"--input {path}/unet/diffusion_pytorch_model.safetensors "
          "--output unet.msgpack   (and clip/vae similarly)")


if __name__ == "__main__":
    main()
