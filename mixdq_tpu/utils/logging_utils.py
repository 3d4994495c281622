"""Experiment logging: dual file+stream handlers and config snapshots per
experiment dir (the reference's per-script pattern, scripts/ptq.py:57-71 —
including the config copy; we skip its full source-tree snapshot in favor
of recording the git revision)."""

from __future__ import annotations

import logging
import os
import subprocess
import sys
from typing import Optional


def setup_experiment(outdir: str, config_path: Optional[str] = None) -> None:
    os.makedirs(outdir, exist_ok=True)
    handlers = [
        logging.FileHandler(os.path.join(outdir, "run.log")),
        logging.StreamHandler(sys.stdout),
    ]
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        handlers=handlers, force=True)
    if config_path and os.path.exists(config_path):
        import shutil
        dst = os.path.join(outdir, "config.yaml")
        # re-running against an experiment dir passes the snapshot itself
        if os.path.abspath(config_path) != os.path.abspath(dst):
            shutil.copy(config_path, dst)
    try:
        rev = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                             text=True, timeout=5).stdout.strip()
        with open(os.path.join(outdir, "GIT_REVISION"), "w") as f:
            f.write(rev + "\n")
    except Exception:
        pass
