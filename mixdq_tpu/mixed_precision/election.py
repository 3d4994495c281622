"""Candidate election: pick the mixed-precision config whose generated
image is closest (pixel MSE) to the FP reference.

Reference: mixed_precision_scripts/quant_inference_mp.py:211-270 — one
image per candidate weight config, elect min-MSE as final_weight_mp; then
with the winning weight config fixed, elect the act config the same way.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..quant.state import QuantCtx, apply_bitwidth_config, uniform_ctrl
from ..utils.metrics import pixel_mse

logger = logging.getLogger(__name__)


def elect(
    pipe,
    params,
    qparams,
    all_names: Sequence[str],
    candidates: Sequence[Dict[str, int]],
    which: str,
    prompts: Sequence[str],
    key: jax.Array,
    wq,
    aq,
    base_ctrl=None,
    num_steps: Optional[int] = None,
) -> Tuple[Dict[str, int], int, List[float]]:
    """Generate images per candidate config, return (winner, index, mses).
    ``base_ctrl`` carries the already-fixed other-tensor config (e.g. the
    elected weight config when electing acts)."""
    fp = pipe(params, prompts, key, num_inference_steps=num_steps)
    fp_imgs = jnp.asarray(fp.images)

    mses = []
    for ci, cand in enumerate(candidates):
        ctrl = dict(base_ctrl) if base_ctrl is not None else uniform_ctrl(
            all_names, candidate_bits=wq.candidate_bits)
        ctrl = apply_bitwidth_config(ctrl, cand, which, wq.candidate_bits)
        ctx = QuantCtx(qparams=qparams, ctrl=ctrl, mode="fake", wq=wq, aq=aq)
        out = pipe(params, prompts, key, num_inference_steps=num_steps, ctx=ctx)
        m = float(pixel_mse(jnp.asarray(out.images), fp_imgs))
        mses.append(m)
        logger.info("candidate %d/%d pixel-MSE %.6f", ci + 1,
                    len(candidates), m)
    best = int(jnp.argmin(jnp.asarray(mses)))
    return candidates[best], best, mses
