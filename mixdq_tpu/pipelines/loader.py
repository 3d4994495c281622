"""Config-driven pipeline construction shared by the CLI scripts
(the role of ``get_model`` + config plumbing in the reference,
qdiff/utils.py:414-473)."""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..quant.core import QuantSpec
from ..utils.config import Config
from .txt2img import Text2ImgPipeline

logger = logging.getLogger(__name__)

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
           "float16": jnp.float16}


def specs_from_config(cfg: Config) -> Tuple[QuantSpec, QuantSpec, Optional[QuantSpec]]:
    """Build (weight, activation, softmax) QuantSpecs from the ``quant:``
    config stanza (constructor contract of base_quantizer.py:25-43)."""
    q = cfg.quant
    cb = tuple(q.get("candidate_bits", [2, 4, 8]))
    w = q.weight
    wq = QuantSpec(
        n_bits=w.get("n_bits", 8), sym=w.get("sym", True),
        channel_wise=w.get("channel_wise", True),
        scale_method=w.get("scale_method", "min_max"),
        round_mode=w.get("round_mode", "nearest"), candidate_bits=cb)
    a = q.activation
    aq = QuantSpec(
        n_bits=a.get("n_bits", 8), sym=a.get("sym", False),
        channel_wise=False,
        scale_method=a.get("scale_method", "min_max"),
        round_mode=a.get("round_mode", "nearest_ste"),
        running_stat=a.get("running_stat", True), candidate_bits=cb)
    sm = q.get("softmax")
    softmax_aq = None
    if sm is not None and sm.get("enabled", False):
        softmax_aq = QuantSpec(
            n_bits=sm.get("n_bits", 8), sym=False, channel_wise=False,
            round_mode="nearest_ste", always_zero=True, candidate_bits=cb)
    return wq, aq, softmax_aq


def build_pipeline(cfg: Config, rng: Optional[jax.Array] = None
                   ) -> Tuple[Text2ImgPipeline, Dict[str, Any]]:
    """Create pipeline + params. Loads model params from
    ``model.params_path`` (flax msgpack) when given; otherwise random-init
    (offline environment has no HF hub — random weights still exercise
    every code path and the full perf envelope)."""
    m = cfg.model
    dtype = _DTYPES[m.get("dtype", "float32")]
    pipe = Text2ImgPipeline(m.family, dtype=dtype,
                            tokenizer_path=m.get("tokenizer_path"))
    params = pipe.init_params(rng if rng is not None else jax.random.PRNGKey(0))
    path = m.get("params_path")
    if path:
        from ..quant.checkpoint import load_params
        logger.info("loading model params from %s", path)
        params = load_params(params, path)
    return pipe, params
