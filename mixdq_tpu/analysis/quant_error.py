"""Offline quantization-error analysis tools.

Counterpart of the reference's analysis_tools/error_func/quant_error.py
(:29-641): three analysis targets over a calibrated model —

* ``unet_output_error``  — per-layer (or per-block-prefix) SQNR+MSE of
  the UNet output with only that layer/block quantized
  (quant_error.py ``--analysis_target quant_error_unet_output``);
* ``weight_error``       — direct per-layer weight fake-quant SQNR/MSE
  per candidate bit (``quant_error_weight``);
* ``act_error``          — per-layer activation fake-quant SQNR/MSE over
  captured calibration activations (``quant_error_act``);

plus ``tensor_stats`` (kurtosis/min/max/std — the distribution notebooks'
numbers, analysis_tools/distribution/). Results are plain dicts; the CLI
writes them as the reference's ``sensitivity.yaml`` shape.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from ..quant.core import QuantSpec, fake_quant
from ..quant.state import (QuantCtx, get_layer_kernel, group_ctrl,
                           quantizable_layers)
from ..utils.metrics import mse, sqnr

logger = logging.getLogger(__name__)


def unet_output_error(
    model, variables, qparams, targets: Sequence[str],
    all_names: Sequence[str], calib_batch, fp_out, wq, aq,
    which: str = "weight", bits: Sequence[int] = (2, 4, 8),
) -> Dict[str, Dict[str, List[float]]]:
    """targets may be layer names or block prefixes."""

    @jax.jit
    def run(ctrl, *batch):
        ctx = QuantCtx(qparams=qparams, ctrl=ctrl, mode="fake", wq=wq, aq=aq)
        out = model.apply(variables, *batch, ctx)
        return sqnr(fp_out, out), mse(fp_out, out)

    res: Dict[str, Dict[str, List[float]]] = {}
    for t in targets:
        sq, ms = [], []
        for b in bits:
            ctrl = group_ctrl(all_names, [t], which, b, wq.candidate_bits)
            s, m = run(ctrl, *calib_batch)
            sq.append(float(s))
            ms.append(float(m))
        res[t] = {"sqnr": sq, "mse": ms}
    return res


def weight_error(
    params, qparams, names: Sequence[str], wq: QuantSpec,
    bits: Sequence[int] = (2, 4, 8),
) -> Dict[str, Dict[str, List[float]]]:
    layers = quantizable_layers(params)
    cb = list(wq.candidate_bits)
    res = {}
    for n in names:
        if n not in layers or qparams.get(n) is None:
            continue
        w = get_layer_kernel(params, layers[n])
        qp = qparams[n]
        sq, ms = [], []
        for b in bits:
            bi = cb.index(b)
            d = qp.w_delta[bi]
            shape = [1] * w.ndim
            shape[-1] = w.shape[-1] if d.ndim > 0 else 1
            wq_t = fake_quant(w, d.reshape(shape),
                              qp.w_zp[bi].reshape(shape), b, sym=wq.sym)
            sq.append(float(sqnr(w, wq_t)))
            ms.append(float(mse(w, wq_t)))
        res[n] = {"sqnr": sq, "mse": ms}
    return res


def act_error(
    model, variables, qparams, names: Sequence[str], calib_batch,
    aq: QuantSpec, bits: Sequence[int] = (2, 4, 8),
) -> Dict[str, Dict[str, List[float]]]:
    """Capture per-layer input activations, then measure fake-quant error
    per bit (quant_error.py act path)."""
    _, st = model.apply(variables, *calib_batch,
                        QuantCtx(capture_acts=True),
                        mutable=["act_capture"])
    captured = _flatten(st["act_capture"])
    cb = list(aq.candidate_bits)
    res = {}
    for n in names:
        if n not in captured or qparams.get(n) is None:
            continue
        x = captured[n]
        qp = qparams[n]
        if qp.a_delta is None:
            continue
        sq, ms = [], []
        for b in bits:
            bi = cb.index(b)
            xq = fake_quant(x, qp.a_delta[bi], qp.a_zp[bi], b, sym=aq.sym)
            sq.append(float(sqnr(x, xq)))
            ms.append(float(mse(x, xq)))
        res[n] = {"sqnr": sq, "mse": ms}
    return res


def tensor_stats(x: jnp.ndarray) -> Dict[str, float]:
    """min/max/std/kurtosis (the distribution analysis numbers)."""
    xf = x.astype(jnp.float32).reshape(-1)
    mu = jnp.mean(xf)
    var = jnp.var(xf)
    kurt = jnp.mean((xf - mu) ** 4) / (var**2 + 1e-12) - 3.0
    return {"min": float(jnp.min(xf)), "max": float(jnp.max(xf)),
            "std": float(jnp.sqrt(var)), "kurtosis": float(kurt)}


def weight_stats(params, names: Sequence[str]) -> Dict[str, Dict[str, float]]:
    layers = quantizable_layers(params)
    return {n: tensor_stats(get_layer_kernel(params, layers[n]))
            for n in names if n in layers}


def _flatten(tree, out=None):
    out = {} if out is None else out
    for k, v in tree.items():
        if isinstance(v, dict):
            _flatten(v, out)
        else:
            # sow default reduce: tuple of values; take the first capture
            out[k] = v[0] if isinstance(v, tuple) else v
    return out
