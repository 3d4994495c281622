"""Quant-parameter checkpointing.

The reference saves ``{quantizer_module_name: [buffers, parameters]}`` via
``torch.save`` (scripts/ptq.py:236-238) and converts it for deployment
with ``kernels/convert_ckpt.py:17-46``. Here the checkpoint is the
``{layer_name: LayerQParams}`` pytree serialized with flax msgpack — one
format serves both the simulation and deployment paths, since the
multi-bit ``delta_list``/``zero_point_list`` stacks are already the
deployment content (fp16-able [n_bits, C] weights / [n_bits] acts).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import serialization

from .state import LayerQParams

_FIELDS = tuple(LayerQParams.__dataclass_fields__.keys())


def qparams_to_state_dict(qparams: Dict[str, LayerQParams]) -> Dict[str, Any]:
    out = {}
    for name, qp in qparams.items():
        out[name] = {f: np.asarray(getattr(qp, f))
                     for f in _FIELDS if getattr(qp, f) is not None}
    return out


def state_dict_to_qparams(d: Dict[str, Any]) -> Dict[str, LayerQParams]:
    out = {}
    for name, frag in d.items():
        out[name] = LayerQParams(**{f: jnp.asarray(v) for f, v in frag.items()})
    return out


def save_qparams(qparams: Dict[str, LayerQParams], path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.msgpack_serialize(qparams_to_state_dict(qparams))
    with open(path, "wb") as f:
        f.write(data)


def load_qparams(path: str) -> Dict[str, LayerQParams]:
    with open(path, "rb") as f:
        data = serialization.msgpack_restore(f.read())
    return state_dict_to_qparams(data)


def save_params(params, path: str) -> None:
    """Serialize a model params pytree (flax msgpack)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(template, path: str):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
