"""Quantization-aware training step (extension beyond the reference's PTQ
scope): jointly optimizes model weights and quant scales through the
fake-quant STE. This is also the framework's canonical *sharded training
step* — batch over 'dp', weights column-parallel over 'tp' (see
mixdq_tpu/parallel/mesh.py) — used by the multi-chip dryrun."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from .core import QuantSpec
from .state import QuantCtx


def make_qat_train_step(model, wq: QuantSpec, aq: QuantSpec,
                        ctrl: Dict[str, Any], lr: float = 1e-4):
    """Returns (init_fn, step_fn):

    init_fn(params, qparams) -> opt_state
    step_fn(params, qparams, opt_state, batch_args, target)
        -> (params, qparams, opt_state, loss)

    Both model params and the continuous quant deltas receive gradients
    through round-STE fake quantization.
    """
    opt = optax.adam(lr)

    def loss_fn(trainables, batch, target):
        params, qparams = trainables
        ctx = QuantCtx(qparams=qparams, ctrl=ctrl, mode="fake", wq=wq, aq=aq)
        out = model.apply({"params": params}, *batch, ctx)
        return jnp.mean((out - target) ** 2)

    def init_fn(params, qparams):
        return opt.init((params, qparams))

    def step_fn(params, qparams, opt_state, batch, target):
        loss, grads = jax.value_and_grad(loss_fn)((params, qparams),
                                                  batch, target)
        updates, opt_state = opt.update(grads, opt_state)
        params, qparams = optax.apply_updates((params, qparams), updates)
        return params, qparams, opt_state, loss

    return init_fn, step_fn
