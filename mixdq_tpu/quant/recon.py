"""PTQ reconstruction: gradient-based quant-parameter optimization.

The reference implements AdaRound/LSQ-style reconstruction as a greedy
per-layer/per-block loop with forward-hook data caching and
StopForwardException graph truncation (qdiff/optimization/
{layer,block,model}_recon.py, utils.py:29-380), optimizing each wrapped
module's ``delta``/``alpha`` with Adam against cached FP outputs.

The TPU-native redesign keeps the objective but drops the hook machinery:
the model is functional, so *all* layers' quant parameters are optimized
jointly in one jitted training step whose loss is

    sum_l ||quant_intermediate_l - fp_intermediate_l||^2   (granularity
    'layer' = QDense/QConv outputs — the reference's layer_reconstruction;
    'block' = Resnet/Transformer block outputs — block_reconstruction;
    'model' = final UNet output only — an end-to-end upgrade)

plus the AdaRound rounding regularizer with linear temperature decay
b: 10 -> 2 (reference LossFunction/LinearTempDecay, utils.py:482-592)
when ``adaround=True``. FP targets come from one FP forward per batch
with ``capture_intermediates`` — no hooks, no truncation, and every step
is a single XLA program that shards over a (dp, tp) mesh.

Trainables:
* per-layer continuous ``w_delta`` at the active bit index (LSQ-style
  scale learning through the round STE), and
* optional AdaRound ``alpha`` per weight element (rounding offsets,
  base_quantizer.py:74-84,218-227).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .core import QuantSpec, EPS
from .state import LayerQParams, QuantCtx, make_ctrl, quantizable_layers

logger = logging.getLogger(__name__)

GAMMA, ZETA = -0.1, 1.1  # AdaRound stretch constants (base_quantizer.py:59)


def rect_sigmoid(alpha):
    """h(alpha) = clip(sigmoid(alpha)(zeta-gamma)+gamma, 0, 1)
    (base_quantizer.py:77)."""
    return jnp.clip(jax.nn.sigmoid(alpha) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def init_alpha(w, delta):
    """alpha s.t. sigmoid(alpha) == the fractional rest of w/delta
    (base_quantizer.py:218-227)."""
    rest = w / delta - jnp.floor(w / delta)
    rest = jnp.clip(rest, 1e-4, 1.0 - 1e-4)
    return -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1.0)


def round_reg(alphas, b):
    """Rounding regularizer sum(1 - |2h-1|^b) (utils.py LossFunction)."""
    total = 0.0
    for a in jax.tree_util.tree_leaves(alphas):
        h = rect_sigmoid(a)
        total = total + jnp.sum(1.0 - jnp.abs(2.0 * h - 1.0) ** b)
    return total


def temp_decay(step, iters, b_start=10.0, b_end=2.0, warmup=0.2):
    """LinearTempDecay (utils.py:482-500)."""
    start = warmup * iters
    t = jnp.clip((step - start) / (iters - start), 0.0, 1.0)
    return jnp.where(step < start, b_start, b_end + (b_start - b_end) * (1.0 - t))


def _intermediate_filter(granularity: str):
    if granularity == "layer":
        keep = ("QDense", "QConv")
    elif granularity == "block":
        keep = ("ResnetBlock2D", "Transformer2DModel")
    else:
        return None

    def f(mdl, method_name):
        return type(mdl).__name__ in keep

    return f


def reconstruct(
    model: nn.Module,
    variables: Dict[str, Any],
    qparams: Dict[str, LayerQParams],
    batches,
    wq: QuantSpec,
    aq: QuantSpec,
    mode: str = "layer",  # 'layer' | 'block' | 'model'
    iters: int = 200,
    lr: float = 1e-3,
    adaround: bool = False,
    reg_weight: float = 0.01,
    bit_idx: Optional[int] = None,
    outdir: Optional[str] = None,
    return_alphas: bool = False,
) -> Dict[str, LayerQParams]:
    """Optimize w_delta (and optionally AdaRound alphas) and return updated
    qparams. ``batches``: list of model arg tuples.

    With ``return_alphas=True`` returns ``(qparams, alphas)`` where
    ``alphas`` maps layer name -> learned rounding offsets; feed them to
    ``QuantCtx(alphas=...)`` for hard-rounded fake-quant inference or to
    ``build_deploy_params(alphas=...)`` to fold the learned rounding into
    the deployed int8 codes (the reference never deploys AdaRound —
    kernels/convert_ckpt.py keeps only delta/zp)."""
    if bit_idx is None:
        bit_idx = wq.bit_index(wq.n_bits)
    names = sorted(qparams.keys())
    layer_paths = quantizable_layers(variables["params"])

    # trainables: continuous delta at the active bit (log-param for
    # positivity), plus optional per-element alphas
    train: Dict[str, Dict[str, jnp.ndarray]] = {}
    for n in names:
        qp = qparams[n]
        if qp.w_delta is None:
            continue
        entry = {"log_delta": jnp.log(jnp.maximum(qp.w_delta[bit_idx], EPS))}
        if adaround and n in layer_paths:
            node = variables["params"]
            for p in layer_paths[n]:
                node = node[p]
            w = node["kernel"]
            d = qp.w_delta[bit_idx]
            dshape = [1] * w.ndim
            dshape[-1] = w.shape[-1] if d.ndim > 0 else 1
            entry["alpha"] = init_alpha(w, d.reshape(dshape))
        train[n] = entry

    ctrl = {n: make_ctrl(w_bits=wq.candidate_bits[bit_idx],
                         a_bits=aq.n_bits, candidate_bits=wq.candidate_bits)
            for n in names}
    filt = _intermediate_filter(mode)

    def apply_qparams(train_p):
        qp2 = dict(qparams)
        for n, entry in train_p.items():
            delta = jnp.exp(entry["log_delta"])
            wd = qp2[n].w_delta.at[bit_idx].set(delta)
            qp2[n] = qp2[n].replace(w_delta=wd)
        return qp2

    def fwd(variables_, ctx, *args):
        if filt is None:
            return model.apply(variables_, *args, ctx), ()
        out, st = model.apply(variables_, *args, ctx,
                              capture_intermediates=filt,
                              mutable=["intermediates"])
        return out, jax.tree_util.tree_leaves(st["intermediates"])

    def loss_fn(train_p, batch, fp_out, fp_inter, step):
        # soft AdaRound forward: the reconstruction loss sees
        # floor(w/delta)+h(alpha), so alphas get loss gradients (the
        # reference's learned_hard_sigmoid training mode,
        # base_quantizer.py:74-84) — not just the regularizer
        alphas = ({n: e["alpha"] for n, e in train_p.items() if "alpha" in e}
                  if adaround else None)
        ctx = QuantCtx(qparams=apply_qparams(train_p), ctrl=ctrl,
                       mode="fake", wq=wq, aq=aq,
                       alphas=alphas or None, soft_round=True)
        out, inter = fwd(variables, ctx, *batch)
        loss = jnp.mean((out - fp_out) ** 2)
        for a, b in zip(inter, fp_inter):
            loss = loss + jnp.mean((a - b) ** 2)
        if adaround:
            alphas = {n: e["alpha"] for n, e in train_p.items() if "alpha" in e}
            b = temp_decay(step, iters)
            loss = loss + reg_weight * round_reg(alphas, b)
        return loss

    opt = optax.adam(lr)
    opt_state = opt.init(train)

    @jax.jit
    def fp_fwd(*batch):
        return fwd(variables, QuantCtx(), *batch)

    @jax.jit
    def train_step(train_p, opt_state, batch, fp_out, fp_inter, step):
        loss, grads = jax.value_and_grad(loss_fn)(
            train_p, batch, fp_out, fp_inter, step)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(train_p, updates), opt_state, loss

    fp_cache = [fp_fwd(*b) for b in batches]
    for step in range(iters):
        bi = step % len(batches)
        fp_out, fp_inter = fp_cache[bi]
        train, opt_state, loss = train_step(
            train, opt_state, batches[bi], fp_out, fp_inter,
            jnp.asarray(step, jnp.float32))
        if step % 50 == 0:
            logger.info("recon step %d loss %.6f", step, float(loss))

    qparams = apply_qparams(train)
    if return_alphas:
        alphas = {n: e["alpha"] for n, e in train.items() if "alpha" in e}
        return qparams, alphas
    return qparams
