"""Calibration: fit multi-bit quant parameters for a Flax model.

TPU-native redesign of the reference's two-pass lazy init
(scripts/ptq.py:126-155):

* **Weights** need no forward pass at all — qparams are a pure function of
  the params pytree (the reference runs a full UNet forward just to
  trigger ``init_quant_params`` on each weight quantizer,
  ptq.py:126-135). We walk the tree and fit every layer directly; the
  whole fit is one jitted program.
* **Activations** use the 'quant_stats' sow collection: a jitted forward
  returns per-layer (min, max); an EMA with momentum 0.95 accumulates
  across calibration batches (the reference's running-stat loop,
  ptq.py:137-155; base_quantizer.py:160-171), then a pure fit maps the
  final ranges to per-bit delta/zero_point stacks.

Channel-split layers (concat-shortcut convs) get twin qparams fitted from
the two weight slices / the two sown stat streams (suffix ``.split``),
replacing the reference's ``set_split`` twin-quantizer creation
(quant_layer.py:112-115).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from .core import QuantSpec, fit_qparams_multibit, fit_weight_qparams
from .state import LayerQParams, get_layer_kernel, quantizable_layers


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------


def fit_weight_qparams_tree(
    params: Dict[str, Any],
    wq: QuantSpec,
    splits: Optional[Dict[str, int]] = None,
) -> Dict[str, LayerQParams]:
    """Fit multi-bit weight qparams for every quantizable layer.

    ``splits``: {layer_name: split} for concat-shortcut convs — those get
    twin qparams over the two input-channel slices (HWIO axis 2),
    mirroring quant_layer.py:84-87.
    """
    splits = splits or {}
    layers = quantizable_layers(params)
    out: Dict[str, LayerQParams] = {}
    for name, path in layers.items():
        kernel = get_layer_kernel(params, path)
        if name in splits and kernel.ndim == 4:
            s = splits[name]
            d0, z0 = fit_weight_qparams(kernel[:, :, :s, :], wq, channel_axis=-1)
            d1, z1 = fit_weight_qparams(kernel[:, :, s:, :], wq, channel_axis=-1)
            out[name] = LayerQParams(w_delta=d0, w_zp=z0, w0_delta=d1, w0_zp=z1)
        else:
            d, z = fit_weight_qparams(kernel, wq, channel_axis=-1)
            out[name] = LayerQParams(w_delta=d, w_zp=z)
    return out


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def collect_act_stats(
    apply_fn: Callable[..., Any],
    variables: Dict[str, Any],
    batch_args: Tuple,
) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Run one forward with stats collection; returns flat
    ``{layer_name[.split]: (min, max)}``. ``apply_fn(variables, *args,
    mutable=['quant_stats'])`` must thread a ``collect_stats`` ctx."""
    _, state = apply_fn(variables, *batch_args)
    return flatten_stats(state["quant_stats"])


def flatten_stats(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Tuple]:
    """Flatten the sown 'quant_stats' collection. Sown names are already
    canonical layer names; nesting mirrors the module tree."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten_stats(v, prefix))
        else:
            # v is the reduced (min, max) tuple sown by _sow_act_stats
            out[k] = (v[0], v[1])
    return out


def ema_update_stats(
    running: Optional[Dict[str, Tuple]],
    new: Dict[str, Tuple],
    momentum: float = 0.95,
) -> Dict[str, Tuple]:
    """Momentum running-stat merge across calibration batches
    (base_quantizer.py:160-171: first batch initializes, later batches
    EMA-update)."""
    if running is None:
        return new
    out = {}
    for k, (mn, mx) in new.items():
        if k in running:
            rmn, rmx = running[k]
            out[k] = (rmn * momentum + mn * (1 - momentum),
                      rmx * momentum + mx * (1 - momentum))
        else:
            out[k] = (mn, mx)
    return out


def fit_act_qparams_from_stats(
    stats: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
    aq: QuantSpec,
    softmax_aq: Optional[QuantSpec] = None,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Map final activation ranges to multi-bit (delta, zp) stacks.
    Returns {layer_name: {'a_delta': [B], 'a_zp': [B], ...}} fragments."""
    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key, (mn, mx) in stats.items():
        is_split = key.endswith(".split")
        name = key[: -len(".split")] if is_split else key
        spec = aq
        if softmax_aq is not None and "softmax" in name:
            spec = softmax_aq
        d, z = fit_qparams_multibit(mn, mx, spec)
        frag = out.setdefault(name, {})
        if is_split:
            frag["a0_delta"], frag["a0_zp"] = d, z
        else:
            frag["a_delta"], frag["a_zp"] = d, z
    return out


def merge_qparams(
    weight_qp: Dict[str, LayerQParams],
    act_fragments: Dict[str, Dict[str, jnp.ndarray]],
) -> Dict[str, LayerQParams]:
    """Combine weight qparams and activation fragments into the final
    per-layer LayerQParams dict (the reference's ``quant_params_dict``
    checkpoint content, quant_model.py:116-137)."""
    out = dict(weight_qp)
    for name, frag in act_fragments.items():
        base = out.get(name, LayerQParams())
        out[name] = base.replace(**frag)
    return out


# ---------------------------------------------------------------------------
# End-to-end calibration driver
# ---------------------------------------------------------------------------


def calibrate(
    model,
    variables: Dict[str, Any],
    calib_batches: Iterable[Tuple],
    wq: QuantSpec,
    aq: QuantSpec,
    softmax_aq: Optional[QuantSpec] = None,
    splits: Optional[Dict[str, int]] = None,
    ctx_factory=None,
    momentum: float = 0.95,
) -> Dict[str, LayerQParams]:
    """Full calibration: weight fit + running-stat activation fit.

    ``model``: a flax module whose ``__call__`` accepts ``ctx=QuantCtx``;
    ``calib_batches``: iterable of arg tuples (sample, t, ehs, added, ...).
    The per-batch stats pass is jitted once and reused.
    """
    from .state import QuantCtx

    weight_qp = jax.jit(
        lambda p: fit_weight_qparams_tree(p, wq, splits)
    )(variables["params"])

    ctx = (ctx_factory() if ctx_factory is not None
           else QuantCtx(collect_stats=True, qkv_quant=softmax_aq is not None,
                         softmax_aq=softmax_aq))

    @jax.jit
    def stats_step(vars_, *args):
        _, state = model.apply(vars_, *args, ctx, mutable=["quant_stats"])
        return flatten_stats(state["quant_stats"])

    ema_step = jax.jit(lambda r, n: ema_update_stats(r, n, momentum))
    running = None
    for batch in calib_batches:
        new = stats_step(variables, *batch)
        # first batch initializes (python branch), later batches EMA in
        # one jitted program (dict-of-scalars eager loops are pathological
        # over a remote-TPU link)
        running = new if running is None else ema_step(running, new)

    act_frag = jax.jit(
        lambda s: fit_act_qparams_from_stats(s, aq, softmax_aq)
    )(running or {})
    return merge_qparams(weight_qp, act_frag)
