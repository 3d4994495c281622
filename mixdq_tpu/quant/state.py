"""Quantization state & context — the TPU-native replacement for the
reference's stateful module-wrapper layer.

The reference mutates an ``nn.Module`` tree: every Conv/Linear is wrapped
in a ``QuantLayer`` holding quantizer sub-modules with lazily-initialized
buffers and ``weight_quant``/``act_quant`` boolean attributes toggled by
``set_quant_state`` / ``set_layer_quant`` / ``set_layer_bit``
(quant_model.py:71-113,249-367; quant_layer.py:14-115).

Here all of that is *data*:

* ``LayerQParams`` — one pytree node per layer holding the multi-bit
  ``delta_list``/``zero_point_list`` stacks (the reference's buffers,
  base_quantizer.py:46-50,98-109), plus optional channel-split twins
  (the reference's ``weight_quantizer_0``/``act_quantizer_0``,
  quant_layer.py:112-115).
* ``LayerCtrl`` — per-layer *dynamic* enable flags and bit indices, so an
  entire per-layer bit configuration is a jit **argument**, not a recompile:
  one compiled UNet serves every sensitivity-sweep / mixed-precision
  configuration (the reference re-runs Python module surgery per config).
* ``QuantCtx`` — the static+dynamic bundle threaded through the model's
  ``__call__``. ``flax.struct`` makes it a pytree whose static fields
  (mode, specs) are hashable jit constants.

Layer identity is the diffusers-style qualified name (e.g.
``down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q``) so the
reference's per-layer bit-width YAML files and act-protect lists apply
verbatim (quant_model.py:370-394; kernels/quantize_sdxl.py:39-139).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import struct

from .core import QuantSpec, fake_quant, DEFAULT_CANDIDATE_BITS


# ---------------------------------------------------------------------------
# Name canonicalization: flax module path -> diffusers qualified name
# ---------------------------------------------------------------------------

# Flax module names cannot contain '.', so list children are named
# ``resnets_0`` etc.; these prefixes are rewritten to ``resnets.0``.
_LIST_NAMES = (
    "down_blocks",
    "up_blocks",
    "resnets",
    "attentions",
    "transformer_blocks",
    "downsamplers",
    "upsamplers",
    "net",
    "to_out",
    "layers",
    "text_projection",
)
_LIST_RE = re.compile(r"^(%s)_(\d+)$" % "|".join(_LIST_NAMES))


def canonical_name(path: Tuple[str, ...]) -> str:
    """Convert a flax module path tuple to the diffusers dotted name."""
    parts = []
    for p in path:
        m = _LIST_RE.match(p)
        parts.append(f"{m.group(1)}.{m.group(2)}" if m else p)
    return ".".join(parts)


# ---------------------------------------------------------------------------
# Pytree state
# ---------------------------------------------------------------------------


@struct.dataclass
class LayerQParams:
    """Multi-bit quant parameters for one layer.

    ``w_delta``/``w_zp``: ``[n_bits, C]`` (per-channel) or ``[n_bits]``;
    ``a_delta``/``a_zp``: ``[n_bits]`` (per-tensor activations).
    ``*0`` twins exist only for channel-split layers (concat-shortcut
    convs, quant_layer.py:74-87).
    """

    w_delta: Optional[jnp.ndarray] = None
    w_zp: Optional[jnp.ndarray] = None
    a_delta: Optional[jnp.ndarray] = None
    a_zp: Optional[jnp.ndarray] = None
    w0_delta: Optional[jnp.ndarray] = None
    w0_zp: Optional[jnp.ndarray] = None
    a0_delta: Optional[jnp.ndarray] = None
    a0_zp: Optional[jnp.ndarray] = None


@struct.dataclass
class LayerCtrl:
    """Dynamic per-layer quant controls (jit arguments, not constants)."""

    w_on: jnp.ndarray  # bool scalar
    a_on: jnp.ndarray  # bool scalar
    w_idx: jnp.ndarray  # int32 scalar index into candidate_bits
    a_idx: jnp.ndarray  # int32 scalar


def make_ctrl(
    w_on: bool = True, a_on: bool = True, w_bits: int = 8, a_bits: int = 8,
    candidate_bits: Sequence[int] = DEFAULT_CANDIDATE_BITS,
) -> LayerCtrl:
    cb = list(candidate_bits)
    return LayerCtrl(
        w_on=jnp.asarray(w_on),
        a_on=jnp.asarray(a_on),
        w_idx=jnp.asarray(cb.index(w_bits) if w_bits in cb else 0, jnp.int32),
        a_idx=jnp.asarray(cb.index(a_bits) if a_bits in cb else 0, jnp.int32),
    )


def uniform_ctrl(
    layer_names: Sequence[str], w_bits: int = 8, a_bits: int = 8,
    w_on: bool = True, a_on: bool = True,
    candidate_bits: Sequence[int] = DEFAULT_CANDIDATE_BITS,
) -> Dict[str, LayerCtrl]:
    """All-layer uniform control dict (the reference's global
    ``set_quant_state``, quant_model.py:71-82)."""
    return {
        n: make_ctrl(w_on, a_on, w_bits, a_bits, candidate_bits) for n in layer_names
    }


def apply_bitwidth_config(
    ctrl: Dict[str, LayerCtrl],
    bit_config: Dict[str, int],
    which: str,
    candidate_bits: Sequence[int] = DEFAULT_CANDIDATE_BITS,
) -> Dict[str, LayerCtrl]:
    """Apply a per-layer bit-width YAML mapping (``{layer_name: bits}``)
    to the control dict — the reference's ``load_bitwidth_config``
    (quant_model.py:370-394). ``which`` is 'weight' or 'act'.

    Bit-width 0 (or 32/16) in a config means "leave FP" — disable quant
    for that tensor, matching the act-protect mechanism
    (scripts/quant_txt2img.py:223-226).
    """
    cb = list(candidate_bits)
    out = dict(ctrl)
    for name, bits in bit_config.items():
        if name not in out:
            raise KeyError(f"bitwidth config references unknown layer: {name}")
        c = out[name]
        if bits in (0, 16, 32):
            if which == "weight":
                out[name] = c.replace(w_on=jnp.asarray(False))
            else:
                out[name] = c.replace(a_on=jnp.asarray(False))
            continue
        idx = jnp.asarray(cb.index(bits), jnp.int32)
        if which == "weight":
            out[name] = c.replace(w_idx=idx, w_on=jnp.asarray(True))
        else:
            out[name] = c.replace(a_idx=idx, a_on=jnp.asarray(True))
    return out


def protect_layers(
    ctrl: Dict[str, LayerCtrl], names: Sequence[str], which: str = "act"
) -> Dict[str, LayerCtrl]:
    """Disable quantization for the listed layers (the ``--act_protect``
    FP16 list, scripts/quant_txt2img.py:223-226)."""
    out = dict(ctrl)
    for n in names:
        if n not in out:
            raise KeyError(f"protect list references unknown layer: {n}")
        if which == "act":
            out[n] = out[n].replace(a_on=jnp.asarray(False))
        elif which == "weight":
            out[n] = out[n].replace(w_on=jnp.asarray(False))
        else:
            out[n] = out[n].replace(a_on=jnp.asarray(False), w_on=jnp.asarray(False))
    return out


def group_ctrl(
    layer_names: Sequence[str], targets: Sequence[str], which: str,
    bits: int, candidate_bits: Sequence[int] = DEFAULT_CANDIDATE_BITS,
) -> Dict[str, LayerCtrl]:
    """Quantize only layers matching any prefix/name in ``targets`` — the
    reference's group/block-level ``set_layer_quant``
    (quant_model.py:249-298). A target matches exactly or as a dotted
    prefix (block-level sweep)."""
    ctrl = uniform_ctrl(layer_names, w_on=False, a_on=False,
                        candidate_bits=candidate_bits)
    on = make_ctrl(
        w_on=(which in ("weight", "both")), a_on=(which in ("act", "both")),
        w_bits=bits, a_bits=bits, candidate_bits=candidate_bits)
    for n in layer_names:
        if any(n == t or n.startswith(t + ".") for t in targets):
            ctrl[n] = on
    return ctrl


def quant_till_ctrl(
    ordered_names: Sequence[str], k: int, which: str = "both", bits: int = 8,
    candidate_bits: Sequence[int] = DEFAULT_CANDIDATE_BITS,
) -> Dict[str, LayerCtrl]:
    """Quantize the first ``k`` layers only (the reference's
    ``quantize_model_till``, qdiff/utils.py:369-380)."""
    return group_ctrl(ordered_names, list(ordered_names[:k]), which, bits,
                      candidate_bits)


def solo_layer_ctrl(
    layer_names: Sequence[str], target: str, which: str, bits: int,
    candidate_bits: Sequence[int] = DEFAULT_CANDIDATE_BITS,
) -> Dict[str, LayerCtrl]:
    """Quantize *only one* layer — the sensitivity-sweep primitive
    (quant_content.py:193-210 / quant_quality.py:275-301). All controls are
    dynamic arrays, so sweeping layers/bits reuses one compiled model."""
    ctrl = uniform_ctrl(layer_names, w_on=False, a_on=False,
                        candidate_bits=candidate_bits)
    on = make_ctrl(
        w_on=(which == "weight"), a_on=(which == "act"),
        w_bits=bits if which == "weight" else candidate_bits[0],
        a_bits=bits if which == "act" else candidate_bits[0],
        candidate_bits=candidate_bits,
    )
    ctrl[target] = on
    return ctrl


# ---------------------------------------------------------------------------
# Quant context
# ---------------------------------------------------------------------------

_WQ_DEFAULT = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
_AQ_DEFAULT = QuantSpec(sym=False, channel_wise=False, round_mode="nearest_ste",
                        running_stat=True)


@struct.dataclass
class QuantCtx:
    """Everything the model needs to know about quantization, threaded
    through ``__call__``. ``mode``:

    * ``'fp'``   — no quantization (also: stats collection passes)
    * ``'fake'`` — fake-quant simulation (the reference's L4a path)
    * ``'int8'`` — real int8 Pallas kernels (the reference's L4b path)
    """

    qparams: Any = None  # Dict[str, LayerQParams]
    ctrl: Any = None  # Dict[str, LayerCtrl]
    deploy: Any = None  # Dict[str, DeployParams] for int8 mode
    # AdaRound per-element rounding offsets {layer: alpha}; when set, the
    # weight fake-quant uses learned rounding (soft while optimizing —
    # gradients flow to alpha — hard otherwise; base_quantizer.py:74-84)
    alphas: Any = None
    # Per-step hoisted cross-attention k/v bank {fused_to_kv_name: [B,T,2C]}
    # built once at the top of the UNet forward (deploy.precompute_cross_kv):
    # every attn2.to_kv projection consumes the SAME encoder_hidden_states,
    # so the ~70 tiny [77,K] GEMMs + quantize passes collapse into a few
    # level-batched int8 einsums. Numerically identical to the per-layer
    # path (same scales, same int32 accumulation).
    cross_kv: Any = None
    # Generic shared-input linear bank {layer_name: [B, N]} for QDense
    # consumers (today: the ~60 time_emb_proj projections, which all
    # consume the same silu(emb) vector — deploy.precompute_linear_bank)
    linear_bank: Any = None
    mode: str = struct.field(pytree_node=False, default="fp")
    # int8-mode compute strategy: 'int8' = integer MXU math with fused
    # dequant epilogue (reference-style); 'dequant' = weight-only: int8
    # weights dequantized on the fly into the matmul (memory-bound win on
    # hardware where bf16 MXU outruns int8 math)
    deploy_compute: str = struct.field(pytree_node=False, default="int8")
    # Small-M hybrid (trace-time, shape-driven): dense/1x1 layers whose
    # GEMM M (= batch x tokens or batch x pixels) is <= this threshold
    # run weight-only ('dequant') instead of full int8. MEASURED LOSER
    # at B=1 on v5e (bench.py, MIXDQ_BENCH_SMALLM=256: 10.95 ms vs the
    # pure int8_sec 9.53 ms): small-M GEMMs are WEIGHT-traffic-bound,
    # and the dequant path reads bf16 weights (XLA hoists the
    # loop-invariant s8->bf16 convert out of the sampler scan,
    # materializing a bf16 copy) — doubling the dominant HBM stream
    # outweighs the removed act-quantize fusions (~3.5 us each).
    # Kept as an explicit knob for regimes where acts dominate
    # (very large batch); 0 (off) is the measured-best default.
    dequant_small_m: int = struct.field(pytree_node=False, default=0)
    wq: QuantSpec = struct.field(pytree_node=False, default=_WQ_DEFAULT)
    aq: QuantSpec = struct.field(pytree_node=False, default=_AQ_DEFAULT)
    softmax_aq: Optional[QuantSpec] = struct.field(pytree_node=False, default=None)
    collect_stats: bool = struct.field(pytree_node=False, default=False)
    capture_acts: bool = struct.field(pytree_node=False, default=False)
    bos_aware: bool = struct.field(pytree_node=False, default=False)
    qkv_quant: bool = struct.field(pytree_node=False, default=False)
    # int8-mode only: route attention projections through fused QKV (self-
    # attn) / KV (cross-attn) deploy entries — one shared-act-scale GEMM
    # instead of three (build with deploy.fuse_attention_projections). The
    # three projections consume the SAME tensor, so their calibrated act
    # scales coincide and the fusion is numerically faithful; it removes
    # 2/3 of the quantize passes and widens the GEMM N for MXU efficiency.
    fuse_qkv: bool = struct.field(pytree_node=False, default=False)
    soft_round: bool = struct.field(pytree_node=False, default=False)
    # GEGLU activation: 'tanh' = tanh-approximate gelu (TPU-first choice:
    # XLA lowers exact gelu to a ~35-op f32 erfc polynomial with divide +
    # exp per element — measured ~1.5 ms of a 12 ms SDXL-Turbo step across
    # the 70 GEGLUs; the tanh form is a few ops and standard in production
    # transformers). 'exact' restores the diffusers-parity erf gelu.
    gelu: str = struct.field(pytree_node=False, default="tanh")
    # attention math implementation: 'einsum' = XLA bmm+softmax chain;
    # 'flash' = Pallas online-softmax kernel (logits stay in VMEM);
    # 'int8_flash' = flash with dynamically-quantized int8 QK^T — the
    # real-quant attention path (the reference only *simulates* q/k/v
    # quantizers, quant_block.py:213-233, and never accelerates attention)
    attn_impl: str = struct.field(pytree_node=False, default="einsum")

    # -- helpers used by the quant-aware layers ---------------------------

    def layer(self, name: str):
        qp = self.qparams.get(name) if self.qparams is not None else None
        ct = self.ctrl.get(name) if self.ctrl is not None else None
        return qp, ct

    def quant_weight(self, name: str, w: jnp.ndarray, channel_axis: int = -1,
                     split_part: int = 0) -> jnp.ndarray:
        """Fake-quant a weight tensor per this layer's dynamic control.
        ``split_part``: 0 = primary quantizer, 1 = split twin."""
        if self.mode != "fake":
            return w
        qp, ct = self.layer(name)
        if qp is None or ct is None:
            return w
        delta_l = qp.w_delta if split_part == 0 else qp.w0_delta
        zp_l = qp.w_zp if split_part == 0 else qp.w0_zp
        if delta_l is None:
            return w
        bits = jnp.take(jnp.asarray(self.wq.candidate_bits, jnp.int32), ct.w_idx)
        delta = jnp.take(delta_l, ct.w_idx, axis=0)
        zp = jnp.take(zp_l, ct.w_idx, axis=0)
        if delta.ndim > 0:  # per-channel: broadcast along channel_axis
            shape = [1] * w.ndim
            shape[channel_axis % w.ndim] = w.shape[channel_axis % w.ndim]
            delta = delta.reshape(shape)
            zp = zp.reshape(shape)
        alpha = (self.alphas.get(name)
                 if (self.alphas is not None and split_part == 0) else None)
        if alpha is not None and alpha.shape != w.shape:
            alpha = None  # split convs quantize kernel slices; alpha is
            # fitted on the full kernel — skip learned rounding there
        if alpha is not None:
            from .core import fake_quant_adaround

            wq = fake_quant_adaround(w, delta, zp, bits, alpha,
                                     sym=self.wq.sym,
                                     hard=not self.soft_round)
        else:
            wq = fake_quant(w, delta, zp, bits, sym=self.wq.sym,
                            ste=self.wq.round_mode.endswith("ste"))
        return jnp.where(ct.w_on, wq, w)

    def quant_act(self, name: str, x: jnp.ndarray, split_part: int = 0,
                  spec: Optional[QuantSpec] = None) -> jnp.ndarray:
        """Fake-quant an activation tensor per this layer's dynamic control."""
        if self.mode != "fake":
            return x
        qp, ct = self.layer(name)
        if qp is None or ct is None:
            return x
        delta_l = qp.a_delta if split_part == 0 else qp.a0_delta
        zp_l = qp.a_zp if split_part == 0 else qp.a0_zp
        if delta_l is None:
            return x
        sp = spec or self.aq
        bits = jnp.take(jnp.asarray(sp.candidate_bits, jnp.int32), ct.a_idx)
        delta = jnp.take(delta_l, ct.a_idx, axis=0)
        zp = jnp.take(zp_l, ct.a_idx, axis=0)
        xq = fake_quant(x, delta, zp, bits, sym=sp.sym,
                        ste=sp.round_mode.endswith("ste"))
        return jnp.where(ct.a_on, xq, x)


FP_CTX = QuantCtx()


# ---------------------------------------------------------------------------
# Param-tree introspection
# ---------------------------------------------------------------------------


def quantizable_layers(params: Dict[str, Any], prefix: Tuple[str, ...] = ()) -> Dict[str, Tuple[str, ...]]:
    """Enumerate quantizable layers (QDense/QConv — any module owning a
    'kernel' param) in a flax params tree. Returns
    ``{canonical_name: flax_path_tuple}`` — the TPU-native analogue of the
    reference's recursive ``quant_layer_refactor`` walk
    (quant_model.py:37-55)."""
    out: Dict[str, Tuple[str, ...]] = {}
    if isinstance(params, dict):
        if "kernel" in params and not isinstance(params["kernel"], dict):
            out[canonical_name(prefix)] = prefix
            return out
        for k, v in params.items():
            out.update(quantizable_layers(v, prefix + (k,)))
    return out


def get_layer_kernel(params: Dict[str, Any], path: Tuple[str, ...]) -> jnp.ndarray:
    node = params
    for p in path:
        node = node[p]
    return node["kernel"]
