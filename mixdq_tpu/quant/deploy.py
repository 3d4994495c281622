"""Real-quant deployment: precompute int8 weights + fused epilogue
constants and build the int8 execution context.

TPU-native counterpart of the reference's module-swap pass
(kernels/quantize.py ``convert``/``swap_module`` +
QuantizedLinear/QuantizedConv2d.from_float, nn/Linear.py:58-152,
nn/Conv2d.py:92-285): instead of replacing nn.Modules, we build a
``{layer_name: deploy_params}`` pytree and *prune the fp kernels out of
the model params* — the quant-aware layers skip creating their kernel
param when a deploy entry exists, so deployed weights are int8-only in
memory (the source of the reference's 1.94x static memory saving,
README.md:41-45).

Per-layer deploy entries carry the integer-math constants
(nn/Linear.py:115-132): ``w_int`` int8 codes, fused ``scale = s_w*s_a``,
zero-point folding ``bias0``, and the activation quantize constants
``scale_inv``/``zp_shifted``.

Bit selection is static per deployed config (one compile per final
mixed-precision config — the reference also rebuilds per config,
kernels/quantize_sdxl.py:39-139); 4/2-bit weights use int8 storage and
math exactly as the reference maps quint4x2 -> int8 compute
(quantize_sdxl.py:46-48).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flax import struct

from ..ops import qops
from .core import QuantSpec
from .state import LayerQParams, QuantCtx, canonical_name, quantizable_layers

logger = logging.getLogger(__name__)


@struct.dataclass
class DeployEntry:
    """Deploy constants for one layer (static ``kind``/``split``; array
    leaves are the integer-math constants of nn/Linear.py:115-132)."""

    w_int: Optional[jnp.ndarray] = None
    w_packed: Optional[jnp.ndarray] = None  # uint8 halves-packed int4 codes
    bos_out: Optional[jnp.ndarray] = None  # [1, N] precomputed BoS output
    scale: Optional[jnp.ndarray] = None
    bias0: Optional[jnp.ndarray] = None
    scale_inv: Optional[jnp.ndarray] = None
    zp_shifted: Optional[jnp.ndarray] = None
    part0: Optional["DeployEntry"] = None
    part1: Optional["DeployEntry"] = None
    kind: str = struct.field(pytree_node=False, default="linear")
    split: int = struct.field(pytree_node=False, default=0)
    #: activation quantizer bit-width — sub-8-bit acts ride the int8 MXU
    #: path with tighter code saturation (qops.act_clip_range); the
    #: reference's kernels gate to A8 and leave mixed-act layers FP
    #: (nn/Linear.py:28-43) — a correctness-equivalent TPU improvement
    a_bits: int = struct.field(pytree_node=False, default=8)
    #: weight-only entry (act-protected layer): acts stay FP, the int8
    #: weights dequantize into the bf16 matmul/conv operand — matches the
    #: simulation semantics of --act_protect (weights quantized, acts FP)
    #: while keeping the 2x weight memory/traffic win
    act_off: bool = struct.field(pytree_node=False, default=False)


def build_deploy_params(
    params: Dict[str, Any],
    qparams: Dict[str, LayerQParams],
    layer_bits: Dict[str, Tuple[int, int]],  # name -> (w_bits, a_bits)
    candidate_bits=(2, 4, 8),
    splits: Optional[Dict[str, int]] = None,
    use_int4_storage: bool = False,
    skip_spatial_convs: bool = False,
    pack_w4: bool = False,
    alphas: Optional[Dict[str, Any]] = None,
    fuse_qkv: bool = False,
) -> Dict[str, Any]:
    """Build the deploy pytree for every layer present in ``layer_bits``
    whose activation path is A8 (int8 acceleration gate — the reference's
    ``valid_for_acceleration``, nn/Linear.py:28-43).

    Layers not in ``layer_bits`` (or with unsupported configs) stay FP.
    Split convs get twin entries (``w0_int`` etc., nn/Conv2d.py:189-243).
    ``alphas``: learned AdaRound rounding offsets from
    ``recon.reconstruct(return_alphas=True)`` — folded into the int codes.
    """
    splits = splits or {}
    alphas = alphas or {}
    cb = list(candidate_bits)
    layers = quantizable_layers(params)
    deploy: Dict[str, Any] = {}
    for name, (w_bits, a_bits) in layer_bits.items():
        if name not in layers or name not in qparams:
            continue
        act_off = a_bits is None  # act-protected: weight-only entry
        qp = qparams[name]
        if qp.w_delta is None or (qp.a_delta is None and not act_off):
            continue
        node = params
        for p in layers[name]:
            node = node[p]
        w = node["kernel"]
        if skip_spatial_convs and w.ndim == 4 and w.shape[0] * w.shape[1] > 1:
            # spatial convs (12% of SDXL weights) stay FP: XLA fuses the
            # int8->bf16 convert into matmul operands but not into conv
            # kernels, so deploying them costs more than it saves in
            # 'dequant' mode
            continue
        wb_idx = cb.index(w_bits)
        # weight-only entries never quantize acts; any a params do for
        # the (unused-at-runtime) scale_inv factorization
        ab_idx = cb.index(8 if act_off else a_bits)
        eff_a_bits = 8 if act_off else a_bits
        # 2-bit treated as 4 for storage/math (quantize_sdxl.py:46-48)
        eff_bits = max(w_bits, 4)

        def entry(prep, kind):
            prep.pop("bias", None)
            if (eff_bits == 4 and pack_w4 and kind == "linear"
                    and prep["w_int"].shape[0] % 2 == 0):
                # halves-packed uint8 for the Pallas W4 kernel: 4x weight
                # memory vs bf16, jit-boundary safe (unlike device int4)
                from ..ops.pallas_wq_matmul import pack_w4_halves

                prep["w_packed"] = pack_w4_halves(prep["w_int"])
                prep.pop("w_int")
            elif eff_bits == 4 and use_int4_storage:
                # true 4-bit device storage (XLA packs two codes/byte) —
                # 4x weight memory vs bf16. NOTE: int4 arrays currently
                # crash at jit call boundaries on the axon TPU backend
                # (recursive-jit device_put bug), hence opt-in.
                prep["w_int"] = prep["w_int"].astype(jnp.int4)
            return DeployEntry(kind=kind, a_bits=eff_a_bits,
                               act_off=act_off, **prep)

        alpha = alphas.get(name)
        a_delta = qp.a_delta if qp.a_delta is not None else jnp.ones(
            (len(cb),), jnp.float32)
        a_zp = qp.a_zp if qp.a_zp is not None else jnp.full(
            (len(cb),), 128.0, jnp.float32)
        # act-protected split convs with weight-only qparams (e.g. imported
        # reference checkpoints) may lack a0_* act params too — same
        # placeholder fallback as a_delta/a_zp above (unused at runtime)
        a0_delta = qp.a0_delta if qp.a0_delta is not None else jnp.ones(
            (len(cb),), jnp.float32)
        a0_zp = qp.a0_zp if qp.a0_zp is not None else jnp.full(
            (len(cb),), 128.0, jnp.float32)
        if w.ndim == 2:
            deploy[name] = entry(qops.prepare_qlinear_params(
                w, qp.w_delta[wb_idx], a_delta[ab_idx],
                a_zp[ab_idx], n_bits=eff_bits, alpha=alpha,
                a_bits=eff_a_bits), "linear")
        elif w.ndim == 4:
            if name in splits and qp.w0_delta is not None:
                s = splits[name]
                d0 = entry(qops.prepare_qconv_params(
                    w[:, :, :s, :], qp.w_delta[wb_idx], a_delta[ab_idx],
                    a_zp[ab_idx], n_bits=eff_bits,
                    alpha=None if alpha is None else alpha[:, :, :s, :],
                    a_bits=eff_a_bits), "conv")
                d1 = entry(qops.prepare_qconv_params(
                    w[:, :, s:, :], qp.w0_delta[wb_idx], a0_delta[ab_idx],
                    a0_zp[ab_idx], n_bits=eff_bits,
                    alpha=None if alpha is None else alpha[:, :, s:, :],
                    a_bits=eff_a_bits), "conv")
                deploy[name] = DeployEntry(kind="conv_split", split=s,
                                           a_bits=eff_a_bits, act_off=act_off,
                                           part0=d0, part1=d1)
            else:
                deploy[name] = entry(qops.prepare_qconv_params(
                    w, qp.w_delta[wb_idx], a_delta[ab_idx],
                    a_zp[ab_idx], n_bits=eff_bits, alpha=alpha,
                    a_bits=eff_a_bits), "conv")
    if fuse_qkv:
        deploy = fuse_attention_projections(
            deploy, params, qparams, layer_bits, candidate_bits, alphas,
            pack_w4=pack_w4)
    return deploy


def fuse_attention_projections(
    deploy: Dict[str, Any],
    params: Dict[str, Any],
    qparams: Dict[str, LayerQParams],
    layer_bits: Dict[str, Tuple[int, int]],
    candidate_bits=(2, 4, 8),
    alphas: Optional[Dict[str, Any]] = None,
    pack_w4: bool = False,
) -> Dict[str, Any]:
    """Fold attention projection triplets into fused deploy entries.

    Self-attention (``*.attn1``): to_q/to_k/to_v all consume the SAME
    pre-norm tensor, so their calibrated per-tensor act scales coincide —
    one set of int8 codes (quantized with to_q's scale) feeds a single
    ``[K, 3N]`` GEMM whose per-column weight scales stay exact. Cross
    attention (``*.attn2``): to_k/to_v share ``encoder_hidden_states``
    the same way (to_q consumes the image stream and stays separate).

    This removes 2/3 (resp. 1/2) of the activation-quantize passes —
    measured ~18% of the int8 UNet step as standalone clamp/convert ops —
    and triples the GEMM's N at SDXL's small spatial M, where the MXU is
    width-starved. The reference runs the three projections as separate
    CUTLASS GEMMs with three quantize launches (nn/Linear.py:154-177).

    Member scales/bias0 are REBUILT against the anchor layer's act params
    (not concatenated from the per-layer entries) so a small calibration
    divergence between the twins cannot skew the epilogue: code scale and
    column scale always match. Folded members are replaced with
    ``kind='fused_away'`` markers so their fp kernels stay pruned and the
    int8 codes are not stored twice.
    """
    alphas = alphas or {}
    cb = list(candidate_bits)
    layers = quantizable_layers(params)
    out = dict(deploy)

    def member_ok(n):
        # packed-W4 members are fine: the fused entry is rebuilt from
        # qparams + fp weights, then re-packed below. act_off (weight-
        # only) members can't share int8 codes; heterogeneous member act
        # bits would change the elected per-layer act quantizers, so the
        # triplet only fuses when all members share the anchor's a_bits.
        e = deploy.get(n)
        return (e is not None and e.kind == "linear" and not e.act_off
                and (e.w_int is not None or e.w_packed is not None))

    def get_w(n):
        node = params
        for p in layers[n]:
            node = node[p]
        return node["kernel"]

    prefixes = sorted({n[: -len(".to_q")] for n in deploy
                       if n.endswith(".to_q")})
    for prefix in prefixes:
        leaf = prefix.rsplit(".", 1)[-1]
        if leaf == "attn1":
            members = [f"{prefix}.to_q", f"{prefix}.to_k", f"{prefix}.to_v"]
            anchor, fused_name = members[0], f"{prefix}.to_qkv"
        elif leaf == "attn2":
            members = [f"{prefix}.to_k", f"{prefix}.to_v"]
            anchor, fused_name = members[0], f"{prefix}.to_kv"
        else:
            continue
        if not all(member_ok(n) for n in members):
            continue
        if len({deploy[n].a_bits for n in members}) != 1:
            continue  # heterogeneous act bits: keep separate GEMMs
        ws = [get_w(n) for n in members]
        if any(w.ndim != 2 or w.shape[0] != ws[0].shape[0] for w in ws):
            continue
        qa = qparams[anchor]
        fa_bits = deploy[anchor].a_bits
        ab_idx = cb.index(layer_bits[anchor][1])
        a_delta, a_zp = qa.a_delta[ab_idx], qa.a_zp[ab_idx]
        preps = []
        for n, w in zip(members, ws):
            wb_idx = cb.index(layer_bits[n][0])
            eff_bits = max(layer_bits[n][0], 4)
            preps.append(qops.prepare_qlinear_params(
                w, qparams[n].w_delta[wb_idx], a_delta, a_zp,
                n_bits=eff_bits, alpha=alphas.get(n), a_bits=fa_bits))
        w_int = jnp.concatenate([p["w_int"] for p in preps], axis=1)
        entry_kw = dict(
            kind="linear", a_bits=fa_bits,
            scale=jnp.concatenate([p["scale"] for p in preps]),
            bias0=jnp.concatenate([p["bias0"] for p in preps]),
            scale_inv=preps[0]["scale_inv"],
            zp_shifted=preps[0]["zp_shifted"])
        all_w4 = all(layer_bits[n][0] <= 4 for n in members)
        if pack_w4 and all_w4 and w_int.shape[0] % 2 == 0:
            from ..ops.pallas_wq_matmul import pack_w4_halves

            out[fused_name] = DeployEntry(w_packed=pack_w4_halves(w_int),
                                          **entry_kw)
        else:
            out[fused_name] = DeployEntry(w_int=w_int, **entry_kw)
        for n in members:
            out[n] = DeployEntry(kind="fused_away")
    return out


def prune_deployed_kernels(params: Dict[str, Any], deploy: Dict[str, Any]):
    """Remove the fp 'kernel' leaf of every deployed layer from the params
    tree (the int8 codes replace it)."""
    layers = quantizable_layers(params)

    def prune(node, path=()):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                p = path + (k,)
                if k == "kernel" and canonical_name(path) in deploy:
                    continue
                out[k] = prune(v, p)
            return out
        return node

    return prune(params)


def uniform_layer_bits(params: Dict[str, Any], w_bits: int = 8,
                       a_bits: int = 8) -> Dict[str, Tuple[int, int]]:
    return {n: (w_bits, a_bits) for n in quantizable_layers(params)}


def deploy_unet_ctx(unet, variables, qparams, ctrl, wq: QuantSpec,
                    aq: QuantSpec, splits=None, bos_aware: bool = True,
                    layer_bits: Optional[Dict[str, Tuple[int, int]]] = None,
                    skip_spatial_convs: bool = False,
                    pack_w4: bool = False,
                    alphas: Optional[Dict[str, Any]] = None,
                    fuse_qkv: bool = False,
                    ) -> "QuantCtx":
    """Build an int8-mode QuantCtx (+ pruned params inside ``.deploy``
    consumers must fetch via ``deployed_params``). ``ctrl`` (dynamic) is
    frozen into static per-layer bits here."""
    params = variables["params"]
    if layer_bits is None:
        # pull all controls to host in 4 transfers (per-scalar device_get
        # over a remote-TPU link is pathologically slow)
        cb = list(wq.candidate_bits)
        names = sorted(ctrl.keys())
        w_on = jax.device_get(jnp.stack([ctrl[n].w_on for n in names]))
        a_on = jax.device_get(jnp.stack([ctrl[n].a_on for n in names]))
        w_idx = jax.device_get(jnp.stack([ctrl[n].w_idx for n in names]))
        a_idx = jax.device_get(jnp.stack([ctrl[n].a_idx for n in names]))
        layer_bits = {}
        for i, n in enumerate(names):
            if not bool(w_on[i]):
                continue  # weight FP -> layer stays fully FP
            layer_bits[n] = (cb[int(w_idx[i])],
                             cb[int(a_idx[i])] if bool(a_on[i]) else None)
    # one jitted program for the whole deploy build (794 layers of eager
    # per-layer ops would be thousands of remote dispatches)
    deploy = jax.jit(
        lambda p, qp, al: build_deploy_params(
            p, qp, layer_bits, wq.candidate_bits, splits,
            skip_spatial_convs=skip_spatial_convs, pack_w4=pack_w4,
            alphas=al, fuse_qkv=fuse_qkv)
    )(params, qparams, alphas)
    logger.info("deployed %d/%d layers to int8", len(deploy),
                len(quantizable_layers(params)))
    return QuantCtx(qparams=None, ctrl=None, deploy=deploy, mode="int8",
                    wq=wq, aq=aq, bos_aware=bos_aware, fuse_qkv=fuse_qkv)


def unpack_packed_entries(deploy: Dict[str, Any]) -> Dict[str, Any]:
    """Unpack halves-packed W4 entries to int8 codes ONCE, outside the
    sampler loop.

    XLA does not hoist the nibble-unpack out of a ``lax.scan`` sampler
    loop (measured +2.4 ms/step on SDXL-Turbo — the packed read + int8
    write every step), so W4 deployments choose among three execution
    modes:

    * unpack-once (this function, latency-optimal): checkpoint/resident
      weights stay 4x-packed between calls; during sampling weights are
      int8 (2x) and steps run at full W8A8 speed;
    * in-graph unpack (``deploy_linear`` fallback): 4x resident always,
      +~2.4 ms/step;
    * pallas wq4 kernel (``deploy_compute='dequant'`` + packed): no
      unpacked copy ever exists, slowest — for the most memory-tight
      serving.
    """
    import jax.numpy as jnp  # noqa: F811  (kept local for jit purity)

    def unpack(e):
        if not isinstance(e, DeployEntry) or e.w_packed is None:
            return e
        lo = (e.w_packed & 0xF).astype(jnp.int8) - 8
        hi = (e.w_packed >> 4).astype(jnp.int8) - 8
        return e.replace(w_int=jnp.concatenate([lo, hi], axis=0),
                         w_packed=None)

    return {k: unpack(v) for k, v in deploy.items()}


def precompute_bos_outputs(deploy: Dict[str, Any], params: Dict[str, Any],
                           bos_embedding: jnp.ndarray) -> Dict[str, Any]:
    """Precompute the FP output of every deployed cross-attn k/v layer for
    the BoS text token — the reference's offline ``bos_pre_computed.pt``
    artifact (kernels/quantize_sdxl.py:512-520; consumed at
    nn/Linear.py:178-194). Valid because CLIP's causal attention makes the
    position-0 (BoS) encoder output prompt-independent.

    ``bos_embedding``: [D] — ``encode_prompt(...)[0][:, 0]`` of any prompt.
    Returns a new deploy dict with ``bos_out`` filled for to_k/to_v layers
    of cross-attention (attn2)."""
    layers = quantizable_layers(params)
    out = dict(deploy)
    for name, e in deploy.items():
        if name.endswith(".attn2.to_kv"):
            # fused cross-attn k/v entry: concat of the two FP outputs
            prefix = name[: -len(".to_kv")]
            cols = []
            for member in (f"{prefix}.to_k", f"{prefix}.to_v"):
                node = params
                for p in layers[member]:
                    node = node[p]
                cols.append(node["kernel"].astype(jnp.float32))
            w = jnp.concatenate(cols, axis=1)  # [D, 2N]
        elif ".attn2.to_k" in name or ".attn2.to_v" in name:
            if e.kind == "fused_away":
                continue
            node = params
            for p in layers[name]:
                node = node[p]
            w = node["kernel"].astype(jnp.float32)  # [D, N]
        else:
            continue
        y0 = bos_embedding.astype(jnp.float32)[None, :] @ w  # [1, N]
        out[name] = e.replace(bos_out=y0)
    return out


def apply_bos_outputs(deploy: Dict[str, Any],
                      bos: Dict[str, Any]) -> Dict[str, Any]:
    """Fill ``bos_out`` on deployed cross-attn k/v entries from an
    offline-computed BoS dict ``{layer_name: [1, N]}`` — e.g. the
    reference's real-weight ``kernels/bos_pre_computed.pt`` loaded via
    ``utils.torch_convert.convert_bos_precomputed`` (the torch-side
    consumer is nn/Linear.py:178-194). Fused ``to_kv`` entries take the
    concat of the member outputs. Entries without a match are left
    unchanged."""
    out = dict(deploy)
    for name, e in deploy.items():
        if name.endswith(".attn2.to_kv"):
            prefix = name[: -len(".to_kv")]
            k, v = bos.get(f"{prefix}.to_k"), bos.get(f"{prefix}.to_v")
            if k is None or v is None:
                continue
            y0 = jnp.concatenate([jnp.asarray(k, jnp.float32),
                                  jnp.asarray(v, jnp.float32)], axis=1)
        elif (".attn2.to_k" in name or ".attn2.to_v" in name) \
                and name in bos and e.kind != "fused_away":
            y0 = jnp.asarray(bos[name], jnp.float32)
        else:
            continue
        out[name] = e.replace(bos_out=y0)
    return out


def deployed_params(variables, ctx: QuantCtx):
    """Prune fp kernels of deployed layers from the variables tree."""
    return {**variables,
            "params": prune_deployed_kernels(variables["params"], ctx.deploy)}


def precompute_cross_kv(ehs, ctx, dtype):
    """Hoist + level-batch every cross-attn fused k/v projection.

    All ``*.attn2.to_kv`` deploy entries consume the SAME
    ``encoder_hidden_states`` tensor, so instead of ~70 per-layer
    [T=77, K] int8 GEMMs (each with its own act-quantize pass and its own
    ~20-35 us dispatch), the whole set runs as one batched quantize + one
    batched ``lbtk,lkn->lbtn`` int8 einsum per (K, N, a_bits) group, at
    the top of the UNet forward. The per-layer math is unchanged — each
    layer keeps its own calibrated ``scale_inv``/``zp_shifted`` codes,
    its own per-column ``scale``/``bias0`` epilogue, and its own BoS
    first-token protection (precomputed ``bos_out`` or the FP
    dequantized-weight fallback, mirroring models/attention.py) — so the
    bank output is numerically identical to the per-layer path.

    This generalizes the reference's ``bos_pre_computed.pt`` trick
    (nn/Linear.py:178-194 caches ONE token per layer): on TPU the whole
    k/v projection is loop-invariant per prompt, and XLA additionally
    hoists the bank out of the ``lax.scan`` sampler loop because its only
    inputs (ehs, weights) are loop constants — multi-step samplers pay
    for it once.

    Returns ``{fused_name: [B, T, 2C]}`` or None when the bank does not
    apply (non-int8 mode, no fused entries, small-M hybrid active, or
    ``MIXDQ_CROSS_KV`` unset/0).

    MEASURED NEUTRAL-TO-NEGATIVE at SDXL-Turbo 512 B=1 (interleaved
    4-variant A/B, bench_logs/r5_bank_ab.txt: bank 9.09 ms/step vs
    per-layer 8.98): XLA's while-loop LICM already hoists the
    loop-invariant per-layer projections out of the sampler scan, so the
    bank removes nothing from the steady-state loop and its stacked
    output adds slice copies feeding the whole-block attention kernels.
    Default is therefore OFF; the knob stays for single-step serving
    A/Bs where no scan exists to hoist into.
    """
    import os

    if os.environ.get("MIXDQ_CROSS_KV", "0").strip() != "1":
        return None
    if (ctx.mode != "int8" or not ctx.deploy or not ctx.fuse_qkv
            or ctx.dequant_small_m
            or ctx.deploy_compute not in ("int8", "int8_sec")
            or ehs.ndim != 3):
        return None
    from ..ops import qops

    entries = {}
    for name, e in ctx.deploy.items():
        if not name.endswith(".attn2.to_kv"):
            continue
        if (e.kind != "linear" or e.act_off or e.scale_inv is None
                or e.split):
            continue
        w = e.w_int
        if w is None and e.w_packed is not None:
            # trace-time nibble unpack; loop-invariant, XLA hoists it out
            # of the sampler scan (same as deploy_linear's hoist)
            lo = (e.w_packed & 0xF).astype(jnp.int8) - 8
            hi = (e.w_packed >> 4).astype(jnp.int8) - 8
            w = jnp.concatenate([lo, hi], axis=0)
        if w is None or w.shape[0] != ehs.shape[-1]:
            continue
        if w.dtype != jnp.int8:
            w = w.astype(jnp.int8)  # int4-stored W4 entries
        entries[name] = (e, w)
    if not entries:
        return None

    groups: Dict[Tuple[int, int, int], list] = {}
    for name, (e, w) in entries.items():
        groups.setdefault((w.shape[0], w.shape[1], e.a_bits), []).append(
            (name, e, w))

    bank = {}
    x32 = ehs.astype(jnp.float32)
    for (K, N, a_bits), members in sorted(groups.items()):
        names = [m[0] for m in members]
        es = [m[1] for m in members]
        w_bank = jnp.stack([m[2] for m in members])  # [L, K, N] int8
        sinv = jnp.stack([e.scale_inv for e in es]).reshape(-1, 1, 1, 1)
        zp = jnp.stack([e.zp_shifted for e in es]).reshape(-1, 1, 1, 1)
        scale = jnp.stack([e.scale for e in es])[:, None, None, :]
        bias0 = jnp.stack([e.bias0 for e in es])[:, None, None, :]
        lo, hi = qops.act_clip_range(a_bits)
        codes = jnp.clip(jnp.round(x32[None] * sinv) + zp, lo, hi
                         ).astype(jnp.int8)  # [L, B, T, K]
        acc = jnp.einsum("lbtk,lkn->lbtn", codes, w_bank,
                         preferred_element_type=jnp.int32)
        y = ((acc - bias0).astype(jnp.float32) * scale).astype(dtype)
        if ctx.bos_aware:
            # batched FP first-token fallback: y0 = ehs[:, :1] @ (W * s_w)
            w_delta = (jnp.stack([e.scale for e in es])
                       * jnp.stack([e.scale_inv for e in es]
                                   ).reshape(-1, 1))  # [L, N] = s_w
            w_fp = w_bank.astype(jnp.float32) * w_delta[:, None, :]
            y0_dq = jnp.einsum("btk,lkn->lbtn", x32[:, :1, :], w_fp)
            y0 = jnp.stack([
                (jnp.broadcast_to(e.bos_out[None].astype(jnp.float32),
                                  (ehs.shape[0], 1, N))
                 if e.bos_out is not None else y0_dq[i])
                for i, e in enumerate(es)])
            y = jnp.concatenate([y0.astype(dtype), y[..., 1:, :]], axis=-2)
        for i, name in enumerate(names):
            bank[name] = y[i]
    return bank


def precompute_linear_bank(x, ctx, dtype, suffix=".time_emb_proj"):
    """Hoist + batch every deployed linear whose name ends with ``suffix``
    and whose input is the SAME tensor ``x`` (shape ``[B, K]``).

    The time-embedding projections are the motivating case: all ~60
    ``*.time_emb_proj`` layers consume the one ``silu(emb)`` vector, each
    as an M=1 int8 GEMM with its own act-quantize — pure per-op dispatch
    overhead at B=1. The bank runs one batched quantize + one
    ``lbk,lkn->lbn`` int8 einsum per (K, N, a_bits) group at the UNet
    top; per-layer scales/bias0 stack, so the math is identical to the
    per-layer ``deploy_linear`` path (QDense adds the fp bias after,
    exactly as before). No BoS handling (2-D inputs have no token axis).

    Returns ``{name: [B, N]}`` (pre-bias outputs) or None when the bank
    does not apply. ``MIXDQ_LINEAR_BANK=0`` disables it for A/B runs.
    """
    import os

    if os.environ.get("MIXDQ_LINEAR_BANK", "1").strip() == "0":
        return None
    if (ctx.mode != "int8" or not ctx.deploy or ctx.dequant_small_m
            or ctx.deploy_compute not in ("int8", "int8_sec")
            or x.ndim != 2):
        return None
    from ..ops import qops

    entries = {}
    for name, e in ctx.deploy.items():
        if not name.endswith(suffix):
            continue
        if (e.kind != "linear" or e.act_off or e.scale_inv is None
                or e.split):
            continue
        w = e.w_int
        if w is None and e.w_packed is not None:
            lo = (e.w_packed & 0xF).astype(jnp.int8) - 8
            hi = (e.w_packed >> 4).astype(jnp.int8) - 8
            w = jnp.concatenate([lo, hi], axis=0)
        if w is None or w.shape[0] != x.shape[-1]:
            continue
        if w.dtype != jnp.int8:
            w = w.astype(jnp.int8)
        entries[name] = (e, w)
    if not entries:
        return None

    groups: Dict[Tuple[int, int, int], list] = {}
    for name, (e, w) in entries.items():
        groups.setdefault((w.shape[0], w.shape[1], e.a_bits), []).append(
            (name, e, w))

    bank = {}
    x32 = x.astype(jnp.float32)
    for (K, N, a_bits), members in sorted(groups.items()):
        names = [m[0] for m in members]
        es = [m[1] for m in members]
        w_bank = jnp.stack([m[2] for m in members])  # [L, K, N] int8
        sinv = jnp.stack([e.scale_inv for e in es]).reshape(-1, 1, 1)
        zp = jnp.stack([e.zp_shifted for e in es]).reshape(-1, 1, 1)
        scale = jnp.stack([e.scale for e in es])[:, None, :]
        bias0 = jnp.stack([e.bias0 for e in es])[:, None, :]
        lo, hi = qops.act_clip_range(a_bits)
        codes = jnp.clip(jnp.round(x32[None] * sinv) + zp, lo, hi
                         ).astype(jnp.int8)  # [L, B, K]
        acc = jnp.einsum("lbk,lkn->lbn", codes, w_bank,
                         preferred_element_type=jnp.int32)
        y = ((acc - bias0).astype(jnp.float32) * scale).astype(dtype)
        for i, name in enumerate(names):
            bank[name] = y[i]
    return bank
