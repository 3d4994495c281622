"""Converters from the reference/HF torch ecosystem into this framework.

Two import paths so reference users can migrate without re-running
anything:

* ``convert_reference_qparams`` — the reference's PTQ checkpoint
  ``ckpt.pth`` ({quantizer_module_name: [buffers, parameters]},
  scripts/ptq.py:236-238) -> our ``{layer_name: LayerQParams}``. Layer
  names already coincide (our canonical names are the diffusers names).
* ``convert_unet_state_dict`` / ``convert_clip_state_dict`` /
  ``convert_vae_state_dict`` — HF diffusers/transformers torch state
  dicts -> our flax params trees (layout transposes: Linear [out,in] ->
  [in,out]; Conv OIHW -> HWIO; norm weight/bias -> scale/bias).

All functions take plain ``{name: np.ndarray}`` dicts so torch is only
needed by the CLI wrapper that ``torch.load``s the files.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Mapping

import numpy as np

logger = logging.getLogger(__name__)

_LIST_NAMES = ("down_blocks", "up_blocks", "resnets", "attentions",
               "transformer_blocks", "downsamplers", "upsamplers", "net",
               "to_out", "layers")


def _flaxify(parts):
    """diffusers dotted name parts -> flax module names (list indices
    fused: ['resnets','0'] -> 'resnets_0')."""
    out = []
    i = 0
    while i < len(parts):
        if (i + 1 < len(parts) and parts[i] in _LIST_NAMES
                and parts[i + 1].isdigit()):
            out.append(f"{parts[i]}_{parts[i+1]}")
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_unet_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF diffusers UNet2DConditionModel state dict -> flax params."""
    params: Dict[str, Any] = {}
    for name, w in sd.items():
        w = np.asarray(w)
        parts = name.split(".")
        leaf = parts[-1]
        mod = _flaxify(parts[:-1])
        if leaf == "weight":
            if w.ndim == 4:  # conv OIHW -> HWIO
                _set(params, mod + ["kernel"], np.transpose(w, (2, 3, 1, 0)))
            elif w.ndim == 2:  # linear [out,in] -> [in,out]
                _set(params, mod + ["kernel"], np.transpose(w))
            else:  # norm scale
                _set(params, mod + ["scale"], w)
        elif leaf == "bias":
            _set(params, mod + ["bias"], w)
        else:
            logger.warning("unhandled unet leaf %s", name)
    return params


def convert_clip_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF CLIPTextModel(WithProjection) state dict -> flax params for
    mixdq_tpu.models.clip.CLIPTextModel."""
    params: Dict[str, Any] = {}
    for name, w in sd.items():
        w = np.asarray(w)
        n = name
        n = re.sub(r"^text_model\.", "", n)
        if n.startswith("embeddings.token_embedding"):
            _set(params, ["token_embedding", "embedding"], w)
        elif n.startswith("embeddings.position_embedding"):
            _set(params, ["position_embedding"], w)
        elif n == "final_layer_norm.weight":
            _set(params, ["final_layer_norm", "scale"], w)
        elif n == "final_layer_norm.bias":
            _set(params, ["final_layer_norm", "bias"], w)
        elif n == "text_projection.weight":
            _set(params, ["text_projection", "kernel"], np.transpose(w))
        else:
            m = re.match(
                r"encoder\.layers\.(\d+)\.(self_attn|mlp|layer_norm1|layer_norm2)"
                r"\.?(.*)\.(weight|bias)$", n)
            if not m:
                logger.warning("unhandled clip leaf %s", name)
                continue
            li, group, sub, leaf = m.groups()
            mod = [f"layers_{li}"]
            if group == "self_attn":
                mod += ["self_attn", sub]
            elif group == "mlp":
                mod += [sub]  # fc1/fc2 live directly on the layer
            else:
                mod += [group]
            if leaf == "weight":
                if w.ndim == 2:
                    _set(params, mod + ["kernel"], np.transpose(w))
                else:
                    _set(params, mod + ["scale"], w)
            else:
                _set(params, mod + ["bias"], w)
    return params


def convert_clip_vision_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF CLIPVisionModel(WithProjection) state dict -> flax params for
    mixdq_tpu.models.clip.CLIPVisionModel (the CLIP-score / CLIP-FID
    feature extractor)."""
    params: Dict[str, Any] = {}
    for name, w in sd.items():
        w = np.asarray(w)
        n = re.sub(r"^vision_model\.", "", name)
        if n == "embeddings.class_embedding":
            _set(params, ["class_embedding"], w)
        elif n == "embeddings.patch_embedding.weight":
            _set(params, ["patch_embedding", "kernel"],
                 np.transpose(w, (2, 3, 1, 0)))  # OIHW -> HWIO
        elif n.startswith("embeddings.position_embedding"):
            _set(params, ["position_embedding"], w)
        elif n.startswith("pre_layrnorm."):
            leaf = "scale" if n.endswith("weight") else "bias"
            _set(params, ["pre_layrnorm", leaf], w)
        elif n.startswith("post_layernorm."):
            leaf = "scale" if n.endswith("weight") else "bias"
            _set(params, ["post_layernorm", leaf], w)
        elif n == "visual_projection.weight":
            _set(params, ["visual_projection", "kernel"], np.transpose(w))
        else:
            m = re.match(
                r"encoder\.layers\.(\d+)\.(self_attn|mlp|layer_norm1|layer_norm2)"
                r"\.?(.*)\.(weight|bias)$", n)
            if not m:
                logger.warning("unhandled clip-vision leaf %s", name)
                continue
            li, group, sub, leaf = m.groups()
            mod = [f"layers_{li}"]
            if group == "self_attn":
                mod += ["self_attn", sub]
            elif group == "mlp":
                mod += [sub]
            else:
                mod += [group]
            if leaf == "weight":
                if w.ndim == 2:
                    _set(params, mod + ["kernel"], np.transpose(w))
                else:
                    _set(params, mod + ["scale"], w)
            else:
                _set(params, mod + ["bias"], w)
    return params


def convert_inception_state_dict(sd: Mapping[str, np.ndarray],
                                 bn_eps: float = 1e-3) -> Dict[str, Any]:
    """torchvision ``Inception3`` (or pytorch-fid FID-Inception) state
    dict -> flax params for mixdq_tpu.models.inception.InceptionV3Features.

    Each ``<block>.conv`` + ``<block>.bn`` pair is folded into one
    conv-with-bias (inference-exact):
        w' = w * gamma / sqrt(var + eps);  b' = beta - mean * gamma / sqrt(var + eps)
    The fc classifier head and aux blocks are ignored (FID uses pool3)."""
    params: Dict[str, Any] = {}
    convs: Dict[str, Dict[str, np.ndarray]] = {}
    for name, w in sd.items():
        if name.startswith(("fc.", "AuxLogits.")) or "num_batches" in name:
            continue
        m = re.match(r"^(.*)\.(conv|bn)\.(weight|bias|running_mean|running_var)$",
                     name)
        if not m:
            logger.warning("unhandled inception leaf %s", name)
            continue
        block, kind, leaf = m.groups()
        convs.setdefault(block, {})[f"{kind}.{leaf}"] = np.asarray(w)
    for block, d in convs.items():
        w = d["conv.weight"]  # OIHW
        gamma = d.get("bn.weight", np.ones(w.shape[0], np.float32))
        beta = d.get("bn.bias", np.zeros(w.shape[0], np.float32))
        mean = d["bn.running_mean"]
        var = d["bn.running_var"]
        s = gamma / np.sqrt(var + bn_eps)
        w_f = np.transpose(w * s[:, None, None, None], (2, 3, 1, 0))  # ->HWIO
        b_f = beta - mean * s
        mod = block.split(".") + ["conv"]
        _set(params, mod + ["kernel"], w_f.astype(np.float32))
        _set(params, mod + ["bias"], b_f.astype(np.float32))
    return params


_VAE_FLAT_RE = re.compile(
    r"^(decoder|encoder)\.(up_blocks|down_blocks)\.(\d+)\.(resnets)\.(\d+)\.(.+)$")
_VAE_SAMPLER_RE = re.compile(
    r"^(decoder|encoder)\.(up_blocks|down_blocks)\.(\d+)\."
    r"(upsamplers|downsamplers)\.0\.conv\.(weight|bias)$")


def convert_vae_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF AutoencoderKL state dict -> flax params for AutoencoderKL.

    Our VAE flattens block lists into single names
    (``up_blocks_0_resnets_1``, ``up_blocks_0_upsampler``)."""
    params: Dict[str, Any] = {}
    for name, w in sd.items():
        w = np.asarray(w)
        parts = name.split(".")
        leaf = parts[-1]

        m = _VAE_SAMPLER_RE.match(name)
        if m:
            tower, _, bi, kind, leaf2 = m.groups()
            mod = [tower, f"{'up' if kind.startswith('up') else 'down'}_blocks_"
                   f"{bi}_{'upsampler' if kind.startswith('up') else 'downsampler'}"]
            _conv_leaf(params, mod, leaf2, w)
            continue
        m = _VAE_FLAT_RE.match(name)
        if m:
            tower, blocks, bi, _, ri, rest = m.groups()
            mod = [tower, f"{blocks}_{bi}_resnets_{ri}"] + _flaxify(
                rest.split(".")[:-1])
            _norm_or_conv_leaf(params, mod, rest.split(".")[-1], w)
            continue
        # mid_block / conv_in / conv_out / norms / quant convs
        mod = _flaxify(parts[:-1])
        _norm_or_conv_leaf(params, mod, leaf, w)
    return params


def _conv_leaf(params, mod, leaf, w):
    if leaf == "weight":
        _set(params, mod + ["kernel"], np.transpose(w, (2, 3, 1, 0)))
    else:
        _set(params, mod + ["bias"], w)


def _norm_or_conv_leaf(params, mod, leaf, w):
    if leaf == "weight":
        if w.ndim == 4:
            _set(params, mod + ["kernel"], np.transpose(w, (2, 3, 1, 0)))
        elif w.ndim == 2:
            _set(params, mod + ["kernel"], np.transpose(w))
        else:
            _set(params, mod + ["scale"], w)
    elif leaf == "bias":
        _set(params, mod + ["bias"], w)
    else:
        logger.warning("unhandled vae leaf %s", ".".join(mod + [leaf]))


def fuse_lora_state_dict(
    sd: Mapping[str, np.ndarray],
    lora_sd: Mapping[str, np.ndarray],
    scale: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Fuse LoRA weights into a base torch state dict:
    ``W' = W + scale * (alpha/r) * B @ A``.

    The SD1.5+LCM flow fuses the LCM-LoRA adapter before quantization
    (the reference's ``pipe.fuse_lora()`` path, qdiff/utils.py:455-459);
    this reproduces that fusion offline so the quantizer sees plain
    Linear weights. LoRA keys: ``{base}.lora_A.weight`` / ``.lora_B.weight``
    (peft) or ``{base}.lora_down.weight`` / ``.lora_up.weight`` (kohya),
    optional ``.alpha`` scalars."""
    out = dict(sd)
    pairs = {}
    for k in lora_sd:
        for down_tag, up_tag in (("lora_A", "lora_B"),
                                 ("lora_down", "lora_up")):
            if f".{down_tag}." in k or k.endswith(f".{down_tag}.weight"):
                base = k.split(f".{down_tag}")[0]
                pairs.setdefault(base, {})["down"] = k
            elif f".{up_tag}." in k or k.endswith(f".{up_tag}.weight"):
                base = k.split(f".{up_tag}")[0]
                pairs.setdefault(base, {})["up"] = k
    fused = 0
    for base, pq in pairs.items():
        if "down" not in pq or "up" not in pq:
            continue
        A = np.asarray(lora_sd[pq["down"]], np.float32)  # [r, in]
        B = np.asarray(lora_sd[pq["up"]], np.float32)  # [out, r]
        r = A.shape[0]
        alpha = float(np.asarray(lora_sd.get(f"{base}.alpha", r)))
        target = f"{base}.weight"
        if target not in out:
            logger.warning("LoRA target missing in base sd: %s", target)
            continue
        W = np.asarray(out[target], np.float32)
        delta = (B @ A) * (scale * alpha / r)
        out[target] = (W + delta.reshape(W.shape)).astype(W.dtype)
        fused += 1
    logger.info("fused %d LoRA layers", fused)
    return out


# ---------------------------------------------------------------------------
# Reference quant checkpoint
# ---------------------------------------------------------------------------


def convert_reference_qparams(
    ckpt: Mapping[str, Any],
    candidate_bits=(2, 4, 8),
) -> Dict[str, Any]:
    """Reference ``ckpt.pth`` -> ``{layer_name: LayerQParams}``.

    Input entries: ``{quantizer_module_name: [buffers, parameters]}``
    where names look like ``model.down_blocks.0....weight_quantizer[_0]``
    / ``...act_quantizer[_0]`` / ``...attn1.act_quantizer_q`` and buffers
    hold ``delta_list [n_bits, C, 1, ...]`` + ``zero_point_list`` (or
    single-bit ``delta``/``zero_point``) (quant_model.py:116-137)."""
    from ..quant.state import LayerQParams
    import jax.numpy as jnp

    frag: Dict[str, Dict[str, np.ndarray]] = {}
    for qname, entry in ckpt.items():
        buffers = dict(entry[0]) if isinstance(entry, (list, tuple)) else dict(entry)
        name = qname
        if name.startswith("model."):
            name = name[len("model."):]

        suffix_map = [
            (".weight_quantizer_0", "w0"),
            (".weight_quantizer", "w"),
            (".act_quantizer_0", "a0"),
            (".act_quantizer", "a"),
        ]
        field = None
        for suf, f in suffix_map:
            if name.endswith(suf):
                layer, field = name[: -len(suf)], f
                break
        else:
            # bare q/k/v/softmax act quantizers keep their full name
            # (our QAct layer identity), treated as activation params
            layer, field = name, "a"

        delta = buffers.get("delta_list", buffers.get("delta"))
        zp = buffers.get("zero_point_list", buffers.get("zero_point"))
        if delta is None:
            logger.warning("no delta in %s", qname)
            continue
        delta = np.asarray(delta, np.float32)
        zp = np.asarray(zp, np.float32)
        if "delta_list" not in buffers:  # single-bit ckpt: broadcast stack
            delta = np.stack([delta] * len(candidate_bits))
            zp = np.stack([zp] * len(candidate_bits))
        # squeeze trailing broadcast dims: [B, C, 1, 1, 1] -> [B, C];
        # per-tensor [B, 1...] -> [B]
        delta = delta.reshape(delta.shape[0], -1)
        zp = zp.reshape(zp.shape[0], -1)
        if delta.shape[1] == 1:
            delta, zp = delta[:, 0], zp[:, 0]
        f = frag.setdefault(layer, {})
        f[f"{field}_delta" if field in ("w", "a") else f"{field}_delta"] = delta
        f[f"{field}_zp"] = zp

    out = {}
    for layer, f in frag.items():
        out[layer] = LayerQParams(**{k: jnp.asarray(v) for k, v in f.items()})
    return out


def convert_bos_precomputed(
    d: Mapping[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """Reference ``bos_pre_computed.pt`` -> ``{layer_name: [1, N] f32}``.

    The reference artifact (kernels/bos_pre_computed.pt, generated by the
    snippet at quantize_sdxl.py:512-520, consumed at nn/Linear.py:178-194)
    maps cross-attn ``...attn2.to_k/to_v`` module names to the FP16
    first-token (BoS) projection output ``[1, 1, N]``. Valid because
    CLIP's causal attention makes the position-0 encoder output
    prompt-independent. Names already match our canonical layer-name
    space (diffusers dotted names)."""
    out: Dict[str, np.ndarray] = {}
    for name, v in d.items():
        if name.startswith("model."):
            name = name[len("model."):]
        if not (".attn2.to_k" in name or ".attn2.to_v" in name):
            raise ValueError(f"unexpected BoS entry {name!r} (want "
                             "cross-attn to_k/to_v projections)")
        a = np.asarray(v, np.float32)
        out[name] = a.reshape(1, a.shape[-1])
    return out
