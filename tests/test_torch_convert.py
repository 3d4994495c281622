"""Checkpoint converter tests: synthetic torch-format dicts (HF naming)
round-trip into our flax trees with exact structure and value match."""

import re

import jax
import jax.numpy as jnp
import numpy as np

from mixdq_tpu.models.configs import TINY_CLIP_2, TINY_SDXL_UNET
from mixdq_tpu.models.unet import UNet2DConditionModel
from mixdq_tpu.models.clip import CLIPTextModel
from mixdq_tpu.utils import torch_convert
import pytest  # noqa: E402

_FUSED = re.compile(
    r"^(down_blocks|up_blocks|resnets|attentions|transformer_blocks|"
    r"downsamplers|upsamplers|net|to_out|layers)_(\d+)$")


def flax_to_torch_names(tree, prefix=()):
    """Inverse of the converter's name mapping, producing an HF-style
    state dict from a flax params tree."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flax_to_torch_names(v, prefix + (k,)))
            continue
        parts = []
        for p in prefix:
            m = _FUSED.match(p)
            parts += [m.group(1), m.group(2)] if m else [p]
        v = np.asarray(v)
        if k == "kernel":
            if v.ndim == 4:
                out[".".join(parts + ["weight"])] = np.transpose(v, (3, 2, 0, 1))
            else:
                out[".".join(parts + ["weight"])] = np.transpose(v)
        elif k == "scale":
            out[".".join(parts + ["weight"])] = v
        elif k == "bias":
            out[".".join(parts + ["bias"])] = v
        elif k == "embedding":
            out[".".join(parts + ["weight"])] = v
        else:  # raw param (position_embedding)
            out[".".join(parts)] = v
    return out


def trees_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            trees_equal(a[k], b[k], path + "/" + k)
        else:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       err_msg=path + "/" + k)


@pytest.mark.slow
def test_unet_state_dict_roundtrip():
    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 1
    args = (jnp.zeros((B, 16, 16, 4)), jnp.zeros((B,)),
            jnp.zeros((B, 77, 128)),
            {"text_embeds": jnp.zeros((B, 64)), "time_ids": jnp.zeros((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    torch_sd = flax_to_torch_names(params)
    back = torch_convert.convert_unet_state_dict(torch_sd)
    trees_equal(params, back)


@pytest.mark.slow
def test_clip_state_dict_roundtrip():
    model = CLIPTextModel(TINY_CLIP_2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 77), jnp.int32))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    # build the HF-style dict with its real naming quirks
    sd = {}
    for lname, ltree in params.items():
        if lname == "token_embedding":
            sd["text_model.embeddings.token_embedding.weight"] = ltree["embedding"]
        elif lname == "position_embedding":
            sd["text_model.embeddings.position_embedding.weight"] = ltree
        elif lname == "final_layer_norm":
            sd["text_model.final_layer_norm.weight"] = ltree["scale"]
            sd["text_model.final_layer_norm.bias"] = ltree["bias"]
        elif lname == "text_projection":
            sd["text_projection.weight"] = np.transpose(ltree["kernel"])
        elif lname.startswith("layers_"):
            li = lname.split("_")[1]
            for sub, st in ltree.items():
                if sub == "self_attn":
                    for proj, pt in st.items():
                        sd[f"text_model.encoder.layers.{li}.self_attn.{proj}.weight"] = np.transpose(pt["kernel"])
                        sd[f"text_model.encoder.layers.{li}.self_attn.{proj}.bias"] = pt["bias"]
                elif sub in ("fc1", "fc2"):
                    sd[f"text_model.encoder.layers.{li}.mlp.{sub}.weight"] = np.transpose(st["kernel"])
                    sd[f"text_model.encoder.layers.{li}.mlp.{sub}.bias"] = st["bias"]
                else:  # layer_norm1/2
                    sd[f"text_model.encoder.layers.{li}.{sub}.weight"] = st["scale"]
                    sd[f"text_model.encoder.layers.{li}.{sub}.bias"] = st["bias"]
    back = torch_convert.convert_clip_state_dict(sd)
    trees_equal(params, back)


def test_reference_qparams_conversion():
    """Synthetic reference ckpt structure -> LayerQParams."""
    C = 8
    ckpt = {
        "model.down_blocks.0.resnets.0.conv1.weight_quantizer": [
            {"delta_list": np.random.rand(3, C, 1, 1, 1).astype(np.float32),
             "zero_point_list": np.zeros((3, C, 1, 1, 1), np.float32)}, {}],
        "model.down_blocks.0.resnets.0.conv1.act_quantizer": [
            {"delta_list": np.random.rand(3, 1, 1, 1, 1).astype(np.float32),
             "zero_point_list": np.full((3, 1, 1, 1, 1), 7, np.float32)}, {}],
        "model.up_blocks.0.resnets.0.conv_shortcut.weight_quantizer_0": [
            {"delta_list": np.random.rand(3, C, 1, 1, 1).astype(np.float32),
             "zero_point_list": np.zeros((3, C, 1, 1, 1), np.float32)}, {}],
        "model.mid_block.attentions.0.transformer_blocks.0.attn1.act_quantizer_q": [
            {"delta_list": np.random.rand(3, 1).astype(np.float32),
             "zero_point_list": np.zeros((3, 1), np.float32)}, {}],
    }
    qp = torch_convert.convert_reference_qparams(ckpt)
    conv1 = qp["down_blocks.0.resnets.0.conv1"]
    assert conv1.w_delta.shape == (3, C)
    assert conv1.a_delta.shape == (3,)
    assert float(conv1.a_zp[0]) == 7.0
    sc = qp["up_blocks.0.resnets.0.conv_shortcut"]
    assert sc.w0_delta is not None and sc.w0_delta.shape == (3, C)
    qact = qp["mid_block.attentions.0.transformer_blocks.0.attn1.act_quantizer_q"]
    assert qact.a_delta.shape == (3,)


def test_fuse_lora_state_dict():
    rng = np.random.RandomState(0)
    W = rng.randn(8, 6).astype(np.float32)
    sd = {"unet.attn.to_q.weight": W.copy()}
    A = rng.randn(2, 6).astype(np.float32)  # [r, in]
    B = rng.randn(8, 2).astype(np.float32)  # [out, r]
    lora = {"unet.attn.to_q.lora_A.weight": A,
            "unet.attn.to_q.lora_B.weight": B,
            "unet.attn.to_q.alpha": np.float32(4.0)}
    fused = torch_convert.fuse_lora_state_dict(sd, lora, scale=0.5)
    want = W + (B @ A) * (0.5 * 4.0 / 2.0)
    np.testing.assert_allclose(fused["unet.attn.to_q.weight"], want,
                               rtol=1e-5)


@pytest.mark.slow
def test_clip_vision_state_dict_roundtrip():
    """CLIP image tower: forward sanity + HF-named state-dict conversion."""
    from mixdq_tpu.models.clip import CLIPVisionModel, preprocess_images
    from mixdq_tpu.models.configs import CLIPVisionConfig

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                           num_layers=2, num_heads=2, intermediate_size=64,
                           projection_dim=16)
    model = CLIPVisionModel(cfg)
    px = preprocess_images(
        jnp.ones((2, 32, 32, 3), jnp.float32) * 0.5, cfg.image_size)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), px)
    hidden, pooled = jax.jit(model.apply)(variables, px)
    assert hidden.shape == (2, (28 // 14) ** 2 + 1, 32)
    assert pooled.shape == (2, 16)

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = {}
    for lname, ltree in params.items():
        if lname == "class_embedding":
            sd["vision_model.embeddings.class_embedding"] = ltree
        elif lname == "patch_embedding":
            sd["vision_model.embeddings.patch_embedding.weight"] = (
                np.transpose(ltree["kernel"], (3, 2, 0, 1)))  # HWIO->OIHW
        elif lname == "position_embedding":
            sd["vision_model.embeddings.position_embedding.weight"] = ltree
        elif lname in ("pre_layrnorm", "post_layernorm"):
            sd[f"vision_model.{lname}.weight"] = ltree["scale"]
            sd[f"vision_model.{lname}.bias"] = ltree["bias"]
        elif lname == "visual_projection":
            sd["visual_projection.weight"] = np.transpose(ltree["kernel"])
        elif lname.startswith("layers_"):
            li = lname.split("_")[1]
            for sub, st in ltree.items():
                if sub == "self_attn":
                    for proj, pt in st.items():
                        sd[f"vision_model.encoder.layers.{li}.self_attn.{proj}.weight"] = np.transpose(pt["kernel"])
                        sd[f"vision_model.encoder.layers.{li}.self_attn.{proj}.bias"] = pt["bias"]
                elif sub in ("fc1", "fc2"):
                    sd[f"vision_model.encoder.layers.{li}.mlp.{sub}.weight"] = np.transpose(st["kernel"])
                    sd[f"vision_model.encoder.layers.{li}.mlp.{sub}.bias"] = st["bias"]
                else:
                    sd[f"vision_model.encoder.layers.{li}.{sub}.weight"] = st["scale"]
                    sd[f"vision_model.encoder.layers.{li}.{sub}.bias"] = st["bias"]
    back = torch_convert.convert_clip_vision_state_dict(sd)
    trees_equal(params, back)
