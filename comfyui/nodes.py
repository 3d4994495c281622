"""ComfyUI nodes for mixdq_tpu — TPU-quantized SDXL-Turbo generation
inside a ComfyUI graph.

Mirrors the reference plugin's four nodes (kernels/mixdq.py:537+;
ComfyUI/README.md:45-57):

* MixdqTPULoadPipeline  — build pipeline + params for a model family
* MixdqTPUQuantize      — attach a quant config (backend, bit yamls)
* MixdqTPUGenerate      — quantized generation -> IMAGE
* MixdqTPUOriginGen     — FP baseline generation -> IMAGE

Nodes return ComfyUI IMAGE tensors (torch float [B,H,W,C] in [0,1]).
torch is only needed at the ComfyUI boundary.
"""

from __future__ import annotations

import os


class MixdqTPULoadPipeline:
    CATEGORY = "MixDQ-TPU"
    RETURN_TYPES = ("MIXDQ_PIPE",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "family": (["sdxl-turbo", "sdxl", "sd15", "tiny-sdxl"],),
            "params_path": ("STRING", {"default": ""}),
            "dtype": (["bfloat16", "float32"],),
        }}

    def load(self, family, params_path, dtype):
        import jax
        import jax.numpy as jnp
        from mixdq_tpu.pipelines.txt2img import Text2ImgPipeline

        dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        pipe = Text2ImgPipeline(family, dtype=dt)
        params = pipe.init_params(jax.random.PRNGKey(0))
        if params_path:
            from mixdq_tpu.quant.checkpoint import load_params
            params = load_params(params, params_path)
        return ({"pipe": pipe, "params": params},)


class MixdqTPUQuantize:
    CATEGORY = "MixDQ-TPU"
    RETURN_TYPES = ("MIXDQ_PIPE",)
    FUNCTION = "quantize"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "pipe": ("MIXDQ_PIPE",),
            "qparams_path": ("STRING", {"default": ""}),
            "backend": (["fake", "int8"],),
            "w_bits": ([8, 4, 2],),
            "a_bits": ([8],),
        }, "optional": {
            "weight_mp_yaml": ("STRING", {"default": ""}),
            "act_mp_yaml": ("STRING", {"default": ""}),
            "act_protect_yaml": ("STRING", {"default": ""}),
        }}

    def quantize(self, pipe, qparams_path, backend, w_bits, a_bits,
                 weight_mp_yaml="", act_mp_yaml="", act_protect_yaml=""):
        import yaml
        from mixdq_tpu.quant.checkpoint import load_qparams
        from mixdq_tpu.quant.core import QuantSpec
        from mixdq_tpu.quant.state import (QuantCtx, apply_bitwidth_config,
                                           protect_layers,
                                           quantizable_layers, uniform_ctrl)

        p, params = pipe["pipe"], pipe["params"]
        qparams = load_qparams(qparams_path)
        wq = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
        aq = QuantSpec(running_stat=True)
        names = quantizable_layers(params["unet"])
        ctrl = uniform_ctrl(names, w_bits=int(w_bits), a_bits=int(a_bits))
        if weight_mp_yaml:
            with open(weight_mp_yaml) as f:
                ctrl = apply_bitwidth_config(ctrl, yaml.safe_load(f), "weight")
        if act_protect_yaml:
            with open(act_protect_yaml) as f:
                ctrl = protect_layers(ctrl, yaml.safe_load(f), "act")
        if act_mp_yaml:
            with open(act_mp_yaml) as f:
                ctrl = apply_bitwidth_config(ctrl, yaml.safe_load(f), "act")
        ctx = QuantCtx(qparams=qparams, ctrl=ctrl, mode="fake", wq=wq,
                       aq=aq, bos_aware=True)
        out = dict(pipe)
        if backend == "int8":
            from mixdq_tpu.quant.deploy import (deploy_unet_ctx,
                                                prune_deployed_kernels)
            ctx = deploy_unet_ctx(p.unet, {"params": params["unet"]},
                                  qparams, ctrl, wq, aq, splits=p.splits)
            out["params"] = {**params, "unet": prune_deployed_kernels(
                params["unet"], ctx.deploy)}
        out["ctx"] = ctx
        return (out,)


def _generate(pipe_state, prompt, steps, seed, use_ctx):
    import jax
    import numpy as np
    from mixdq_tpu.quant.state import QuantCtx

    p = pipe_state["pipe"]
    ctx = pipe_state.get("ctx", QuantCtx()) if use_ctx else QuantCtx()
    out = p(pipe_state["params"], [prompt], jax.random.PRNGKey(seed),
            num_inference_steps=int(steps), ctx=ctx)
    import torch

    return torch.from_numpy(np.array(out.images, dtype=np.float32, copy=True))


class MixdqTPUGenerate:
    CATEGORY = "MixDQ-TPU"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "generate"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "pipe": ("MIXDQ_PIPE",),
            "prompt": ("STRING", {"multiline": True, "default": "a photo"}),
            "steps": ("INT", {"default": 1, "min": 1, "max": 50}),
            "seed": ("INT", {"default": 0}),
        }}

    def generate(self, pipe, prompt, steps, seed):
        return (_generate(pipe, prompt, steps, seed, use_ctx=True),)


class MixdqTPUOriginGen(MixdqTPUGenerate):
    FUNCTION = "generate"

    def generate(self, pipe, prompt, steps, seed):
        return (_generate(pipe, prompt, steps, seed, use_ctx=False),)


class MixdqTPUIntegral(MixdqTPUGenerate):
    """Combined compare node (the reference's ``MixdqIntegral``,
    kernels/mixdq.py): generates the SAME prompt/seed through both the
    quantized and the FP path and returns the two images side by side
    plus the pixel-MSE between them."""

    RETURN_TYPES = ("IMAGE", "STRING")
    RETURN_NAMES = ("images", "report")
    FUNCTION = "generate"

    def generate(self, pipe, prompt, steps, seed):
        import torch

        q = _generate(pipe, prompt, steps, seed, use_ctx=True)
        fp = _generate(pipe, prompt, steps, seed, use_ctx=False)
        mse = float(((q - fp) ** 2).mean())
        report = f"pixel MSE quant vs FP: {mse:.6f}"
        return (torch.cat([fp, q], dim=0), report)


NODE_CLASS_MAPPINGS = {
    "MixdqTPULoadPipeline": MixdqTPULoadPipeline,
    "MixdqTPUQuantize": MixdqTPUQuantize,
    "MixdqTPUGenerate": MixdqTPUGenerate,
    "MixdqTPUOriginGen": MixdqTPUOriginGen,
    "MixdqTPUIntegral": MixdqTPUIntegral,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "MixdqTPULoadPipeline": "MixDQ-TPU Load Pipeline",
    "MixdqTPUQuantize": "MixDQ-TPU Quantize",
    "MixdqTPUGenerate": "MixDQ-TPU Generate (quantized)",
    "MixdqTPUOriginGen": "MixDQ-TPU Generate (FP)",
    "MixdqTPUIntegral": "MixDQ-TPU Integral (quant vs FP compare)",
}
