"""Cross-framework numerical parity: torch modules (real HF transformers
for CLIP; hand-built torch blocks with diffusers naming + forward
semantics for UNet/VAE pieces) vs our flax models through the state-dict
converters.

This exercises every converter layout rule FORWARD (not just roundtrip):
conv OIHW->HWIO with padding/stride, linear [out,in]->[in,out], norm
weight->scale, embeddings — the cross-check the reference implies with
kernels/convert_ckpt.py:17-46 + its visual verification flow
(kernels/README.md:59-64).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mixdq_tpu.models.configs import CLIPTextConfig  # noqa: E402
from mixdq_tpu.quant.state import FP_CTX, QuantCtx  # noqa: E402
from mixdq_tpu.utils import torch_convert  # noqa: E402

pytestmark = pytest.mark.slow  # builds models / runs e2e (minutes on CPU)

EXACT_GELU_CTX = QuantCtx(gelu="exact")  # torch F.gelu default is erf


def t2n(t):
    return t.detach().cpu().numpy()


def sd_numpy(module):
    return {k: t2n(v) for k, v in module.state_dict().items()}


# --------------------------------------------------------------------------
# CLIP text tower vs the real HF transformers implementation
# --------------------------------------------------------------------------


def test_clip_text_parity_vs_transformers():
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=77, projection_dim=16,
        hidden_act="quick_gelu", eos_token_id=2)
    torch.manual_seed(0)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    ids_t = torch.randint(3, hf_cfg.vocab_size, (2, 77))
    with torch.no_grad():
        out = hf(ids_t, output_hidden_states=True)

    from mixdq_tpu.models.clip import CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_layers=3,
        num_heads=4, max_position_embeddings=77, projection_dim=16,
        hidden_act="quick_gelu")
    model = CLIPTextModel(cfg)
    params = torch_convert.convert_clip_state_dict(sd_numpy(hf))
    ids = jnp.asarray(ids_t.numpy())
    last, penult, pooled = jax.jit(model.apply)({"params": params}, ids)

    np.testing.assert_allclose(np.asarray(last),
                               t2n(out.last_hidden_state),
                               rtol=2e-5, atol=2e-5)
    # penultimate hidden state (clip-skip input, HF hidden_states[-2])
    np.testing.assert_allclose(np.asarray(penult),
                               t2n(out.hidden_states[-2]),
                               rtol=2e-5, atol=2e-5)
    # pooled projection (SDXL's pooled text embedding path)
    np.testing.assert_allclose(np.asarray(pooled), t2n(out.text_embeds),
                               rtol=2e-5, atol=2e-5)


def test_clip_text_parity_gelu_tower():
    """OpenCLIP-bigG-style tower (hidden_act='gelu', the SDXL second
    encoder's activation) against HF."""
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=77, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, projection_dim=24, hidden_act="gelu",
        eos_token_id=2)
    torch.manual_seed(1)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    ids_t = torch.randint(3, hf_cfg.vocab_size, (1, 77))
    with torch.no_grad():
        out = hf(ids_t)

    from mixdq_tpu.models.clip import CLIPTextModel

    cfg = CLIPTextConfig(vocab_size=77, hidden_size=24, intermediate_size=48,
                         num_layers=2, num_heads=2,
                         max_position_embeddings=77, projection_dim=24,
                         hidden_act="gelu")
    params = torch_convert.convert_clip_state_dict(sd_numpy(hf))
    last, _, pooled = jax.jit(CLIPTextModel(cfg).apply)(
        {"params": params}, jnp.asarray(ids_t.numpy()))
    np.testing.assert_allclose(np.asarray(last),
                               t2n(out.last_hidden_state),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), t2n(out.text_embeds),
                               rtol=2e-5, atol=2e-5)


# --------------------------------------------------------------------------
# UNet blocks vs hand-built torch modules (diffusers naming + semantics)
# --------------------------------------------------------------------------


class TorchResnetBlock(torch.nn.Module):
    """diffusers ResnetBlock2D forward semantics (the graph the reference
    wraps at quant_block.py:59-170)."""

    def __init__(self, cin, cout, ctemb, groups=8):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = torch.nn.Linear(ctemb, cout)
        self.norm2 = torch.nn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (torch.nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        res = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return res + h


def test_resnet_block_torch_parity():
    from mixdq_tpu.models.resnet import ResnetBlock2D

    torch.manual_seed(0)
    tb = TorchResnetBlock(16, 24, 32).eval()
    x_t = torch.randn(2, 16, 8, 8)
    temb_t = torch.randn(2, 32)
    with torch.no_grad():
        y_t = tb(x_t, temb_t)

    # route through the UNet converter with a real qualified prefix
    sd = {f"down_blocks.0.resnets.0.{k}": v for k, v in sd_numpy(tb).items()}
    tree = torch_convert.convert_unet_state_dict(sd)
    params = tree["down_blocks_0"]["resnets_0"]

    blk = ResnetBlock2D(in_channels=16, out_channels=24, temb_channels=32,
                        groups=8)
    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    y = jax.jit(blk.apply)({"params": params}, x, jnp.asarray(temb_t.numpy()),
                           FP_CTX)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2),
                               t2n(y_t), rtol=2e-5, atol=2e-5)


class TorchAttention(torch.nn.Module):
    def __init__(self, dim, heads, head_dim, cross_dim=None):
        super().__init__()
        inner = heads * head_dim
        kv = cross_dim or dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = torch.nn.Linear(dim, inner, bias=False)
        self.to_k = torch.nn.Linear(kv, inner, bias=False)
        self.to_v = torch.nn.Linear(kv, inner, bias=False)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(inner, dim)])

    def forward(self, x, ehs=None):
        kv = ehs if ehs is not None else x
        B, T, _ = x.shape
        q = self.to_q(x).view(B, T, self.heads, self.head_dim).transpose(1, 2)
        k = self.to_k(kv).view(B, kv.shape[1], self.heads,
                               self.head_dim).transpose(1, 2)
        v = self.to_v(kv).view(B, kv.shape[1], self.heads,
                               self.head_dim).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(B, T, -1)
        return self.to_out[0](o)


class TorchGEGLU(torch.nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = torch.nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TorchTransformerBlock(torch.nn.Module):
    """diffusers BasicTransformerBlock semantics (quant_block.py:174-396)."""

    def __init__(self, dim, heads, head_dim, cross_dim):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn1 = TorchAttention(dim, heads, head_dim)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, heads, head_dim, cross_dim)
        self.norm3 = torch.nn.LayerNorm(dim)
        self.ff = torch.nn.Module()
        self.ff.net = torch.nn.ModuleList([
            TorchGEGLU(dim, dim * 4), torch.nn.Identity(),
            torch.nn.Linear(dim * 4, dim)])

    def forward(self, x, ehs):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ehs)
        h = self.norm3(x)
        h = self.ff.net[2](self.ff.net[0](h))
        return x + h


def test_transformer_block_torch_parity():
    from mixdq_tpu.models.attention import BasicTransformerBlock

    dim, heads, head_dim, cross = 16, 2, 8, 12
    torch.manual_seed(0)
    tb = TorchTransformerBlock(dim, heads, head_dim, cross).eval()
    x_t = torch.randn(2, 9, dim)
    ehs_t = torch.randn(2, 5, cross)
    with torch.no_grad():
        y_t = tb(x_t, ehs_t)

    prefix = "down_blocks.1.attentions.0.transformer_blocks.0."
    sd = {prefix + k: v for k, v in sd_numpy(tb).items()}
    tree = torch_convert.convert_unet_state_dict(sd)
    params = (tree["down_blocks_1"]["attentions_0"]["transformer_blocks_0"])

    blk = BasicTransformerBlock(dim, heads, head_dim, cross)
    y = jax.jit(blk.apply)(
        {"params": params}, jnp.asarray(x_t.numpy()),
        jnp.asarray(ehs_t.numpy()), EXACT_GELU_CTX)
    np.testing.assert_allclose(np.asarray(y), t2n(y_t),
                               rtol=2e-5, atol=2e-5)


def test_downsample_upsample_torch_parity():
    from mixdq_tpu.models.resnet import Downsample2D, Upsample2D

    torch.manual_seed(0)
    conv_d = torch.nn.Conv2d(8, 8, 3, stride=2, padding=1).eval()
    conv_u = torch.nn.Conv2d(8, 8, 3, padding=1).eval()
    x_t = torch.randn(1, 8, 6, 6)
    with torch.no_grad():
        y_d = conv_d(x_t)
        y_u = conv_u(F.interpolate(x_t, scale_factor=2, mode="nearest"))

    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))

    sd = {f"down_blocks.0.downsamplers.0.conv.{k}": v
          for k, v in sd_numpy(conv_d).items()}
    p = torch_convert.convert_unet_state_dict(sd)
    y = jax.jit(Downsample2D(8).apply)(
        {"params": p["down_blocks_0"]["downsamplers_0"]["conv"]
         and p["down_blocks_0"]["downsamplers_0"]}, x, FP_CTX)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2),
                               t2n(y_d), rtol=2e-5, atol=2e-5)

    sd = {f"up_blocks.0.upsamplers.0.conv.{k}": v
          for k, v in sd_numpy(conv_u).items()}
    p = torch_convert.convert_unet_state_dict(sd)
    y = jax.jit(Upsample2D(8).apply)(
        {"params": p["up_blocks_0"]["upsamplers_0"]}, x, FP_CTX)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2),
                               t2n(y_u), rtol=2e-5, atol=2e-5)


# --------------------------------------------------------------------------
# VAE decoder pieces through convert_vae_state_dict
# --------------------------------------------------------------------------


class TorchVAEResnet(torch.nn.Module):
    def __init__(self, cin, cout, groups=4):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = torch.nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (torch.nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        res = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return res + h


def test_vae_resnet_torch_parity():
    from mixdq_tpu.models.vae import VAEResnetBlock

    torch.manual_seed(0)
    tb = TorchVAEResnet(8, 12).eval()
    x_t = torch.randn(1, 8, 6, 6)
    with torch.no_grad():
        y_t = tb(x_t)

    sd = {f"decoder.up_blocks.0.resnets.1.{k}": v
          for k, v in sd_numpy(tb).items()}
    tree = torch_convert.convert_vae_state_dict(sd)
    params = tree["decoder"]["up_blocks_0_resnets_1"]

    blk = VAEResnetBlock(out_channels=12, groups=4)
    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    y = jax.jit(blk.apply)({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2),
                               t2n(y_t), rtol=2e-5, atol=2e-5)
