"""Flash-attention Pallas kernels vs the einsum+softmax reference
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mixdq_tpu.ops.pallas_attention import (flash_attention, int8_mha,
                                            int8_flash_attention, mha,
                                            quantize_sym_dynamic)


def _ref_mha(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def test_flash_attention_matches_einsum():
    rng = np.random.RandomState(0)
    for (B, h, Tq, Tk, d) in [(2, 4, 200, 77, 64), (1, 2, 256, 256, 32)]:
        q = jnp.asarray(rng.randn(B, Tq, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(B, Tk, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(B, Tk, h, d), jnp.float32)
        got = mha(q, k, v, bq=128, bk=128, interpret=True)
        want = _ref_mha(q, k, v, d ** -0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-3)


def test_flash_attention_multi_kv_blocks():
    """Online-softmax recurrence across >1 kv block."""
    rng = np.random.RandomState(1)
    B, Tq, Tk, d = 1, 128, 512, 64
    q = jnp.asarray(rng.randn(B, Tq, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, Tk, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, Tk, d), jnp.float32)
    got = flash_attention(q, k, v, 0.125, bq=128, bk=128, interpret=True)
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * 0.125
    want = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(logits, axis=-1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-3)


def test_int8_flash_attention():
    rng = np.random.RandomState(2)
    B, h, T, d = 1, 2, 256, 64
    q = jnp.asarray(rng.randn(B, T, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, T, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, T, h, d), jnp.float32)
    got = int8_mha(q, k, v, bq=128, bk=128, out_dtype=jnp.float32,
                   interpret=True)
    want = _ref_mha(q, k, v, d ** -0.5)
    # int8 QK^T: logits quantization error passes through softmax
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05)


def test_int8qkv_flash_attention():
    """Fully-int8 flash (QK^T AND P@V on the int8 path) vs the fp
    reference: probs are 7-bit quantized, v per-tensor symmetric —
    error budget mirrors the reference's softmax/v act quantizers
    (quant_block.py:213-233)."""
    from mixdq_tpu.ops.pallas_attention import int8qkv_mha

    rng = np.random.RandomState(4)
    B, h, Tq, Tk, d = 1, 2, 256, 384, 64
    q = jnp.asarray(rng.randn(B, Tq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, Tk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, Tk, h, d), jnp.float32)
    got = int8qkv_mha(q, k, v, bq=128, bk=128, out_dtype=jnp.float32,
                      interpret=True)
    want = _ref_mha(q, k, v, d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.08)
    # SQNR sanity: the full-int8 path must stay well above 20 dB
    err = np.asarray(got) - np.asarray(want)
    sqnr = 10 * np.log10(np.mean(np.asarray(want) ** 2) /
                         max(np.mean(err ** 2), 1e-20))
    assert sqnr > 22.0, sqnr


def test_quantize_sym_dynamic_roundtrip():
    x = jnp.asarray(np.random.RandomState(3).randn(64, 32), jnp.float32)
    codes, s = quantize_sym_dynamic(x)
    assert codes.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(codes, np.float32) * float(s),
                               np.asarray(x), atol=float(s) * 0.51)


def test_attention_module_flash_matches_einsum():
    """The Attention module produces the same output under
    attn_impl='einsum' and 'flash' (flash falls back to einsum on CPU,
    so drive the kernel directly through mha in interpret mode above;
    here check the module plumbing accepts the ctx flag)."""
    from mixdq_tpu.models.attention import Attention
    from mixdq_tpu.quant.state import QuantCtx

    attn = Attention(query_dim=32, heads=2, head_dim=16)
    x = jnp.ones((1, 8, 32), jnp.float32)
    variables = attn.init(jax.random.PRNGKey(0), x, None)
    y0 = attn.apply(variables, x, None, QuantCtx())
    y1 = attn.apply(variables, x, None, QuantCtx(attn_impl="auto"))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
