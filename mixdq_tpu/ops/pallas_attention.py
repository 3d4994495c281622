"""Flash-attention Pallas kernels (bf16 and int8-QK^T variants).

The reference computes attention as explicit bmm + softmax + bmm with the
full [B*h, Tq, Tk] probability matrix materialized (quant_block.py:628-652
``head_to_batch_dim`` path). On TPU that costs three HBM passes over a
[B, h, Tq, Tk] f32 tensor per attention. These kernels keep the logits
tile-resident in VMEM with the standard online-softmax recurrence
(running max m, normalizer l, accumulator acc), writing only the [Tq, d]
output — the FlashAttention access pattern expressed for the MXU/VPU.

``int8_flash_attention`` additionally performs QK^T in int8 on the MXU
(per-tensor symmetric scales for q/k, supplied by the act_quantizer_q/k
calibration) and dequantizes the logit tile in-register — the real-quant
counterpart of the reference's simulation-only q/k/v quantizers
(quant_block.py:213-233; their deployment path never accelerates
attention).

Diffusion attention is unmasked and non-causal; ragged kv (the 77-token
text context padded to a 128 lane tile) is handled with an in-kernel
iota mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale, kv_len, bk, needs_mask):
    """Grid (B*h, Tq/bq, Tk/bk); online softmax over the innermost kv axis."""
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale  # [bq, bk]

    if needs_mask:
        # mask kv padding (e.g. 77 text tokens in a 128 tile). Static
        # skip when Tk is tile-aligned: at T=4096 the iota+compare+select
        # over every [bq, bk] f32 block is pure VPU waste (the kernel is
        # softmax/VPU-bound — r5_flash_ab_1024.txt).
        kv_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_pos < kv_len, s, _NEG_INF)

    m_prev = m_ref[:]  # [bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # [bq, bk]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "bq", "bk",
                                             "interpret"))
def flash_attention(
    q: jnp.ndarray,  # [BH, Tq, d]
    k: jnp.ndarray,  # [BH, Tk, d]
    v: jnp.ndarray,  # [BH, Tk, d]
    scale: float,
    bq: int = 512,
    bk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Unmasked flash attention over flattened (batch*heads) leading dim."""
    BH, Tq, d = q.shape
    Tk = k.shape[1]
    bq = min(bq, _round_up(Tq, 128))
    bk = min(bk, _round_up(Tk, 128))
    Tqp, Tkp = _round_up(Tq, bq), _round_up(Tk, bk)
    dp = _round_up(d, 128)
    if (Tqp, dp) != (Tq, d):
        q = jnp.pad(q, ((0, 0), (0, Tqp - Tq), (0, dp - d)))
    if (Tkp, dp) != (Tk, d):
        k = jnp.pad(k, ((0, 0), (0, Tkp - Tk), (0, dp - d)))
        v = jnp.pad(v, ((0, 0), (0, Tkp - Tk), (0, dp - d)))

    grid = (BH, Tqp // bq, Tkp // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=Tk, bk=bk,
                          needs_mask=Tkp != Tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Tqp, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Tqp * Tkp * dp,
            bytes_accessed=2 * BH * (Tqp * dp * 2 + 2 * Tkp * dp),
            transcendentals=BH * Tqp * Tkp),
        interpret=interpret,
    )(q, k, v)
    return out[:, :Tq, :d]


def mha(q, k, v, scale=None, bq=512, bk=1024, interpret=False):
    """[B, T, h, d] convenience wrapper (transposes through [B*h, T, d]).

    ``MIXDQ_FLASH_BQ``/``MIXDQ_FLASH_BK`` override the block sizes at
    trace time. Default bk=1024 from the r5 interleaved A/B at
    SDXL-1024 (bench_logs/r5_flashbk_ab.txt): 40.27 vs 44.65 ms/step
    whole-UNet (+10.9%) — the kernel is VPU-bound and doubling the kv
    block halves the online-softmax rescale passes (bk=2048: 1.094,
    bq=256: 1.072 — both worse than bq=512/bk=1024)."""
    import os

    bq = int(os.environ.get("MIXDQ_FLASH_BQ", bq))
    bk = int(os.environ.get("MIXDQ_FLASH_BK", bk))
    B, Tq, h, d = q.shape
    Tk = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    qf = q.transpose(0, 2, 1, 3).reshape(B * h, Tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(B * h, Tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(B * h, Tk, d)
    o = flash_attention(qf, kf, vf, float(scale), bq=bq, bk=bk,
                        interpret=interpret)
    return o.reshape(B, h, Tq, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# int8 QK^T flash attention
# ---------------------------------------------------------------------------


def _int8_flash_kernel(ls_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                       acc_ref, *, kv_len, bk):
    """Same recurrence; q/k arrive as int8 codes (symmetric per-tensor) and
    QK^T runs on the MXU's int8 path; ``ls_ref[0] = s_q*s_k*d^-0.5``
    (SMEM scalar — traced, so dynamic per-call quant scales don't
    recompile) dequantizes the int32 logit tile in-register."""
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s32 = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * ls_ref[0]

    kv_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kv_pos < kv_len, s, _NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "out_dtype",
                                             "interpret"))
def int8_flash_attention(
    q_int8: jnp.ndarray,  # [BH, Tq, d] int8 codes (symmetric)
    k_int8: jnp.ndarray,  # [BH, Tk, d] int8 codes (symmetric)
    v: jnp.ndarray,  # [BH, Tk, d] bf16/f32
    logit_scale,  # traced scalar: s_q * s_k * softmax_scale
    bq: int = 512,
    bk: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    BH, Tq, d = q_int8.shape
    Tk = k_int8.shape[1]
    bq = min(bq, _round_up(Tq, 128))
    bk = min(bk, _round_up(Tk, 128))
    Tqp, Tkp = _round_up(Tq, bq), _round_up(Tk, bk)
    dp = _round_up(d, 128)
    if (Tqp, dp) != (Tq, d):
        q_int8 = jnp.pad(q_int8, ((0, 0), (0, Tqp - Tq), (0, dp - d)))
    if (Tkp, dp) != (Tk, d):
        k_int8 = jnp.pad(k_int8, ((0, 0), (0, Tkp - Tk), (0, dp - d)))
        v = jnp.pad(v, ((0, 0), (0, Tkp - Tk), (0, dp - d)))

    ls = jnp.asarray(logit_scale, jnp.float32).reshape(1)
    grid = (BH, Tqp // bq, Tkp // bk)
    out = pl.pallas_call(
        functools.partial(_int8_flash_kernel, kv_len=Tk, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Tqp, dp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Tqp * Tkp * dp,
            bytes_accessed=BH * (Tqp * dp + Tkp * dp + 2 * Tkp * dp
                                 + 2 * Tqp * dp),
            transcendentals=BH * Tqp * Tkp),
        interpret=interpret,
    )(ls, q_int8, k_int8, v)
    return out[:, :Tq, :d]


def _int8qkv_flash_kernel(ls_ref, vs_ref, q_ref, k_ref, v_ref, o_ref,
                          m_ref, l_ref, acc_ref, *, kv_len, bk):
    """Fully-int8 flash recurrence: QK^T on the int8 MXU path
    (``ls_ref[0] = s_q*s_k*d^-0.5`` dequantizes the int32 logit tile),
    then the probability tile is re-quantized in-register to s8 codes
    (static scale 1/127 — probs live in [0, 1]) so P@V ALSO runs int8
    (v arrives as symmetric s8 codes; ``vs_ref[0] = s_v / 127``
    rescales the int32 partial products). The acc/l rescale stays f32,
    so the online-softmax recurrence is unchanged. This is the deploy
    counterpart of the reference's simulation-only softmax/v act
    quantizers (quant_block.py:213-233, always_zero softmax spec)."""
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s32 = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * ls_ref[0]

    kv_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kv_pos < kv_len, s, _NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = m_new
    pi = jnp.round(p * 127.0).astype(jnp.int8)  # p in [0,1] -> 7-bit codes
    pv = jax.lax.dot_general(pi, v_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    acc_ref[:] = acc_ref[:] * alpha + pv.astype(jnp.float32) * vs_ref[0]

    @pl.when(j == nj - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "out_dtype",
                                             "interpret"))
def int8qkv_flash_attention(
    q_int8: jnp.ndarray,  # [BH, Tq, d] int8 codes (symmetric)
    k_int8: jnp.ndarray,  # [BH, Tk, d] int8 codes (symmetric)
    v_int8: jnp.ndarray,  # [BH, Tk, d] int8 codes (symmetric)
    logit_scale,  # traced scalar: s_q * s_k * softmax_scale
    v_scale,  # traced scalar: s_v
    bq: int = 512,
    bk: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention with BOTH matmuls on the MXU int8 path."""
    BH, Tq, d = q_int8.shape
    Tk = k_int8.shape[1]
    bq = min(bq, _round_up(Tq, 128))
    bk = min(bk, _round_up(Tk, 128))
    Tqp, Tkp = _round_up(Tq, bq), _round_up(Tk, bk)
    dp = _round_up(d, 128)
    if (Tqp, dp) != (Tq, d):
        q_int8 = jnp.pad(q_int8, ((0, 0), (0, Tqp - Tq), (0, dp - d)))
    if (Tkp, dp) != (Tk, d):
        k_int8 = jnp.pad(k_int8, ((0, 0), (0, Tkp - Tk), (0, dp - d)))
        v_int8 = jnp.pad(v_int8, ((0, 0), (0, Tkp - Tk), (0, dp - d)))

    ls = jnp.asarray(logit_scale, jnp.float32).reshape(1)
    vs = (jnp.asarray(v_scale, jnp.float32) / 127.0).reshape(1)
    grid = (BH, Tqp // bq, Tkp // bk)
    out = pl.pallas_call(
        functools.partial(_int8qkv_flash_kernel, kv_len=Tk, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Tqp, dp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Tqp * Tkp * dp,
            bytes_accessed=BH * (Tqp * dp + 2 * Tkp * dp + 2 * Tqp * dp),
            transcendentals=BH * Tqp * Tkp),
        interpret=interpret,
    )(ls, vs, q_int8, k_int8, v_int8)
    return out[:, :Tq, :d]


def int8qkv_mha(q, k, v, scale=None, bq=512, bk=512,
                out_dtype=jnp.bfloat16, interpret=False):
    """[B, T, h, d] wrapper: dynamic-sym-quantize q/k/v, fully-int8
    flash (both MXU matmuls int8). The deploy default for large-T
    self-attention (SDXL-1024's T=4096 levels) on the int8 path —
    ~2x MXU throughput over the bf16 flash kernel."""
    B, Tq, h, d = q.shape
    Tk = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    qi, sq = quantize_sym_dynamic(q)
    ki, sk = quantize_sym_dynamic(k)
    vi, sv = quantize_sym_dynamic(v)
    qf = qi.transpose(0, 2, 1, 3).reshape(B * h, Tq, d)
    kf = ki.transpose(0, 2, 1, 3).reshape(B * h, Tk, d)
    vf = vi.transpose(0, 2, 1, 3).reshape(B * h, Tk, d)
    o = int8qkv_flash_attention(qf, kf, vf, sq * sk * scale, sv,
                                bq=bq, bk=bk, out_dtype=out_dtype,
                                interpret=interpret)
    return o.reshape(B, h, Tq, d).transpose(0, 2, 1, 3)


def quantize_sym_dynamic(x: jnp.ndarray):
    """Dynamic per-tensor symmetric int8 quantization: returns (codes,
    scale). Used for the real-quant attention path — q/k scales are
    computed per call (a cheap max-reduce over a [T, h*d] tensor) rather
    than calibrated, so no qparams plumbing is needed for attention."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0 + 1e-12
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return codes.astype(jnp.int8), s


def int8_mha(q, k, v, scale=None, bq=512, bk=512, out_dtype=jnp.bfloat16,
             interpret=False):
    """[B, T, h, d] wrapper: dynamic-sym-quantize q/k, int8 QK^T flash."""
    B, Tq, h, d = q.shape
    Tk = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    qi, sq = quantize_sym_dynamic(q)
    ki, sk = quantize_sym_dynamic(k)
    qf = qi.transpose(0, 2, 1, 3).reshape(B * h, Tq, d)
    kf = ki.transpose(0, 2, 1, 3).reshape(B * h, Tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(B * h, Tk, d)
    o = int8_flash_attention(qf, kf, vf, sq * sk * scale, bq=bq, bk=bk,
                             out_dtype=out_dtype, interpret=interpret)
    return o.reshape(B, h, Tq, d).transpose(0, 2, 1, 3)
