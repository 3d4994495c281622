"""Whole-attention Pallas kernel for the int8_sec deploy path.

At SDXL-Turbo B=1 the XLA attention chain costs ~9 ops per site
(3 head-major transposes, QK^T einsum, softmax stat reduce + exp
fusion, PV einsum, output transpose, and the standalone to_out
act-quantize) and there are ~120 sites, most at T<=1024 where every op
is op-latency bound (~3-20 us). This kernel collapses the whole chain
into ONE custom call per attention:

* q/k/v are read straight out of the (fused) projection GEMM output via
  lane-block offsets — no ``jnp.split`` / transpose ops ever materialize.
  For head_dim d with 128 % d == 0, each grid program owns one 128-lane
  block = g = 128/d heads (d=64 -> 2 heads/program, the SDXL case).
* softmax runs in-register on the full [Tq, Tk] logits tile (these are
  the T<=1024 levels — the tile fits VMEM; T=4096 keeps the flash
  kernel, ``pallas_attention.py``).
* the output is written as the downstream ``to_out`` projection's int8
  activation codes (``round(o/s_a) + zp``), so the standalone
  act-quantize op disappears too — producer-side int8 emission, the
  attention-side counterpart of ``pallas_ln_quant`` / ``pallas_gn_quant``.

The reference never accelerates attention (its deployment path keeps
torch SDPA; q/k/v quantizers are simulation-only, quant_block.py:213-233)
— this is TPU-surface beyond parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attend_quantize(cst_ref, q, k, v, o_ref, *, g, d, scale):
    """Shared tail: per-head softmax attention over lane-sliced q/k/v
    [T, g*d] followed by the to_out consumer's act-quantize."""
    si = cst_ref[0]  # 1 / s_a of the to_out projection
    zp = cst_ref[1]  # to_out act zero point - 128
    outs = []
    for i in range(g):  # g = heads per grid step (hpp 128-lane blocks)
        qi = jax.lax.slice_in_dim(q, i * d, (i + 1) * d, axis=1)
        ki = jax.lax.slice_in_dim(k, i * d, (i + 1) * d, axis=1)
        vi = jax.lax.slice_in_dim(v, i * d, (i + 1) * d, axis=1)
        s = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale  # [Tq, Tk]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), vi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = o / l  # [Tq, d]
        outs.append(jnp.clip(jnp.round(o * si) + zp,
                             cst_ref[2], cst_ref[3]))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(jnp.int8)


def _sec_attention_kernel(cst_ref, q_ref, k_ref, v_ref, o_ref, *, g, d, scale):
    _attend_quantize(cst_ref, q_ref[0], k_ref[0], v_ref[0], o_ref,
                     g=g, d=d, scale=scale)


def sec_attention_ok(heads: int, head_dim: int, Tq: int, Tk: int,
                     *offsets: int) -> bool:
    """Static gate: lane-block head packing + VMEM logits-tile budget."""
    if head_dim > 128 or 128 % head_dim:
        return False
    g = 128 // head_dim
    if heads % g:
        return False
    if any(off % 128 for off in offsets):
        return False
    # full [Tq, Tk] f32 logits tile must fit VMEM (~4 MB each for s/p at
    # T=1024); larger goes to the flash kernel
    return Tq * Tk <= 2**20 and Tq % 8 == 0


@functools.partial(jax.jit, static_argnames=("heads", "head_dim", "q_off",
                                             "k_off", "v_off", "scale",
                                             "interpret", "clip"))
def sec_attention(
    q_src: jnp.ndarray,  # [B, Tq, >= q_off + heads*head_dim] bf16/f32
    k_src: jnp.ndarray,  # [B, Tk, >= k_off + heads*head_dim]
    v_src: jnp.ndarray,  # [B, Tk, >= v_off + heads*head_dim]
    scale_inv: jnp.ndarray,  # 0-d f32: 1 / to_out act scale
    zp_shifted: jnp.ndarray,  # 0-d f32: to_out act zero point - 128
    *,
    heads: int,
    head_dim: int,
    scale: float,  # softmax scale (head_dim ** -0.5)
    q_off: int = 0,
    k_off: int = 0,
    v_off: int = 0,
    interpret: bool = False,
    clip: tuple = (-128.0, 127.0),  # act_clip_range of the to_out entry
) -> jnp.ndarray:
    """Fused MHA + to_out act-quantize: returns int8 codes
    [B, Tq, heads*head_dim]. q/k/v live at lane offsets ``*_off`` inside
    their source tensors (e.g. a fused QKV projection output), read
    directly by the block index maps."""
    B, Tq = q_src.shape[0], q_src.shape[1]
    Tk = k_src.shape[1]
    d = head_dim
    assert sec_attention_ok(heads, d, Tq, Tk, q_off, k_off, v_off), (
        heads, d, Tq, Tk, q_off, k_off, v_off)
    g = 128 // d
    nj = heads // g

    # hpp = 128-lane head blocks per grid step. Per-grid-step fixed costs
    # (DMA waits, Mosaic prologue) dominate at small T — at T=256 the
    # whole attention is ~3 us of compute but ran as 10 grid steps of
    # ~1 us overhead each (measured 10.4 us/call, r4 profile). Batch as
    # many head blocks per step as VMEM allows; block-index addressing
    # needs every lane offset to stay block-aligned.
    def vmem_est(h):
        w = 128 * h
        return (2 * 2 * w * (Tq + 2 * Tk)     # q/k/v blocks, double-buffered
                + 2 * Tq * w                  # s8 out block (x2)
                + 8 * Tq * Tk + 2 * Tq * w * 4)  # logits f32 s/p + out f32
    hpp = 1
    for h in range(nj, 0, -1):
        if nj % h == 0 and vmem_est(h) <= 10 * 1024 * 1024 \
                and all(off % (128 * h) == 0
                        for off in (q_off, k_off, v_off)):
            hpp = h
            break
    W = 128 * hpp

    consts = jnp.stack([jnp.asarray(scale_inv, jnp.float32).reshape(()),
                        jnp.asarray(zp_shifted, jnp.float32).reshape(()),
                        jnp.float32(clip[0]), jnp.float32(clip[1])])
    grid = (B, nj // hpp)
    out = pl.pallas_call(
        functools.partial(_sec_attention_kernel, g=g * hpp, d=d,
                          scale=float(scale)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Tq, W), lambda b, j: (b, 0, q_off // W + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, W), lambda b, j: (b, 0, k_off // W + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, W), lambda b, j: (b, 0, v_off // W + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tq, W), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tq, heads * d), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * Tq * Tk * d,
            bytes_accessed=B * nj * 128 * (2 * Tq + 4 * Tk) + B * Tq * heads * d,
            transcendentals=B * heads * Tq * Tk),
        interpret=interpret,
    )(consts, q_src, k_src, v_src)
    return out


def _sec_qkv_kernel(cst_ref, x_ref, wq_ref, wk_ref, wv_ref,
                    sq_ref, bq_ref, sk_ref, bk_ref, sv_ref, bv_ref,
                    o_ref, *, g, d, scale):
    x = x_ref[0]  # [T, C] s8 codes (shared across the head grid)

    def proj(w_ref, s_ref, b_ref):
        # same epilogue as qops.qlinear: (acc - bias0) * (s_w * s_a)
        acc = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) - b_ref[...]) * s_ref[...]
        return y.astype(jnp.bfloat16)  # [T, W]

    _attend_quantize(cst_ref, proj(wq_ref, sq_ref, bq_ref),
                     proj(wk_ref, sk_ref, bk_ref),
                     proj(wv_ref, sv_ref, bv_ref), o_ref,
                     g=g, d=d, scale=scale)


def _sec_qkv_pick_hpp(heads: int, d: int, T: int, C: int):
    """Largest heads-per-program W=128*hpp such that W divides C (the
    three weight column panels sit at offsets 0/C/2C, so block-index
    addressing needs C % W == 0), hpp divides nj, and the grid step's
    resident set fits VMEM. Returns 0 when nothing fits."""
    g = 128 // d
    nj = heads // g

    def vmem_est(h):
        w = 128 * h
        return (2 * T * C                  # x codes block (+ twin)
                + 3 * 2 * C * w            # q/k/v weight panels, dbl-buf
                + 3 * 2 * T * w            # dequantized q/k/v (bf16)
                + 3 * 4 * T * w            # f32 proj temporaries
                + 8 * T * T                # logits f32 s/p
                + 2 * T * w + 4 * T * w)   # s8 out (+f32 temp)

    # 13.5 MB: the T=1024 C=640 level estimates 13.3 MB and compiles
    # (the logits s/p f32 pair dominates; the non-fused kernel ships the
    # same footprint there) — the estimate is conservative vs Mosaic's
    # actual liveness
    for h in range(nj, 0, -1):
        if nj % h == 0 and C % (128 * h) == 0 \
                and vmem_est(h) <= int(13.5 * 1024 * 1024):
            return h
    return 0


def sec_attention_qkv_ok(heads: int, head_dim: int, T: int, C: int) -> bool:
    """Static gate for the qkv-fused self-attention kernel."""
    if head_dim > 128 or 128 % head_dim or T % 8 or T * T > 2**20:
        return False
    g = 128 // head_dim
    if heads % g or heads * head_dim != C or C % 128:
        return False
    return _sec_qkv_pick_hpp(heads, head_dim, T, C) > 0


def sec_attention_qkv(
    x_codes: jnp.ndarray,  # [B, T, C] s8 (the norm1 ln_quantize output)
    w_int8: jnp.ndarray,  # [C, 3C] fused qkv weight (q|k|v column panels)
    w_scale: jnp.ndarray,  # [3C] f32 = s_w * s_a of the to_qkv entry
    bias0: jnp.ndarray,  # [3C] f32 = zp_s * sum_K(w_int8)
    out_scale_inv: jnp.ndarray,  # 0-d f32: 1 / to_out act scale
    out_zp_shifted: jnp.ndarray,  # 0-d f32: to_out act zero point - 128
    *,
    heads: int,
    head_dim: int,
    scale: float,  # softmax scale (head_dim ** -0.5)
    interpret: bool = False,
    clip: tuple = (-128.0, 127.0),
    hpp_override: int = 0,
) -> jnp.ndarray:
    """Self-attention with the fused QKV projection folded IN: int8 GEMM

    NOT @jax.jit-decorated (unlike its siblings): nesting this call in
    its own jit made the surrounding XLA program treat the kernel
    pathologically (compiles of minutes, ~100x execution time —
    bisected to the decoration itself, bench_logs/r4 probes 1-5); it is
    only ever called inside the jitted model, where inline tracing is
    free anyway.

    (q/k/v panels) + dequant + MHA + to_out act-quantize in ONE call.

    Removes the separate to_qkv GEMM and its [T, 3C] bf16 HBM round-trip
    (measured 8 us GEMM + 8.3 us attention per site at the SDXL-Turbo
    16x16 level vs ~9 us fused; 60 self-attn sites there). The reference
    runs projection and SDPA as separate torch calls
    (quant_block.py:628-652)."""
    B, T, C = x_codes.shape
    d = head_dim
    assert w_int8.shape == (C, 3 * C), (w_int8.shape, C)
    assert sec_attention_qkv_ok(heads, d, T, C), (heads, d, T, C)
    g = 128 // d
    nj = heads // g
    hpp = hpp_override or _sec_qkv_pick_hpp(heads, d, T, C)
    W = 128 * hpp
    nw = C // W  # weight panel stride in W-blocks

    consts = jnp.stack([jnp.asarray(out_scale_inv, jnp.float32).reshape(()),
                        jnp.asarray(out_zp_shifted, jnp.float32).reshape(()),
                        jnp.float32(clip[0]), jnp.float32(clip[1])])
    s2 = w_scale.reshape(1, 3 * C).astype(jnp.float32)
    b2 = bias0.reshape(1, 3 * C).astype(jnp.float32)
    wspec = lambda p: pl.BlockSpec((C, W), lambda b, j, p=p: (0, p * nw + j),
                                   memory_space=pltpu.VMEM)
    vspec = lambda p: pl.BlockSpec((1, W), lambda b, j, p=p: (0, p * nw + j),
                                   memory_space=pltpu.VMEM)
    grid = (B, nj // hpp)
    out = pl.pallas_call(
        functools.partial(_sec_qkv_kernel, g=g * hpp, d=d,
                          scale=float(scale)),
        name="sec_attention_qkv",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(0), wspec(1), wspec(2),
            vspec(0), vspec(0), vspec(1), vspec(1), vspec(2), vspec(2),
        ],
        out_specs=pl.BlockSpec((1, T, W), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * C * 3 * C + 4 * B * heads * T * T * d,
            bytes_accessed=B * T * C * 2 + 3 * C * C,
            transcendentals=B * heads * T * T),
        interpret=interpret,
    )(consts, x_codes, w_int8, w_int8, w_int8, s2, b2, s2, b2, s2, b2)
    return out
