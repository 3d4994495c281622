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


def _attend_codes(cst_ref, q, k, v, *, g, d, scale, row_chunk=0):
    """Shared tail: per-head softmax attention over lane-sliced q/k/v
    [T, g*d] followed by the to_out consumer's act-quantize. Returns the
    int8 act codes [Tq, g*d]. ``row_chunk`` > 0 tiles the Tq rows so the
    f32 logits tile stays [row_chunk, Tk] (the whole-block kernels hold
    weight panels + an int32 accumulator in the same VMEM budget)."""
    si = cst_ref[0]  # 1 / s_a of the to_out projection
    zp = cst_ref[1]  # to_out act zero point - 128
    Tq = q.shape[0]
    rc = row_chunk or Tq
    rows = []
    for r0 in range(0, Tq, rc):
        qr = jax.lax.slice_in_dim(q, r0, min(r0 + rc, Tq), axis=0)
        outs = []
        for i in range(g):  # g = heads per grid step (hpp 128-lane blocks)
            qi = jax.lax.slice_in_dim(qr, i * d, (i + 1) * d, axis=1)
            ki = jax.lax.slice_in_dim(k, i * d, (i + 1) * d, axis=1)
            vi = jax.lax.slice_in_dim(v, i * d, (i + 1) * d, axis=1)
            s = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale  # [rc, Tk]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), vi,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o = o / l  # [rc, d]
            outs.append(jnp.clip(jnp.round(o * si) + zp,
                                 cst_ref[2], cst_ref[3]))
        rows.append(jnp.concatenate(outs, axis=1))
    return (rows[0] if len(rows) == 1
            else jnp.concatenate(rows, axis=0)).astype(jnp.int8)


def _attend_quantize(cst_ref, q, k, v, o_ref, *, g, d, scale):
    o_ref[0] = _attend_codes(cst_ref, q, k, v, g=g, d=d, scale=scale)


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


def _sec_q_kernel(cst_ref, x_ref, wq_ref, sq_ref, bq_ref, k_ref, v_ref,
                  o_ref, *, g, d, scale):
    x = x_ref[0]  # [Tq, C_in] s8 codes (norm2 ln_quantize output)
    k = k_ref[0]
    acc = jax.lax.dot_general(x, wq_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    # same epilogue as qops.qlinear: (acc - bias0) * (s_w * s_a)
    q = ((acc.astype(jnp.float32) - bq_ref[...]) * sq_ref[...]).astype(k.dtype)
    _attend_quantize(cst_ref, q, k, v_ref[0], o_ref, g=g, d=d, scale=scale)


def _sec_q_pick_hpp(heads: int, d: int, Tq: int, Tk: int, C_in: int,
                    *offsets: int):
    """Largest heads-per-program W=128*hpp with every lane offset (k/v
    panels inside their source tensors) W-aligned, hpp | nj, and the grid
    step's resident set in VMEM. Returns 0 when nothing fits."""
    g = 128 // d
    nj = heads // g

    def vmem_est(h):
        w = 128 * h
        return (2 * Tq * C_in              # x codes block (+ twin)
                + 2 * C_in * w             # wq panel, dbl-buf (s8)
                + 6 * Tq * w               # q bf16 + f32 proj temp
                + 2 * 2 * 2 * Tk * w       # k/v blocks, dbl-buf (bf16)
                + 8 * Tq * Tk              # logits f32 s/p
                + 2 * Tq * w + 4 * Tq * w)  # s8 out (+ f32 temp)

    for h in range(nj, 0, -1):
        if nj % h == 0 \
                and all(off % (128 * h) == 0 for off in offsets) \
                and vmem_est(h) <= int(13.5 * 1024 * 1024):
            return h
    return 0


def sec_attention_q_ok(heads: int, head_dim: int, Tq: int, Tk: int,
                       C_in: int, *offsets: int) -> bool:
    """Static gate for the q-fused cross-attention kernel."""
    if head_dim > 128 or 128 % head_dim or Tq % 8 or Tq * Tk > 2**20:
        return False
    g = 128 // head_dim
    if heads % g or (heads * head_dim) % 128 or C_in % 128:
        return False
    return _sec_q_pick_hpp(heads, head_dim, Tq, Tk, C_in, *offsets) > 0


def sec_attention_q(
    x_codes: jnp.ndarray,  # [B, Tq, C_in] s8 (the norm2 ln_quantize output)
    wq_int8: jnp.ndarray,  # [C_in, C] to_q int8 weight
    wq_scale: jnp.ndarray,  # [C] f32 = s_w * s_a of the to_q entry
    bias0: jnp.ndarray,  # [C] f32 = zp_s * sum_K(wq_int8)
    k_src: jnp.ndarray,  # [B, Tk, >= k_off + C] bf16/f32 (e.g. to_kv output)
    v_src: jnp.ndarray,  # [B, Tk, >= v_off + C]
    out_scale_inv: jnp.ndarray,  # 0-d f32: 1 / to_out act scale
    out_zp_shifted: jnp.ndarray,  # 0-d f32: to_out act zero point - 128
    *,
    heads: int,
    head_dim: int,
    scale: float,  # softmax scale (head_dim ** -0.5)
    k_off: int = 0,
    v_off: int = 0,
    interpret: bool = False,
    clip: tuple = (-128.0, 127.0),
    hpp_override: int = 0,
) -> jnp.ndarray:
    """Cross-attention with the to_q projection folded IN: int8 q GEMM +
    dequant + MHA over the (BoS-protected, already-bf16) k/v panels +
    to_out act-quantize in ONE call. Deletes the separate to_q GEMM and
    its [Tq, C] bf16 HBM round-trip at every cross-attn site (60 sites
    at SDXL-Turbo 16x16/32x32). The reference runs projection and SDPA
    as separate torch calls (quant_block.py:628-652).

    NOT @jax.jit-decorated, like ``sec_attention_qkv``: nesting the call
    in its own jit produced pathological compiles (DESIGN_NOTES round-4
    findings); it is only ever called inside the jitted model."""
    B, Tq, C_in = x_codes.shape
    d = head_dim
    C = heads * d
    Tk = k_src.shape[1]
    assert wq_int8.shape == (C_in, C), (wq_int8.shape, C_in, C)
    assert sec_attention_q_ok(heads, d, Tq, Tk, C_in, k_off, v_off), (
        heads, d, Tq, Tk, C_in, k_off, v_off)
    g = 128 // d
    nj = heads // g
    hpp = hpp_override or _sec_q_pick_hpp(heads, d, Tq, Tk, C_in,
                                          k_off, v_off)
    W = 128 * hpp

    consts = jnp.stack([jnp.asarray(out_scale_inv, jnp.float32).reshape(()),
                        jnp.asarray(out_zp_shifted, jnp.float32).reshape(()),
                        jnp.float32(clip[0]), jnp.float32(clip[1])])
    s2 = wq_scale.reshape(1, C).astype(jnp.float32)
    b2 = bias0.reshape(1, C).astype(jnp.float32)
    grid = (B, nj // hpp)
    out = pl.pallas_call(
        functools.partial(_sec_q_kernel, g=g * hpp, d=d, scale=float(scale)),
        name="sec_attention_q",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Tq, C_in), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_in, W), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, W), lambda b, j: (b, 0, k_off // W + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, W), lambda b, j: (b, 0, v_off // W + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tq, W), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tq, C), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Tq * C_in * C + 4 * B * heads * Tq * Tk * d,
            bytes_accessed=(B * Tq * C_in + C_in * C + B * Tq * C
                            + 4 * B * Tk * C),
            transcendentals=B * heads * Tq * Tk),
        interpret=interpret,
    )(consts, x_codes, wq_int8, s2, b2, k_src, v_src)
    return out


def _ln_codes(h, g_ref, be_ref, cst_ref, *, eps):
    """In-kernel pre-LayerNorm + consumer act-quantize (the whole-block
    kernels' producer stage): same math as ``pallas_ln_quant._kernel``.
    ``cst_ref[4:8]`` = [x_scale_inv, x_zp_shifted, x_clip_lo, x_clip_hi]
    of the consumer projection's act quantizer."""
    xf = h.astype(jnp.float32)  # [T, C]
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...] + be_ref[...]
    q = jnp.round(y * cst_ref[4]) + cst_ref[5]
    return jnp.clip(q, cst_ref[6], cst_ref[7]).astype(jnp.int8)


def _pick_row_chunk(Tq: int, Tk: int) -> int:
    """Tq row tile for the whole-block kernels: halve until the f32
    logits tile [chunk, Tk] is <= 1 MB (s and p together ~2 MB)."""
    c = Tq
    while c > 8 and c % 2 == 0 and c * Tk * 4 > (1 << 20):
        c //= 2
    return c


def _out_proj_accumulate(j, nj, codes, wout_ref, so_ref, b0o_ref, bo_ref,
                         res_ref, o_ref, acc_ref):
    """Whole-block tail: accumulate this head-panel's contribution to the
    to_out projection (int8 MXU dot into an int32 scratch that lives
    across the head grid), and on the last panel apply the dequant
    epilogue ``(acc - bias0) * scale + bias + residual``."""
    part = jax.lax.dot_general(codes, wout_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(j == nj - 1)
    def _epilogue():
        out = (acc_ref[...].astype(jnp.float32) - b0o_ref[...]) * so_ref[...]
        if bo_ref is not None:
            out = out + bo_ref[...]
        if res_ref is not None:
            out = out + res_ref[0].astype(jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)


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


# ---------------------------------------------------------------------------
# Whole-block kernels: + to_out projection + bias + residual add
#
# At B=1 the transformer levels are op-latency bound (~700 surviving ops
# of 3-10 us across 70 blocks). Folding the to_out int8 GEMM, its bias,
# and the block residual add INTO the attention kernel removes one XLA
# GEMM fusion + its act-codes HBM round-trip per attention site (140
# sites). The contraction over the attention output's C dim rides the
# existing head-panel grid: each panel j contributes o_codes[:, jW:(j+1)W]
# @ w_out[jW:(j+1)W, :] into an int32 VMEM scratch that lives across the
# grid; the dequant epilogue runs on the last panel. Same integer math as
# the unfused qlinear (bias0 = zp * sum_K w_out sums over ALL K exactly
# once), so codes match the two-op chain bit-for-bit.
# The reference runs SDPA, out-proj, and the residual add as separate
# torch calls (quant_block.py:628-652); CUTLASS fuses epilogues into
# GEMMs but never across SDPA.
# ---------------------------------------------------------------------------


def _sec_qkv_out_kernel(cst_ref, x_ref, wq_ref, wk_ref, wv_ref,
                        sq_ref, bq_ref, sk_ref, bk_ref, sv_ref, bv_ref,
                        wout_ref, so_ref, b0o_ref, bo_ref, res_ref,
                        o_ref, acc_ref, *, g, d, scale, row_chunk):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    x = x_ref[0]

    def proj(w_ref, s_ref, b_ref):
        acc = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) - b_ref[...]) * s_ref[...]
        return y.astype(jnp.bfloat16)

    codes = _attend_codes(cst_ref, proj(wq_ref, sq_ref, bq_ref),
                          proj(wk_ref, sk_ref, bk_ref),
                          proj(wv_ref, sv_ref, bv_ref),
                          g=g, d=d, scale=scale, row_chunk=row_chunk)
    _out_proj_accumulate(j, nj, codes, wout_ref, so_ref, b0o_ref, bo_ref,
                         res_ref, o_ref, acc_ref)


def _sec_qkv_lnout_kernel(cst_ref, h_ref, g_ref, be_ref, wq_ref, wk_ref,
                          wv_ref, sq_ref, bq_ref, sk_ref, bk_ref, sv_ref,
                          bv_ref, wout_ref, so_ref, b0o_ref, bo_ref,
                          o_ref, acc_ref, codes_ref, *, g, d, scale,
                          row_chunk, eps):
    """LN-folded whole-block self-attention: the pre-LayerNorm + consumer
    act-quantize run in-kernel (once, on the first head panel, into a
    persistent s8 scratch); the raw block input doubles as the residual."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _produce():
        codes_ref[...] = _ln_codes(h_ref[0], g_ref, be_ref, cst_ref, eps=eps)

    x = codes_ref[...]

    def proj(w_ref, s_ref, b_ref):
        acc = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) - b_ref[...]) * s_ref[...]
        return y.astype(jnp.bfloat16)

    codes = _attend_codes(cst_ref, proj(wq_ref, sq_ref, bq_ref),
                          proj(wk_ref, sk_ref, bk_ref),
                          proj(wv_ref, sv_ref, bv_ref),
                          g=g, d=d, scale=scale, row_chunk=row_chunk)
    _out_proj_accumulate(j, nj, codes, wout_ref, so_ref, b0o_ref, bo_ref,
                         h_ref, o_ref, acc_ref)


def _sec_q_lnout_kernel(cst_ref, h_ref, g_ref, be_ref, wq_ref, sq_ref,
                        bq_ref, k_ref, v_ref, wout_ref, so_ref, b0o_ref,
                        bo_ref, o_ref, acc_ref, codes_ref, *, g, d, scale,
                        row_chunk, eps):
    """LN-folded whole-block cross-attention (see _sec_qkv_lnout_kernel)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _produce():
        codes_ref[...] = _ln_codes(h_ref[0], g_ref, be_ref, cst_ref, eps=eps)

    x = codes_ref[...]
    k = k_ref[0]
    acc = jax.lax.dot_general(x, wq_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    q = ((acc.astype(jnp.float32) - bq_ref[...]) * sq_ref[...]).astype(k.dtype)
    codes = _attend_codes(cst_ref, q, k, v_ref[0], g=g, d=d, scale=scale,
                          row_chunk=row_chunk)
    _out_proj_accumulate(j, nj, codes, wout_ref, so_ref, b0o_ref, bo_ref,
                         h_ref, o_ref, acc_ref)


def _block_consts(mid_scale_inv, mid_zp_shifted, clip, ln_args):
    """SMEM consts vector for the whole-block kernels: 4 to_out
    act-quantize entries, + 4 consumer-projection act-quantize entries in
    LN-folded mode."""
    vals = [jnp.asarray(mid_scale_inv, jnp.float32).reshape(()),
            jnp.asarray(mid_zp_shifted, jnp.float32).reshape(()),
            jnp.float32(clip[0]), jnp.float32(clip[1])]
    if ln_args is not None:
        _, _, x_si, x_zp, x_clip, _ = ln_args
        vals += [jnp.asarray(x_si, jnp.float32).reshape(()),
                 jnp.asarray(x_zp, jnp.float32).reshape(()),
                 jnp.float32(x_clip[0]), jnp.float32(x_clip[1])]
    return jnp.stack(vals)


def _sec_q_out_kernel(cst_ref, x_ref, wq_ref, sq_ref, bq_ref, k_ref, v_ref,
                      wout_ref, so_ref, b0o_ref, bo_ref, res_ref,
                      o_ref, acc_ref, *, g, d, scale, row_chunk):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    x = x_ref[0]
    k = k_ref[0]
    acc = jax.lax.dot_general(x, wq_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    q = ((acc.astype(jnp.float32) - bq_ref[...]) * sq_ref[...]).astype(k.dtype)
    codes = _attend_codes(cst_ref, q, k, v_ref[0], g=g, d=d, scale=scale,
                          row_chunk=row_chunk)
    _out_proj_accumulate(j, nj, codes, wout_ref, so_ref, b0o_ref, bo_ref,
                         res_ref, o_ref, acc_ref)


def _sec_qkv_out_pick_hpp(heads: int, d: int, T: int, C: int):
    """Heads-per-program for the self-attn whole-block kernel. Unlike the
    non-out variants the int32 accumulator + out/residual blocks are
    h-independent VMEM; the logits tile is bounded by _pick_row_chunk."""
    g = 128 // d
    nj = heads // g
    rc = _pick_row_chunk(T, T)

    def vmem_est(h):
        w = 128 * h
        return (2 * T * C                  # x codes block (+ twin)
                + 3 * 2 * C * w            # q/k/v weight panels, dbl-buf
                + 3 * 2 * T * w            # dequantized q/k/v (bf16)
                + 4 * T * w                # f32 proj temporary
                + 8 * rc * T               # logits f32 s/p (row-chunked)
                + T * w                    # o codes s8
                + 2 * w * C                # w_out panel, dbl-buf (s8)
                + 4 * T * C                # int32 accumulator scratch
                + 2 * 2 * T * C)           # out bf16 + residual block

    for h in range(nj, 0, -1):
        if nj % h == 0 and C % (128 * h) == 0 \
                and vmem_est(h) <= int(13.5 * 1024 * 1024):
            return h
    return 0


def sec_attention_qkv_out_ok(heads: int, head_dim: int, T: int,
                             C: int) -> bool:
    if head_dim > 128 or 128 % head_dim or T % 8:
        return False
    g = 128 // head_dim
    if heads % g or heads * head_dim != C or C % 128:
        return False
    return _sec_qkv_out_pick_hpp(heads, head_dim, T, C) > 0


def sec_attention_qkv_out(
    x_codes: jnp.ndarray,  # [B, T, C] s8 (the norm1 ln_quantize output)
    w_int8: jnp.ndarray,  # [C, 3C] fused qkv weight (q|k|v column panels)
    w_scale: jnp.ndarray,  # [3C] f32 = s_w * s_a of the to_qkv entry
    bias0: jnp.ndarray,  # [3C] f32
    mid_scale_inv: jnp.ndarray,  # 0-d f32: 1 / to_out act scale
    mid_zp_shifted: jnp.ndarray,  # 0-d f32: to_out act zero point - 128
    wout_int8: jnp.ndarray,  # [C, C] to_out int8 weight
    out_scale: jnp.ndarray,  # [C] f32 = s_w * s_a of the to_out entry
    out_bias0: jnp.ndarray,  # [C] f32
    out_bias: Optional[jnp.ndarray],  # [C] f32 (to_out.0 bias) or None
    residual: Optional[jnp.ndarray],  # [B, T, C] block residual or None
    *,
    heads: int,
    head_dim: int,
    scale: float,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    clip: tuple = (-128.0, 127.0),
    hpp_override: int = 0,
    ln_args=None,
) -> jnp.ndarray:
    """Whole-block self-attention: int8 qkv GEMM + MHA + to_out
    act-quantize + int8 to_out GEMM + bias + residual add in ONE call.
    Returns bf16 [B, T, C] (the transformer block's updated hidden
    states). NOT @jax.jit-decorated (DESIGN_NOTES round-4 findings).

    ``ln_args`` = (gamma, beta, x_scale_inv, x_zp_shifted, x_clip, eps):
    LN-folded mode — ``x_codes`` is then the RAW bf16 block input
    [B, T, C]; the pre-LayerNorm + consumer act-quantize run in-kernel
    and the same input doubles as the residual (``residual`` must be
    None). Removes the standalone ln_quantize op and its s8 codes HBM
    round-trip per site."""
    B, T, C = x_codes.shape
    d = head_dim
    assert w_int8.shape == (C, 3 * C), (w_int8.shape, C)
    assert wout_int8.shape == (C, C), (wout_int8.shape, C)
    assert sec_attention_qkv_out_ok(heads, d, T, C), (heads, d, T, C)
    g = 128 // d
    nj = heads // g
    hpp = hpp_override or _sec_qkv_out_pick_hpp(heads, d, T, C)
    W = 128 * hpp
    nw = C // W
    if ln_args is not None:
        assert residual is None, "LN-folded mode: the input IS the residual"
        assert x_codes.dtype != jnp.int8

    consts = _block_consts(mid_scale_inv, mid_zp_shifted, clip, ln_args)
    s2 = w_scale.reshape(1, 3 * C).astype(jnp.float32)
    b2 = bias0.reshape(1, 3 * C).astype(jnp.float32)
    wspec = lambda p: pl.BlockSpec((C, W), lambda b, j, p=p: (0, p * nw + j),
                                   memory_space=pltpu.VMEM)
    vspec = lambda p: pl.BlockSpec((1, W), lambda b, j, p=p: (0, p * nw + j),
                                   memory_space=pltpu.VMEM)
    cvec = lambda: pl.BlockSpec((1, C), lambda b, j: (0, 0),
                                memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, T, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), xspec]
    args = [consts, x_codes]
    if ln_args is not None:
        gamma, beta = ln_args[0], ln_args[1]
        in_specs += [cvec(), cvec()]
        args += [gamma.reshape(1, C).astype(jnp.float32),
                 beta.reshape(1, C).astype(jnp.float32)]
    in_specs += [
        wspec(0), wspec(1), wspec(2),
        vspec(0), vspec(0), vspec(1), vspec(1), vspec(2), vspec(2),
        # to_out weight: row panel j contributes codes[:, jW:(j+1)W] @
        # w_out[jW:(j+1)W, :]
        pl.BlockSpec((W, C), lambda b, j: (j, 0), memory_space=pltpu.VMEM),
        cvec(), cvec(),
    ]
    args += [w_int8, w_int8, w_int8, s2, b2, s2, b2, s2, b2,
             wout_int8, out_scale.reshape(1, C).astype(jnp.float32),
             out_bias0.reshape(1, C).astype(jnp.float32)]
    has_bias, has_res = out_bias is not None, residual is not None
    if has_bias:
        in_specs.append(cvec())
        args.append(out_bias.reshape(1, C).astype(jnp.float32))
    if has_res:
        in_specs.append(xspec)
        args.append(residual)

    rc = _pick_row_chunk(T, T)
    n_fixed = 14 if ln_args is None else 16
    scratch = [pltpu.VMEM((T, C), jnp.int32)]
    if ln_args is not None:
        scratch.append(pltpu.VMEM((T, C), jnp.int8))

    def kern(*refs):
        if ln_args is None:
            fixed = list(refs[:n_fixed])
            rest = list(refs[n_fixed:-2])
            o_r, acc_r = refs[-2], refs[-1]
            bo_r = rest.pop(0) if has_bias else None
            res_r = rest.pop(0) if has_res else None
            _sec_qkv_out_kernel(*fixed, bo_r, res_r, o_r, acc_r,
                                g=g * hpp, d=d, scale=float(scale),
                                row_chunk=rc)
        else:
            fixed = list(refs[:n_fixed])
            rest = list(refs[n_fixed:-3])
            o_r, acc_r, codes_r = refs[-3], refs[-2], refs[-1]
            bo_r = rest.pop(0) if has_bias else None
            _sec_qkv_lnout_kernel(*fixed, bo_r, o_r, acc_r, codes_r,
                                  g=g * hpp, d=d, scale=float(scale),
                                  row_chunk=rc, eps=float(ln_args[5]))

    grid = (B, nj // hpp)
    out = pl.pallas_call(
        kern,
        name=("sec_attention_qkv_out" if ln_args is None
              else "sec_attention_qkv_lnout"),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, C), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), out_dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=(2 * B * T * C * 3 * C + 4 * B * heads * T * T * d
                   + 2 * B * T * C * C),
            bytes_accessed=(B * T * C + 4 * C * C + 3 * B * T * C),
            transcendentals=B * heads * T * T),
        interpret=interpret,
    )(*args)
    return out


def _sec_q_out_pick_hpp(heads: int, d: int, T: int, Tk: int, C_in: int,
                        *offsets: int):
    g = 128 // d
    nj = heads // g
    C = heads * d
    rc = _pick_row_chunk(T, Tk)

    def vmem_est(h):
        w = 128 * h
        return (2 * T * C_in               # x codes block (+ twin)
                + 2 * C_in * w             # wq panel, dbl-buf (s8)
                + 6 * T * w                # q bf16 + f32 proj temp
                + 2 * 2 * 2 * Tk * w       # k/v blocks, dbl-buf (bf16)
                + 8 * rc * Tk              # logits f32 s/p (row-chunked)
                + T * w                    # o codes s8
                + 2 * w * C                # w_out panel, dbl-buf (s8)
                + 4 * T * C                # int32 accumulator scratch
                + 2 * 2 * T * C)           # out bf16 + residual block

    for h in range(nj, 0, -1):
        if nj % h == 0 \
                and all(off % (128 * h) == 0 for off in offsets) \
                and vmem_est(h) <= int(13.5 * 1024 * 1024):
            return h
    return 0


def sec_attention_q_out_ok(heads: int, head_dim: int, Tq: int, Tk: int,
                           C_in: int, *offsets: int) -> bool:
    if head_dim > 128 or 128 % head_dim or Tq % 8:
        return False
    g = 128 // head_dim
    if heads % g or (heads * head_dim) % 128 or C_in % 128:
        return False
    return _sec_q_out_pick_hpp(heads, head_dim, Tq, Tk, C_in, *offsets) > 0


def sec_attention_q_out(
    x_codes: jnp.ndarray,  # [B, Tq, C_in] s8 (the norm2 ln_quantize output)
    wq_int8: jnp.ndarray,  # [C_in, C] to_q int8 weight
    wq_scale: jnp.ndarray,  # [C] f32
    bias0: jnp.ndarray,  # [C] f32
    k_src: jnp.ndarray,  # [B, Tk, >= k_off + C] bf16/f32 (to_kv output)
    v_src: jnp.ndarray,  # [B, Tk, >= v_off + C]
    mid_scale_inv: jnp.ndarray,  # 0-d f32: 1 / to_out act scale
    mid_zp_shifted: jnp.ndarray,  # 0-d f32
    wout_int8: jnp.ndarray,  # [C, C_in] to_out int8 weight
    out_scale: jnp.ndarray,  # [C_in] f32
    out_bias0: jnp.ndarray,  # [C_in] f32
    out_bias: Optional[jnp.ndarray],  # [C_in] f32 or None
    residual: Optional[jnp.ndarray],  # [B, Tq, C_in] or None
    *,
    heads: int,
    head_dim: int,
    scale: float,
    k_off: int = 0,
    v_off: int = 0,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    clip: tuple = (-128.0, 127.0),
    hpp_override: int = 0,
    ln_args=None,
) -> jnp.ndarray:
    """Whole-block cross-attention: int8 to_q GEMM + MHA over the
    (BoS-protected) k/v panels + to_out act-quantize + int8 to_out GEMM
    + bias + residual add in ONE call. Returns bf16 [B, Tq, C_in].
    NOT @jax.jit-decorated (DESIGN_NOTES round-4 findings).

    ``ln_args``: LN-folded mode, see ``sec_attention_qkv_out``."""
    B, Tq, C_in = x_codes.shape
    d = head_dim
    C = heads * d
    Tk = k_src.shape[1]
    assert wq_int8.shape == (C_in, C), (wq_int8.shape, C_in, C)
    assert wout_int8.shape == (C, C_in), (wout_int8.shape, C, C_in)
    assert sec_attention_q_out_ok(heads, d, Tq, Tk, C_in, k_off, v_off), (
        heads, d, Tq, Tk, C_in, k_off, v_off)
    g = 128 // d
    nj = heads // g
    hpp = hpp_override or _sec_q_out_pick_hpp(heads, d, Tq, Tk, C_in,
                                              k_off, v_off)
    W = 128 * hpp
    if ln_args is not None:
        assert residual is None, "LN-folded mode: the input IS the residual"
        assert x_codes.dtype != jnp.int8

    consts = _block_consts(mid_scale_inv, mid_zp_shifted, clip, ln_args)
    s2 = wq_scale.reshape(1, C).astype(jnp.float32)
    b2 = bias0.reshape(1, C).astype(jnp.float32)
    cvec = lambda: pl.BlockSpec((1, C_in), lambda b, j: (0, 0),
                                memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Tq, C_in), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), xspec]
    args = [consts, x_codes]
    if ln_args is not None:
        gamma, beta = ln_args[0], ln_args[1]
        in_specs += [cvec(), cvec()]
        args += [gamma.reshape(1, C_in).astype(jnp.float32),
                 beta.reshape(1, C_in).astype(jnp.float32)]
    in_specs += [
        pl.BlockSpec((C_in, W), lambda b, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, W), lambda b, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, W), lambda b, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tk, W), lambda b, j: (b, 0, k_off // W + j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tk, W), lambda b, j: (b, 0, v_off // W + j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((W, C_in), lambda b, j: (j, 0),
                     memory_space=pltpu.VMEM),
        cvec(), cvec(),
    ]
    args += [wq_int8, s2, b2, k_src, v_src,
             wout_int8, out_scale.reshape(1, C_in).astype(jnp.float32),
             out_bias0.reshape(1, C_in).astype(jnp.float32)]
    has_bias, has_res = out_bias is not None, residual is not None
    if has_bias:
        in_specs.append(cvec())
        args.append(out_bias.reshape(1, C_in).astype(jnp.float32))
    if has_res:
        in_specs.append(xspec)
        args.append(residual)

    rc = _pick_row_chunk(Tq, Tk)
    n_fixed = 10 if ln_args is None else 12
    scratch = [pltpu.VMEM((Tq, C_in), jnp.int32)]
    if ln_args is not None:
        scratch.append(pltpu.VMEM((Tq, C_in), jnp.int8))

    def kern(*refs):
        if ln_args is None:
            fixed = list(refs[:n_fixed])
            rest = list(refs[n_fixed:-2])
            o_r, acc_r = refs[-2], refs[-1]
            bo_r = rest.pop(0) if has_bias else None
            res_r = rest.pop(0) if has_res else None
            _sec_q_out_kernel(*fixed, bo_r, res_r, o_r, acc_r,
                              g=g * hpp, d=d, scale=float(scale),
                              row_chunk=rc)
        else:
            fixed = list(refs[:n_fixed])
            rest = list(refs[n_fixed:-3])
            o_r, acc_r, codes_r = refs[-3], refs[-2], refs[-1]
            bo_r = rest.pop(0) if has_bias else None
            _sec_q_lnout_kernel(*fixed, bo_r, o_r, acc_r, codes_r,
                                g=g * hpp, d=d, scale=float(scale),
                                row_chunk=rc, eps=float(ln_args[5]))

    grid = (B, nj // hpp)
    out = pl.pallas_call(
        kern,
        name=("sec_attention_q_out" if ln_args is None
              else "sec_attention_q_lnout"),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Tq, C_in), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tq, C_in), out_dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=(2 * B * Tq * C_in * C + 4 * B * heads * Tq * Tk * d
                   + 2 * B * Tq * C * C_in),
            bytes_accessed=(B * Tq * C_in + 2 * C_in * C + 4 * B * Tk * C
                            + 3 * B * Tq * C_in),
            transcendentals=B * heads * Tq * Tk),
        interpret=interpret,
    )(*args)
    return out
