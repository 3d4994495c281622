"""Pallas int8 MXU matmul with fused dequant epilogue.

Hand-written counterpart of the reference's CUTLASS EVT GEMM
(csrc/qlinear/cutlassGemm_withBias_optimalAlignment.cu:29-124: int8xint8
-> int32 accumulate, epilogue ``D = (Accum - bias0) * scale (+ bias)``
fused in-register). On TPU the MXU consumes int8 natively (v5e+); the
epilogue runs on the VPU over the f32-converted accumulator tile before
the single store to HBM — same fusion structure, no separate dequant
pass.

Grid: (M/BM, N/BN, K/BK), K innermost; the int32 accumulator lives in a
VMEM scratch tile that persists across the K steps of one (i, j) block
(double-buffered input tiles are handled by the Pallas pipeline).
Shapes must be tile-aligned — ``qmatmul`` pads and crops.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, bias0_ref, bias_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out = (acc_ref[:] - bias0_ref[:].astype(jnp.int32)).astype(jnp.float32)
        out = out * scale_ref[:]
        if bias_ref is not None:
            out = out + bias_ref[:]
        o_ref[:] = out.astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fit_block(dim: int, bmax: int, unit: int = 128) -> int:
    """Largest multiple of ``unit`` <= ``bmax`` that divides
    ``round_up(dim, unit)`` — a block size that tiles the dimension with
    NO padding. Padding an operand inside jit is an extra HBM copy per
    call; for weight operands under a sampler scan that re-pads the whole
    UNet's weights every step (measured 3x whole-model slowdown)."""
    dp = _round_up(dim, unit)
    for c in range(min(bmax, dp) // unit * unit, unit - 1, -unit):
        if dp % c == 0:
            return c
    return unit


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype",
                                             "interpret"))
def qmatmul(
    x_int8: jnp.ndarray,  # [M, K] int8
    w_int8: jnp.ndarray,  # [K, N] int8
    scale: jnp.ndarray,  # [N] f32 (= s_w * s_a)
    bias0: jnp.ndarray,  # [N] f32 (= zp_s * sum_K w)
    bias: Optional[jnp.ndarray] = None,  # [N] f32
    bm: int = 256,
    bn: int = 256,
    bk: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x_int8.shape
    K2, N = w_int8.shape
    assert K == K2
    bm = min(bm, _round_up(M, 32))
    bn = _fit_block(N, bn)  # no-padding tiles for the weight operand
    bk = _fit_block(K, bk)
    Mp, Np, Kp = _round_up(M, bm), _round_up(N, bn), _round_up(K, bk)
    if (Mp, Kp) != (M, K):
        x_int8 = jnp.pad(x_int8, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        w_int8 = jnp.pad(w_int8, ((0, Kp - K), (0, Np - N)))
    if Np != N:
        scale = jnp.pad(scale, (0, Np - N))
        bias0 = jnp.pad(bias0, (0, Np - N))
        if bias is not None:
            bias = jnp.pad(bias, (0, Np - N))

    grid = (Mp // bm, Np // bn, Kp // bk)
    vec_spec = pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        vec_spec, vec_spec,
    ]
    args = [x_int8, w_int8, scale.reshape(1, -1), bias0.reshape(1, -1)]
    if bias is not None:
        in_specs.append(vec_spec)
        args.append(bias.reshape(1, -1))

    out = pl.pallas_call(
        _kernel if bias is not None else _bias_none_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp + Kp * Np + Mp * Np * 2,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out[:M, :N]


def _bias_none_kernel(x_ref, w_ref, scale_ref, bias0_ref, o_ref, acc_ref):
    _kernel(x_ref, w_ref, scale_ref, bias0_ref, None, o_ref, acc_ref)


# ---------------------------------------------------------------------------
# Fused activation-quantize + int8 matmul
# ---------------------------------------------------------------------------


def _fused_kernel(x_ref, w_ref, qc_ref, scale_ref, bias0_ref, o_ref, acc_ref):
    """Quantize the bf16 activation tile to int8 codes in VMEM, then int8
    MXU dot — removes the separate per-layer quantize op (measured ~13%
    of the int8 UNet step as standalone clamp/convert fusions; the
    reference also runs quantize as its own kernel,
    quantize_kernel_vectorized.cu). qc = [scale_inv, zp_shifted] in SMEM."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    scale_inv = qc_ref[0]
    zp_s = qc_ref[1]
    codes = jnp.round(x_ref[:].astype(jnp.float32) * scale_inv) + zp_s
    codes = jnp.clip(codes, -128.0, 127.0).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        codes, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out = (acc_ref[:] - bias0_ref[:].astype(jnp.int32)).astype(jnp.float32)
        o_ref[:] = (out * scale_ref[:]).astype(o_ref.dtype)


def _fused2_kernel(x_ref, w_ref, qc_ref, scale_ref, bias0_ref, o_ref,
                   codes_ref, *, ck):
    """Act-quantize fused GEMM, v2 (round-2 redesign of ``_fused_kernel``).

    Grid is (M/bm, N/bn) with the FULL K dimension resident per block.
    The bf16 activation tile is quantized to int8 codes in VMEM scratch
    exactly once per M-tile (at j==0); for subsequent N-tiles the x block
    index is unchanged so the Pallas pipeline elides the re-fetch and the
    ``pl.when`` skips the re-quantize. This removes the two failure modes
    measured in v1 (DESIGN_NOTES.md: 3x slower in-model): the bf16 x tile
    was re-DMA'd for every (n, k) step and re-quantized per (m, k, n).

    HBM traffic: x read once (bf16), codes never round-trip HBM, w read
    M/bm times, out written once — strictly less than the unfused
    quantize+GEMM path (which adds an int8 write + read of the codes).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        scale_inv = qc_ref[0]
        zp_s = qc_ref[1]
        nchunks = x_ref.shape[1] // ck

        # chunked quantize: bounds the f32 temporaries to [bm, ck] (a
        # whole-tile quantize at K=5120 allocates >16MB of f32 stack)
        def body(c, carry):
            sl = pl.ds(c * ck, ck)
            codes = jnp.round(
                x_ref[:, sl].astype(jnp.float32) * scale_inv) + zp_s
            codes_ref[:, sl] = jnp.clip(codes, -128.0, 127.0).astype(jnp.int8)
            return carry

        jax.lax.fori_loop(0, nchunks, body, 0)

    acc = jax.lax.dot_general(
        codes_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = (acc - bias0_ref[:].astype(jnp.int32)).astype(jnp.float32)
    o_ref[:] = (out * scale_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "out_dtype",
                                             "interpret"))
def qmatmul_fused2(
    x: jnp.ndarray,  # [M, K] bf16/f32 activations (UNQUANTIZED)
    w_int8: jnp.ndarray,  # [K, N] int8
    scale_inv: jnp.ndarray,  # scalar 1/s_a
    zp_shifted: jnp.ndarray,  # scalar zp-128
    scale: jnp.ndarray,  # [N] s_w*s_a
    bias0: jnp.ndarray,  # [N] zp_s*sum_K(w)
    bm: int = 256,
    bn: int = 640,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Quantize-once-per-M-tile fused int8 GEMM (see ``_fused2_kernel``).

    K is unblocked (whole reduction per grid step); SDXL linear layers top
    out at K=5120, whose VMEM footprint at the default tiles is ~10 MB.
    For larger K, tiles shrink to fit."""
    M, K = x.shape
    K2, N = w_int8.shape
    assert K == K2
    Kp = _round_up(K, 128)
    # quantize chunk: largest 128-multiple divisor of Kp <= 1024
    ck = 128
    for d in range(min(Kp, 1024), 0, -128):
        if Kp % d == 0:
            ck = d
            break

    # fit VMEM: x is double-buffered bf16 (2x2B) + codes scratch (1B) per
    # M-tile; w tiles double-buffered (1B); out double-buffered (2B);
    # quantize f32 temporaries ~2 x [bm, ck] x 4B
    def _vmem(bm_, bn_):
        return (5 * bm_ * Kp + 2 * Kp * bn_ + 4 * bm_ * bn_
                + 8 * bm_ * ck)

    while bn > 256 and _vmem(bm, bn) > 11 * 2**20:
        bn //= 2
    while bm > 32 and _vmem(bm, bn) > 11 * 2**20:
        bm //= 2
    # no-padding block sizes (w padding inside jit is a per-step copy of
    # the whole weight under the sampler scan)
    bm = _fit_block(M, bm, 32 if M < 128 else 128)
    bn = _fit_block(N, bn)
    Mp, Np = _round_up(M, bm), _round_up(N, bn)
    if (Mp, Kp) != (M, K):
        # zero-pad: padded-K codes are zp_s but the matching w rows are 0
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        w_int8 = jnp.pad(w_int8, ((0, Kp - K), (0, Np - N)))
    if Np != N:
        scale = jnp.pad(scale, (0, Np - N))
        bias0 = jnp.pad(bias0, (0, Np - N))

    qc = jnp.stack([scale_inv.astype(jnp.float32).reshape(()),
                    zp_shifted.astype(jnp.float32).reshape(())])
    grid = (Mp // bm, Np // bn)
    vec_spec = pl.BlockSpec((1, bn), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused2_kernel, ck=ck),
        grid=grid,
        in_specs=[
            # x block index is constant in j -> fetched once per M-tile
            pl.BlockSpec((bm, Kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vec_spec, vec_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, Kp), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * 2 + (Mp // bm) * Kp * Np + Mp * Np * 2,
            transcendentals=0),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w_int8, qc, scale.reshape(1, -1),
      bias0.reshape(1, -1))
    return out[:M, :N]


# ---------------------------------------------------------------------------
# Fused GEGLU feed-forward: int8 GEMM + gate + consumer act-quantize
# ---------------------------------------------------------------------------


def _geglu_codes(x, wv_ref, wg_ref, qc_ref, sv_ref, b0v_ref, sg_ref,
                 b0g_ref, bv_ref, bg_ref, *, gelu_tanh, gate_mode="tanh"):
    """Both GEMM halves of one GEGLU output block (value columns j, gate
    columns H+j), dequant epilogues, the gate ``v * gelu(g)``, and the
    DOWNSTREAM (ff.net.2) layer's act-quantize. Returns the s8 codes.
    ``x`` is the s8 codes VALUE [bm, K] (callers read their ref)."""
    accv = jax.lax.dot_general(
        x, wv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    accg = jax.lax.dot_general(
        x, wg_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    v = (accv - b0v_ref[:].astype(jnp.int32)).astype(jnp.float32) * sv_ref[:]
    g = (accg - b0g_ref[:].astype(jnp.int32)).astype(jnp.float32) * sg_ref[:]
    if bv_ref is not None:
        v = v + bv_ref[:]
        g = g + bg_ref[:]
    # gate_mode (trace-time knob MIXDQ_GEGLU_GATE, models/layers.py):
    # 'tanh'/'exact' = the two gelu forms (ctx.gelu semantics);
    # 'sigmoid' = x*sigmoid(1.702x) (cheaper VPU chain, ~2e-2 max abs
    # deviation from tanh-gelu); 'none' = identity gate — a LATENCY
    # PROBE ONLY (wrong math) to attribute the kernel's VPU epilogue cost
    if gate_mode == "none":
        act = g
    elif gate_mode == "sigmoid":
        act = g * jax.nn.sigmoid(1.702 * g)
    else:
        act = jax.nn.gelu(g, approximate=gelu_tanh)
    y = v * act
    codes = jnp.round(y * qc_ref[0]) + qc_ref[1]
    return jnp.clip(codes, qc_ref[2], qc_ref[3]).astype(jnp.int8)


def _geglu_kernel(x_ref, wv_ref, wg_ref, qc_ref, sv_ref, b0v_ref, sg_ref,
                  b0g_ref, bv_ref, bg_ref, o_ref, *, gelu_tanh,
                  gate_mode="tanh"):
    """One grid step emits one block of the consumer's int8 act codes.
    The [M, 2H] bf16 projection output never exists: the unfused path
    writes it (5.2 MB at the 256-token level), re-reads it in the
    gate+quantize fusion, and writes the codes — all deleted here.
    qc = [scale_inv, zp_shifted, clip_lo, clip_hi] of the consumer's act
    quantizer (SMEM)."""
    o_ref[:] = _geglu_codes(x_ref[:], wv_ref, wg_ref, qc_ref, sv_ref,
                            b0v_ref, sg_ref, b0g_ref, bv_ref, bg_ref,
                            gelu_tanh=gelu_tanh, gate_mode=gate_mode)


def _geglu_kernel_nobias(x_ref, wv_ref, wg_ref, qc_ref, sv_ref, b0v_ref,
                         sg_ref, b0g_ref, o_ref, *, gelu_tanh,
                         gate_mode="tanh"):
    _geglu_kernel(x_ref, wv_ref, wg_ref, qc_ref, sv_ref, b0v_ref, sg_ref,
                  b0g_ref, None, None, o_ref, gelu_tanh=gelu_tanh,
                  gate_mode=gate_mode)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "out_dtype",
                                             "gelu_tanh", "gate_mode",
                                             "clip", "interpret"))
def geglu_qmatmul(
    x_int8: jnp.ndarray,  # [M, K] int8 codes of the proj layer
    w_int8: jnp.ndarray,  # [K, 2H] int8 (value cols [:H], gate cols [H:])
    scale: jnp.ndarray,  # [2H] f32 = s_w * s_a of the proj layer
    bias0: jnp.ndarray,  # [2H] f32 = zp_s * sum_K w
    out_scale_inv: jnp.ndarray,  # 0-d: 1/s_a of the CONSUMER (ff.net.2)
    out_zp_shifted: jnp.ndarray,  # 0-d: consumer zp - 128
    bias: Optional[jnp.ndarray] = None,  # [2H] f32 proj bias
    bm: int = 0,
    bn: int = 0,
    gelu_tanh: bool = True,
    gate_mode: str = "tanh",
    clip: tuple = (-128.0, 127.0),
    out_dtype=jnp.int8,
    interpret: bool = False,
) -> jnp.ndarray:
    """W8A8 GEGLU projection with fused gate + consumer act-quantize:
    returns the ff.net.2 input codes s8 [M, H] directly.

    TPU counterpart of the reference's FF chain, which runs proj GEMM,
    a separate chunk+gelu+mul, and the next layer's quantize kernel as
    distinct launches (nn/Linear.py:154-177 + torch eager gelu). K rides
    whole per grid step (SDXL FF proj K <= 1280)."""
    M, K = x_int8.shape
    K2, N2 = w_int8.shape
    assert K == K2 and N2 % 2 == 0
    H = N2 // 2
    Kp = _round_up(K, 128)
    # measured-best blocks on the SDXL FF shapes (bench_logs/
    # r4_geglu_tune.txt; revised by the r5 in-model A/B,
    # bench_logs/r5_geglu_ab.txt): small-M tiles want WIDE n-blocks
    # (weights stream once, fewer grid steps); M >= 512 wants the WHOLE
    # M as one tall block so the weight panels stream exactly once —
    # bm=256 at the M=1024 levels re-streamed weights 4x and cost 2.3%
    # of the whole UNet step (8.87 vs 9.07 ms). The r5 A/B also killed
    # two hypotheses: the in-kernel gelu gate is NOT the cost (identity-
    # gate probe: +0.6%), and the sigmoid form is slower than tanh.
    if not bm:
        bm = 256 if M <= 256 else 1024
    if not bn:
        bn = 1280 if M <= 256 else 512
    bm = _fit_block(M, bm, 32 if M < 128 else 128)
    bn = _fit_block(H, bn)
    Mp, Hp = _round_up(M, bm), _round_up(H, bn)
    if (Mp, Kp) != (M, K):
        # zero codes x zero w-rows contribute 0; bias0 covers real rows
        x_int8 = jnp.pad(x_int8, ((0, Mp - M), (0, Kp - K)))
    if Hp != H or Kp != K:
        # pad each half separately so the halves stay at offsets 0 / Hp
        wv = jnp.pad(w_int8[:, :H], ((0, Kp - K), (0, Hp - H)))
        wg = jnp.pad(w_int8[:, H:], ((0, Kp - K), (0, Hp - H)))
        w_int8 = jnp.concatenate([wv, wg], axis=1)
        pad1 = lambda a: jnp.pad(a.reshape(2, H), ((0, 0), (0, Hp - H)))\
            .reshape(-1)
        scale = pad1(scale)
        bias0 = pad1(bias0)
        if bias is not None:
            bias = pad1(bias)

    qc = jnp.stack([jnp.asarray(out_scale_inv, jnp.float32).reshape(()),
                    jnp.asarray(out_zp_shifted, jnp.float32).reshape(()),
                    jnp.float32(clip[0]), jnp.float32(clip[1])])
    nj = Hp // bn
    grid = (Mp // bm, nj)
    vspec = lambda off: pl.BlockSpec((1, bn), lambda i, j: (0, off + j),
                                     memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bm, Kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, bn), lambda i, j: (0, nj + j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        vspec(0), vspec(0), vspec(nj), vspec(nj),
    ]
    args = [x_int8, w_int8, w_int8, qc,
            scale.reshape(1, -1), bias0.reshape(1, -1),
            scale.reshape(1, -1), bias0.reshape(1, -1)]
    if bias is not None:
        in_specs += [vspec(0), vspec(nj)]
        args += [bias.reshape(1, -1), bias.reshape(1, -1)]
        kern = functools.partial(_geglu_kernel, gelu_tanh=gelu_tanh,
                                 gate_mode=gate_mode)
    else:
        kern = functools.partial(_geglu_kernel_nobias,
                                 gelu_tanh=gelu_tanh, gate_mode=gate_mode)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Hp), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * Hp * Kp,
            bytes_accessed=Mp * Kp + 2 * Kp * Hp + Mp * Hp,
            transcendentals=Mp * Hp),
        interpret=interpret,
    )(*args)
    return out[:M, :H]


# ---------------------------------------------------------------------------
# Whole-FF kernel: GEGLU + the ff.net.2 int8 GEMM + bias + residual add
# ---------------------------------------------------------------------------


def _geglu_out_kernel(x_ref, wv_ref, wg_ref, qc_ref, sv_ref, b0v_ref,
                      sg_ref, b0g_ref, w2_ref, s2_ref, b02_ref,
                      bv_ref, bg_ref, b2_ref, res_ref, o_ref, acc_ref, *,
                      gelu_tanh):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    codes = _geglu_codes(x_ref[:], wv_ref, wg_ref, qc_ref, sv_ref, b0v_ref,
                         sg_ref, b0g_ref, bv_ref, bg_ref,
                         gelu_tanh=gelu_tanh)
    part = jax.lax.dot_general(codes, w2_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(j == nj - 1)
    def _epilogue():
        out = (acc_ref[...].astype(jnp.float32) - b02_ref[:]) * s2_ref[:]
        if b2_ref is not None:
            out = out + b2_ref[:]
        if res_ref is not None:
            out = out + res_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def _geglu_lnout_kernel(h_ref, g_ref, be_ref, wv_ref, wg_ref, qc_ref,
                        sv_ref, b0v_ref, sg_ref, b0g_ref, w2_ref, s2_ref,
                        b02_ref, bv_ref, bg_ref, b2_ref, o_ref, acc_ref,
                        codes_ref, *, gelu_tanh, eps):
    """LN-folded whole-FF: the pre-LayerNorm + proj act-quantize run
    in-kernel (once per M-tile into a persistent s8 scratch); the raw
    block input doubles as the residual."""
    from .pallas_sec_attention import _ln_codes

    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _produce():
        codes_ref[...] = _ln_codes(h_ref[:], g_ref, be_ref, qc_ref, eps=eps)

    codes = _geglu_codes(codes_ref[...], wv_ref, wg_ref, qc_ref, sv_ref,
                         b0v_ref, sg_ref, b0g_ref, bv_ref, bg_ref,
                         gelu_tanh=gelu_tanh)
    part = jax.lax.dot_general(codes, w2_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(j == nj - 1)
    def _epilogue():
        out = (acc_ref[...].astype(jnp.float32) - b02_ref[:]) * s2_ref[:]
        if b2_ref is not None:
            out = out + b2_ref[:]
        out = out + h_ref[:].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def _geglu_out_pick(M: int, K: int, H: int, C: int):
    """(bm, bn) for the whole-FF kernel. Prefers bm = M (the ff.net.2
    weight then streams exactly once); bn follows the geglu tune."""
    Kp = _round_up(K, 128)
    bn0 = 1280 if M <= 256 else 512

    def vmem(bm_, bn_):
        return (2 * bm_ * Kp               # x codes block (+twin)
                + 2 * 2 * Kp * bn_         # value/gate weight panels, dbl
                + 12 * bm_ * bn_           # f32 v/g/y temporaries
                + bm_ * bn_                # s8 codes
                + 2 * bn_ * C              # w2 panel, dbl-buf (s8)
                + 4 * bm_ * C              # int32 accumulator scratch
                + 2 * 2 * bm_ * C)         # out bf16 + residual block

    for bm in [m for m in (M, 1024, 512, 256, 128, 64, 32) if m <= M]:
        for bn in (bn0, 512, 256):
            if vmem(bm, bn) <= 12 * 2**20:
                return bm, bn
    return 0, 0


def geglu_out_ok(M: int, K: int, H: int, C: int) -> bool:
    """Static gate for the whole-FF kernel."""
    if C % 128 or M < 8:
        return False
    return _geglu_out_pick(M, K, H, C)[0] > 0


def geglu_out_qmatmul(
    x_int8: jnp.ndarray,  # [M, K] int8 codes of the proj layer
    w_int8: jnp.ndarray,  # [K, 2H] int8 (value cols [:H], gate cols [H:])
    scale: jnp.ndarray,  # [2H] f32 = s_w * s_a of the proj layer
    bias0: jnp.ndarray,  # [2H] f32
    mid_scale_inv: jnp.ndarray,  # 0-d: 1/s_a of the consumer (ff.net.2)
    mid_zp_shifted: jnp.ndarray,  # 0-d: consumer zp - 128
    w2_int8: jnp.ndarray,  # [H, C] ff.net.2 int8 weight
    out_scale: jnp.ndarray,  # [C] f32 = s_w * s_a of ff.net.2
    out_bias0: jnp.ndarray,  # [C] f32
    bias: Optional[jnp.ndarray] = None,  # [2H] f32 proj bias
    out_bias: Optional[jnp.ndarray] = None,  # [C] f32 ff.net.2 bias
    residual: Optional[jnp.ndarray] = None,  # [M, C]
    gelu_tanh: bool = True,
    clip: tuple = (-128.0, 127.0),
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    ln_args=None,
) -> jnp.ndarray:
    """Whole feed-forward in ONE call: GEGLU projection int8 GEMMs + gate
    + the consumer act-quantize + the ff.net.2 int8 GEMM + bias + block
    residual add. Returns bf16 [M, C]. The net.2 contraction accumulates
    over the H-panel grid into an int32 VMEM scratch (same integer math
    as the unfused chain — bit-identical codes feed the same qlinear
    epilogue). The reference runs proj GEMM, eager gate, quantize, and
    the net.2 GEMM as four launches (nn/Linear.py:154-177).

    ``ln_args`` = (gamma, beta, x_scale_inv, x_zp_shifted, x_clip, eps):
    LN-folded mode — ``x_int8`` is then the RAW bf16 block input [M, K]
    (K == C required); the pre-LayerNorm + proj act-quantize run
    in-kernel and the same input doubles as the residual.

    NOT @jax.jit-decorated (DESIGN_NOTES round-4 nested-jit pathology)."""
    M, K = x_int8.shape
    K2, N2 = w_int8.shape
    assert K == K2 and N2 % 2 == 0
    H = N2 // 2
    H2, C = w2_int8.shape
    assert H2 == H, (H2, H)
    assert C % 128 == 0, C
    Kp = _round_up(K, 128)
    if ln_args is not None:
        assert residual is None, "LN-folded mode: the input IS the residual"
        assert x_int8.dtype != jnp.int8
        assert Kp == K and C == K, (K, C)
    bm, bn = _geglu_out_pick(M, K, H, C)
    assert bm > 0, (M, K, H, C)
    bm = _fit_block(M, bm, 32 if M < 128 else 128)
    bn = _fit_block(H, bn)
    Mp, Hp = _round_up(M, bm), _round_up(H, bn)
    if (Mp, Kp) != (M, K):
        x_int8 = jnp.pad(x_int8, ((0, Mp - M), (0, Kp - K)))
    if Hp != H or Kp != K:
        wv = jnp.pad(w_int8[:, :H], ((0, Kp - K), (0, Hp - H)))
        wg = jnp.pad(w_int8[:, H:], ((0, Kp - K), (0, Hp - H)))
        w_int8 = jnp.concatenate([wv, wg], axis=1)
        pad1 = lambda a: jnp.pad(a.reshape(2, H), ((0, 0), (0, Hp - H)))\
            .reshape(-1)
        scale = pad1(scale)
        bias0 = pad1(bias0)
        if bias is not None:
            bias = pad1(bias)
        # padded H columns emit the zp code, but their w2 rows are ZERO,
        # so they contribute nothing to the net.2 accumulation
        w2_int8 = jnp.pad(w2_int8, ((0, Hp - H), (0, 0)))
    if residual is not None and Mp != M:
        residual = jnp.pad(residual, ((0, Mp - M), (0, 0)))

    qvals = [jnp.asarray(mid_scale_inv, jnp.float32).reshape(()),
             jnp.asarray(mid_zp_shifted, jnp.float32).reshape(()),
             jnp.float32(clip[0]), jnp.float32(clip[1])]
    if ln_args is not None:
        _, _, x_si, x_zp, x_clip, _ = ln_args
        qvals += [jnp.asarray(x_si, jnp.float32).reshape(()),
                  jnp.asarray(x_zp, jnp.float32).reshape(()),
                  jnp.float32(x_clip[0]), jnp.float32(x_clip[1])]
    qc = jnp.stack(qvals)
    nj = Hp // bn
    grid = (Mp // bm, nj)
    vspec = lambda off: pl.BlockSpec((1, bn), lambda i, j: (0, off + j),
                                     memory_space=pltpu.VMEM)
    cvec = lambda: pl.BlockSpec((1, C), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((bm, Kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [xspec]
    args = [x_int8]
    if ln_args is not None:
        in_specs += [cvec(), cvec()]
        args += [ln_args[0].reshape(1, K).astype(jnp.float32),
                 ln_args[1].reshape(1, K).astype(jnp.float32)]
    in_specs += [
        pl.BlockSpec((Kp, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, bn), lambda i, j: (0, nj + j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        vspec(0), vspec(0), vspec(nj), vspec(nj),
        pl.BlockSpec((bn, C), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        cvec(), cvec(),
    ]
    args += [w_int8, w_int8, qc,
             scale.reshape(1, -1), bias0.reshape(1, -1),
             scale.reshape(1, -1), bias0.reshape(1, -1),
             w2_int8, out_scale.reshape(1, C).astype(jnp.float32),
             out_bias0.reshape(1, C).astype(jnp.float32)]
    has_b, has_b2, has_r = (bias is not None, out_bias is not None,
                            residual is not None)
    if has_b:
        in_specs += [vspec(0), vspec(nj)]
        args += [bias.reshape(1, -1), bias.reshape(1, -1)]
    if has_b2:
        in_specs.append(cvec())
        args.append(out_bias.reshape(1, C).astype(jnp.float32))
    if has_r:
        in_specs.append(pl.BlockSpec((bm, C), lambda i, j: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual)

    n_fixed = 11 if ln_args is None else 13
    scratch = [pltpu.VMEM((bm, C), jnp.int32)]
    if ln_args is not None:
        scratch.append(pltpu.VMEM((bm, Kp), jnp.int8))

    def kern(*refs):
        if ln_args is None:
            fixed = list(refs[:n_fixed])
            rest = list(refs[n_fixed:-2])
            o_r, acc_r = refs[-2], refs[-1]
            bv_r = rest.pop(0) if has_b else None
            bg_r = rest.pop(0) if has_b else None
            b2_r = rest.pop(0) if has_b2 else None
            res_r = rest.pop(0) if has_r else None
            _geglu_out_kernel(*fixed, bv_r, bg_r, b2_r, res_r, o_r, acc_r,
                              gelu_tanh=gelu_tanh)
        else:
            fixed = list(refs[:n_fixed])
            rest = list(refs[n_fixed:-3])
            o_r, acc_r, codes_r = refs[-3], refs[-2], refs[-1]
            bv_r = rest.pop(0) if has_b else None
            bg_r = rest.pop(0) if has_b else None
            b2_r = rest.pop(0) if has_b2 else None
            _geglu_lnout_kernel(*fixed, bv_r, bg_r, b2_r, o_r, acc_r,
                                codes_r, gelu_tanh=gelu_tanh,
                                eps=float(ln_args[5]))

    out = pl.pallas_call(
        kern,
        name=("geglu_out_qmatmul" if ln_args is None
              else "geglu_lnout_qmatmul"),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, C), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, C), out_dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * Hp * Kp + 2 * Mp * Hp * C,
            bytes_accessed=(Mp * Kp + 2 * Kp * Hp
                            + (Mp // bm) * Hp * C + 3 * Mp * C),
            transcendentals=Mp * Hp),
        interpret=interpret,
    )(*args)
    return out[:M]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype",
                                             "interpret"))
def qmatmul_fused(
    x: jnp.ndarray,  # [M, K] bf16/f32 activations (UNQUANTIZED)
    w_int8: jnp.ndarray,  # [K, N] int8
    scale_inv: jnp.ndarray,  # scalar 1/s_a
    zp_shifted: jnp.ndarray,  # scalar zp-128
    scale: jnp.ndarray,  # [N] s_w*s_a
    bias0: jnp.ndarray,  # [N] zp_s*sum_K(w)
    bm: int = 256,
    bn: int = 512,
    bk: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x.shape
    K2, N = w_int8.shape
    assert K == K2
    bm = min(bm, _round_up(M, 16))
    bn = min(bn, _round_up(N, 128))
    bk = min(bk, _round_up(K, 128))
    Mp, Np, Kp = _round_up(M, bm), _round_up(N, bn), _round_up(K, bk)
    if (Mp, Kp) != (M, K):
        # pad with zeros: quantized zero-pad contributes round(0)+zp_s per
        # code, exactly the bias0 correction's assumption for K-padding —
        # but padded K columns of w are 0, so their contribution is 0.
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        w_int8 = jnp.pad(w_int8, ((0, Kp - K), (0, Np - N)))
    if Np != N:
        scale = jnp.pad(scale, (0, Np - N))
        bias0 = jnp.pad(bias0, (0, Np - N))

    qc = jnp.stack([scale_inv.astype(jnp.float32).reshape(()),
                    zp_shifted.astype(jnp.float32).reshape(())])
    grid = (Mp // bm, Np // bn, Kp // bk)
    vec_spec = pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vec_spec, vec_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * 2 + Kp * Np + Mp * Np * 2,
            transcendentals=0),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w_int8, qc, scale.reshape(1, -1),
      bias0.reshape(1, -1))
    return out[:M, :N]
