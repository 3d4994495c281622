"""Pallas weight-quantized matmul: bf16 activations x int8/int4 weights
with in-VMEM dequantization feeding the bf16 MXU.

Motivation (measured on the target TPU): the batch-1 UNet is weight-
bandwidth-bound; int8 MXU math is emulated/slow there, and an XLA-level
``(w_int.astype(bf16) * scale) @ x`` materializes the full bf16 weight
tensor to HBM (12+ GB of extra traffic for SDXL). This kernel streams
int8 (or packed int4) weight tiles from HBM, dequantizes them on the VPU
inside VMEM, and feeds the MXU in bf16 — weight HBM traffic drops 2x
(W8) / 4x (W4) versus bf16 weights, which is the whole speedup at
batch 1.

Epilogue: out = acc_f32 * 1.0 (+ bias) — the per-out-channel weight scale
is folded into the dequantized tile (w_tile * scale[N-tile]), so the
accumulator is already in real units.

Grid (M/BM, N/BN, K/BK), K innermost, f32 accumulator scratch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, bias_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # dequantize the weight tile in VMEM: int8 -> bf16 * per-N scale
    w = w_ref[:].astype(jnp.bfloat16) * scale_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:]
        if bias_ref is not None:
            out = out + bias_ref[:]
        o_ref[:] = out.astype(o_ref.dtype)


def _kernel_nobias(x_ref, w_ref, scale_ref, o_ref, acc_ref):
    _kernel(x_ref, w_ref, scale_ref, None, o_ref, acc_ref)


# ---------------------------------------------------------------------------
# Packed-int4 weights (two codes per byte)
# ---------------------------------------------------------------------------


def pack_w4_halves(w_int: jnp.ndarray) -> jnp.ndarray:
    """Pack int4 codes [K, N] (values in [-8, 7]) into uint8 [K//2, N]:
    low nibble = row k, high nibble = row k + K//2. The halves layout
    (vs pairwise interleave) lets the kernel unpack with two cheap
    nibble ops and two MXU dots — no sublane shuffles. K must be even."""
    K = w_int.shape[0]
    assert K % 2 == 0
    lo = (w_int[: K // 2].astype(jnp.int32) + 8).astype(jnp.uint8)
    hi = (w_int[K // 2 :].astype(jnp.int32) + 8).astype(jnp.uint8)
    return (lo | (hi << 4)).astype(jnp.uint8)


def _w4_kernel(x_lo_ref, x_hi_ref, w_ref, scale_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # nibble unpack in int32 lanes: current Mosaic cannot legalize i8
    # vector sub/shift ('arith.subi'/'arith.shrui' on vector<...xi8>)
    w = w_ref[:].astype(jnp.int32)
    w_lo = ((w & 0xF) - 8).astype(jnp.bfloat16)
    w_hi = ((w >> 4) - 8).astype(jnp.bfloat16)
    s = scale_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_lo_ref[:], w_lo * s,
                          preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(x_hi_ref[:], w_hi * s,
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype",
                                             "interpret"))
def wq4_matmul(
    x: jnp.ndarray,  # [M, K]
    w_packed: jnp.ndarray,  # [K//2, N] uint8 (pack_w4_halves layout)
    w_scale: jnp.ndarray,  # [N]
    bm: int = 256,
    bn: int = 512,
    bk: int = 256,  # packed-K tile (covers 2*bk logical rows)
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x.shape
    Kh, N = w_packed.shape
    assert K == 2 * Kh, (x.shape, w_packed.shape)
    from .pallas_qmatmul import _fit_block

    # block sizes that divide the (128-rounded) weight dims: padding the
    # weight operand inside jit copies the whole tensor every call (under
    # a sampler scan: every step)
    bm = min(bm, _round_up(M, 16))
    bn = _fit_block(N, bn)
    bk = _fit_block(Kh, bk)
    Mp, Np, Khp = _round_up(M, bm), _round_up(N, bn), _round_up(Kh, bk)
    xp = x.astype(jnp.bfloat16)
    if Mp != M or Khp != Kh:
        # pad both halves consistently: x = [lo_half | hi_half]
        x_lo = jnp.pad(xp[:, :Kh], ((0, Mp - M), (0, Khp - Kh)))
        x_hi = jnp.pad(xp[:, Kh:], ((0, Mp - M), (0, Khp - Kh)))
    else:
        x_lo, x_hi = xp[:, :Kh], xp[:, Kh:]
    if (Khp, Np) != (Kh, N):
        w_packed = jnp.pad(w_packed, ((0, Khp - Kh), (0, Np - N)),
                           constant_values=0x88)  # packed zeros (-8+8=0... 0x88 = (0+8)|(0+8)<<4)
        w_scale = jnp.pad(w_scale, (0, Np - N))

    grid = (Mp // bm, Np // bn, Khp // bk)
    vec_spec = pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _w4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            vec_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * Np * Khp,
            bytes_accessed=2 * Mp * Khp * 2 + Khp * Np + Mp * Np * 2,
            transcendentals=0),
        interpret=interpret,
    )(x_lo, x_hi, w_packed, w_scale.reshape(1, -1))
    return out[:M, :N]


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype",
                                             "interpret"))
def wq_matmul(
    x: jnp.ndarray,  # [M, K] bf16/f32 activations
    w_int: jnp.ndarray,  # [K, N] int8 (or int4) weight codes
    w_scale: jnp.ndarray,  # [N] f32 per-out-channel scale
    bias: Optional[jnp.ndarray] = None,  # [N]
    bm: int = 256,
    bn: int = 512,
    bk: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x.shape
    K2, N = w_int.shape
    assert K == K2, (x.shape, w_int.shape)
    from .pallas_qmatmul import _fit_block

    bm = min(bm, _round_up(M, 16))
    bn = _fit_block(N, bn)  # no-padding tiles for the weight operand
    bk = _fit_block(K, bk)
    Mp, Np, Kp = _round_up(M, bm), _round_up(N, bn), _round_up(K, bk)
    if (Mp, Kp) != (M, K):
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        w_int = jnp.pad(w_int, ((0, Kp - K), (0, Np - N)))
    if Np != N:
        w_scale = jnp.pad(w_scale, (0, Np - N))
        if bias is not None:
            bias = jnp.pad(bias, (0, Np - N))

    grid = (Mp // bm, Np // bn, Kp // bk)
    vec_spec = pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        vec_spec,
    ]
    args = [x.astype(jnp.bfloat16), w_int, w_scale.reshape(1, -1)]
    kernel = _kernel_nobias
    if bias is not None:
        in_specs.append(vec_spec)
        args.append(bias.reshape(1, -1))
        kernel = _kernel

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * 2 + Kp * Np + Mp * Np * 2,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out[:M, :N]
