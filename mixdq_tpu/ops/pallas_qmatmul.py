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
    bn = min(bn, _round_up(N, 128))
    bk = min(bk, _round_up(K, 128))
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
