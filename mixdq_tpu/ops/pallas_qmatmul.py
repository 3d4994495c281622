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
