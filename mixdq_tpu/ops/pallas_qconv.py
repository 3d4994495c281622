"""Pallas implicit-GEMM int8 conv with fused dequant epilogue.

TPU-native counterpart of the reference's CUTLASS int8 Conv2dFprop
kernels (csrc/qconv2d/cutlassConv2d_*.cu, EVT epilogue
``D = (acc - bias0) * scale (+ bias)``). XLA's s8 conv lowering
upconverts operands into the bf16 MXU pipeline (~120 TOP/s measured on
v5e — bf16 speed, not the native 394 int8 TOP/s); this kernel feeds the
MXU int8 directly.

Design (NHWC, stride 1, zp-code padding — the same padding redesign as
``qops.qconv2d``: padded positions hold the zero-point code, so the zp
correction stays the uniform per-channel ``bias0`` and no border kernel
is needed):

* Every SDXL conv's padded input image fits in VMEM (largest ~4.2 MB at
  the 64x64 level), so the x BlockSpec maps the FULL image per batch
  element — no halo machinery, fetched once per batch.
* The image is pre-flattened to ``[B, Hp*Wp, C]`` with the padded width
  rounded up to a multiple of 8 so that (a) a kernel row-slab
  ``[bp*Wp, C]`` is a plain contiguous 2D slice (Mosaic cannot
  shape-cast an unaligned ``[bp, Wp, C]`` vector into 2D), and (b) the
  int32 dot result ``[bp*Wp, bk]`` splits back into ``[bp, Wp, bk]``
  along sublane-aligned boundaries.
* Grid = (B, P/bp, K/bk). Each step computes an output row-block
  [bp, Q, bk] as kh*kw shifted dots: for tap (r, s),
  ``t = slab(row0+r) @ w[r, s]`` over the full padded width, then
  ``acc += t[:, s:s+Q, :]`` — slice AFTER the dot, so only cheap
  sublane-offset slices of the int32 result are needed. The extra
  (Wp - Q - s) columns per dot are ~5-10% wasted MXU work, far cheaper
  than per-tap input re-slicing.
* int32 accumulation (native int8 MXU dot), f32 epilogue, bf16 store.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pick_div(total: int, target: int, unit: int = 1) -> int:
    """Largest divisor of ``total`` that is <= target and a multiple of
    ``unit``."""
    best = None
    for d in range(1, total + 1):
        if total % d == 0 and d <= target and d % unit == 0:
            best = d
    return best or total


def _conv_kernel(x_ref, w_ref, scale_ref, bias0_ref, bias_ref, o_ref, *,
                 bp, Q, Wp, kh, kw):
    i = pl.program_id(1)
    row0 = i * bp
    acc = None
    for r in range(kh):
        # contiguous [bp*Wp, C] slab: rows row0+r .. row0+r+bp of the
        # flattened padded image
        xf = x_ref[0, pl.ds((row0 + r) * Wp, bp * Wp), :]
        for s in range(kw):
            t = jax.lax.dot_general(
                xf, w_ref[r, s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            t3 = t.reshape(bp, Wp, t.shape[-1])[:, s : s + Q, :]
            acc = t3 if acc is None else acc + t3
    out = (acc.astype(jnp.float32) - bias0_ref[0]) * scale_ref[0]
    if bias_ref is not None:
        out = out + bias_ref[0]
    o_ref[0] = out.astype(o_ref.dtype)


def _conv_kernel_nobias(x_ref, w_ref, scale_ref, bias0_ref, o_ref, **kw):
    _conv_kernel(x_ref, w_ref, scale_ref, bias0_ref, None, o_ref, **kw)


@functools.partial(jax.jit, static_argnames=("padding", "out_dtype",
                                             "interpret", "bp_target",
                                             "bk_target"))
def qconv2d_pallas(
    x_int8: jnp.ndarray,  # [B, H, W, C] int8 codes (zp-shifted)
    w_int8: jnp.ndarray,  # [kh, kw, C, K] int8
    scale: jnp.ndarray,  # [K] f32 = s_w * s_a
    bias0: jnp.ndarray,  # [K] f32 = zp_s * sum_{r,s,c} w
    zp_shifted: jnp.ndarray,  # 0-d: pad code representing x = 0
    bias: Optional[jnp.ndarray] = None,  # [K] f32
    padding=(1, 1),
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    bp_target: int = 8,
    bk_target: int = 512,
) -> jnp.ndarray:
    """Stride-1 W8A8 NHWC conv, native int8 MXU math. Output
    [B, P, Q, K] with P = H + 2*ph - kh + 1, Q = W + 2*pw - kw + 1."""
    B, H, W, C = x_int8.shape
    kh, kw, C2, K = w_int8.shape
    assert C == C2, (C, C2)
    ph, pw = padding
    P, Q = H + 2 * ph - kh + 1, W + 2 * pw - kw + 1
    # padded width rounded to a sublane multiple (int32 reshape needs
    # Wp % 8 == 0); the extra right columns hold the zp code and their
    # dot contributions land in discarded t columns
    Wp = _round_up(W + 2 * pw, 8)
    Hp = H + 2 * ph
    pad_val = zp_shifted.astype(jnp.int8)
    x_p = jax.lax.pad(
        x_int8, pad_val,
        ((0, 0, 0), (ph, ph, 0), (pw, Wp - W - pw, 0), (0, 0, 0)))
    xf = x_p.reshape(B, Hp * Wp, C)

    bp = _pick_div(P, bp_target)
    bk = K if K <= bk_target else _pick_div(K, bk_target, 128)
    grid = (B, P // bp, K // bk)

    kern = functools.partial(
        _conv_kernel_nobias if bias is None else _conv_kernel,
        bp=bp, Q=Q, Wp=Wp, kh=kh, kw=kw)
    vec = lambda: pl.BlockSpec((1, bk), lambda b, i, k: (0, k),
                               memory_space=pltpu.VMEM)
    in_specs = [
        # full padded image per batch element; constant along (i, k) so
        # the pipeline fetches it once per batch
        pl.BlockSpec((1, Hp * Wp, C), lambda b, i, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kh, kw, C, bk), lambda b, i, k: (0, 0, 0, k),
                     memory_space=pltpu.VMEM),
        vec(), vec(),
    ]
    args = [xf, w_int8, scale.reshape(1, -1).astype(jnp.float32),
            bias0.reshape(1, -1).astype(jnp.float32)]
    if bias is not None:
        in_specs.append(vec())
        args.append(bias.reshape(1, -1).astype(jnp.float32))

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bp, Q, bk),
                               lambda b, i, k: (b, i, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, Q, K), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * Wp * kh * kw * C * K,
            bytes_accessed=(B * Hp * Wp * C + kh * kw * C * K
                            + 2 * B * P * Q * K),
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out
