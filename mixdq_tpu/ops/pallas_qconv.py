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


#: Measured-best (bp_target, bk_target, tap_concat) per conv shape
#: (H, C, K) at B=1 on TPU v5e — scripts/conv_kernel_tune.py sweep,
#: bench_logs/conv_tune.txt. Entries only where the win over the
#: (8, 512, False) default was clear of measurement noise; unlisted
#: shapes fall back to a rule (see _tuned_config).
_TUNED = {
    (64, 320, 320): (8, 640, False),     # 46 -> 24 us
    (64, 640, 320): (16, 640, True),     # 144 -> 22 us
    (64, 960, 320): (16, 512, True),     # 32 -> 27 us
    (32, 640, 640): (8, 640, False),     # 32 -> 22 us
    (16, 1280, 1280): (32, 512, False),  # 26 -> 21 us
    (16, 1920, 1280): (16, 512, True),   # 112 -> 35 us
    (16, 2560, 1280): (8, 512, True),    # 39 -> 28 us
}

#: weight-block budget: kernels double-buffer the [.., C, bk] weight
#: block; past ~6 MB the block + image + residual/out blocks exceed the
#: 16 MB VMEM scoped limit in-model (observed: bk=640 at C=1280 -> OOM
#: at 16.52M with the residual epilogue present)
_W_BLOCK_BUDGET = 6 * 1024 * 1024


def _tuned_config(H, C, K, bp_target, bk_target, tap_concat):
    """Resolve block config: explicit caller overrides win; otherwise the
    measured table, then a rule: very wide inputs (C >= 1536) prefer the
    tap-concat form (fewer, wider dots); K divisible by 640 prefers
    bk=640 (the 640-channel levels otherwise fall to bk=128 — the only
    512-bounded divisor of 640 that is a lane multiple). Any candidate
    whose weight block exceeds the VMEM budget falls back to the
    default."""
    if (bp_target, bk_target, tap_concat) != (8, 512, False):
        return bp_target, bk_target, tap_concat
    cand = _TUNED.get((H, C, K))
    if cand is None:
        if C >= 1536:
            cand = (16, 512, True)
        elif K % 640 == 0:
            cand = (8, 640, False)
        else:
            return bp_target, bk_target, tap_concat
    bk = K if K <= cand[1] else _pick_div(K, cand[1], 128)
    if 9 * C * bk > _W_BLOCK_BUDGET:
        return bp_target, bk_target, tap_concat
    return cand


def _conv_kernel(x_ref, w_ref, scale_ref, bias0_ref, bias_ref, ebias_ref,
                 res_ref, o_ref, *, bp, Q, Wp, kh, kw, tap_concat):
    i = pl.program_id(1)
    row0 = i * bp
    acc = None
    for r in range(kh):
        # contiguous [bp*Wp, C] slab: rows row0+r .. row0+r+bp of the
        # flattened padded image
        xf = x_ref[0, pl.ds((row0 + r) * Wp, bp * Wp), :]
        if tap_concat:
            # one wide dot per kernel row: weights pre-arranged as
            # [C, kw*bk] so all kw taps share a single MXU pass
            # (3x fewer, 3x wider dots than the per-tap form); the
            # per-tap results come back as lane-aligned column slices
            t = jax.lax.dot_general(
                xf, w_ref[r, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            bk = t.shape[-1] // kw
            for s in range(kw):
                t3 = (t[:, s * bk : (s + 1) * bk]
                      .reshape(bp, Wp, bk)[:, s : s + Q, :])
                acc = t3 if acc is None else acc + t3
            continue
        for s in range(kw):
            t = jax.lax.dot_general(
                xf, w_ref[r, s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            t3 = t.reshape(bp, Wp, t.shape[-1])[:, s : s + Q, :]
            acc = t3 if acc is None else acc + t3
    out = (acc.astype(jnp.float32) - bias0_ref[0]) * scale_ref[0]
    if bias_ref is not None:
        out = out + bias_ref[0]
    if ebias_ref is not None:
        # per-(batch, out-channel) extra bias — the resnet time-embedding
        # projection added right after conv1 (ResnetBlock2D); the block
        # spans all batches, select this grid step's row
        out = out + ebias_ref[pl.program_id(0)]
    if res_ref is not None:
        # fused residual/shortcut add (the epilogue XLA loses when the
        # conv leaves its fusion graph — see DESIGN_NOTES layout notes)
        out = out + res_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("padding", "out_dtype",
                                             "interpret", "bp_target",
                                             "bk_target", "tap_concat"))
def qconv2d_pallas(
    x_int8: jnp.ndarray,  # [B, H, W, C] int8 codes (zp-shifted)
    w_int8: jnp.ndarray,  # [kh, kw, C, K] int8
    scale: jnp.ndarray,  # [K] f32 = s_w * s_a
    bias0: jnp.ndarray,  # [K] f32 = zp_s * sum_{r,s,c} w
    zp_shifted: jnp.ndarray,  # 0-d: pad code representing x = 0
    bias: Optional[jnp.ndarray] = None,  # [K] f32
    extra_bias: Optional[jnp.ndarray] = None,  # [B, K] f32 (temb proj)
    residual: Optional[jnp.ndarray] = None,  # [B, P, Q, K] (fused add)
    padding=(1, 1),
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    bp_target: int = 8,
    bk_target: int = 512,
    tap_concat: bool = False,
) -> jnp.ndarray:
    """Stride-1 W8A8 NHWC conv, native int8 MXU math, fused epilogue
    ``(acc - bias0) * scale + bias + extra_bias[b] + residual``. Output
    [B, P, Q, K] with P = H + 2*ph - kh + 1, Q = W + 2*pw - kw + 1."""
    B, H, W, C = x_int8.shape
    kh, kw, C2, K = w_int8.shape
    assert C == C2, (C, C2)
    bp_target, bk_target, tap_concat = _tuned_config(
        H, C, K, bp_target, bk_target, tap_concat)
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

    vec = lambda: pl.BlockSpec((1, bk), lambda b, i, k: (0, k),
                               memory_space=pltpu.VMEM)
    if tap_concat:
        # [kh, kw, C, K] -> [kh, K/bk, C, kw*bk]: per kernel row a single
        # [C, kw*bk] matrix whose lane blocks are the kw taps of one
        # K-block (host-side one-time transform, hoisted out of scans)
        wk = (w_int8.transpose(0, 2, 1, 3)         # [kh, C, kw, K]
              .reshape(kh, C, kw, K // bk, bk)
              .transpose(0, 3, 1, 2, 4)
              .reshape(kh, K // bk, C, kw * bk))
        w_spec = pl.BlockSpec((kh, 1, C, kw * bk),
                              lambda b, i, k: (0, k, 0, 0),
                              memory_space=pltpu.VMEM)
        w_arg = wk
    else:
        w_spec = pl.BlockSpec((kh, kw, C, bk), lambda b, i, k: (0, 0, 0, k),
                              memory_space=pltpu.VMEM)
        w_arg = w_int8
    in_specs = [
        # full padded image per batch element; constant along (i, k) so
        # the pipeline fetches it once per batch
        pl.BlockSpec((1, Hp * Wp, C), lambda b, i, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        w_spec,
        vec(), vec(),
    ]
    args = [xf, w_arg, scale.reshape(1, -1).astype(jnp.float32),
            bias0.reshape(1, -1).astype(jnp.float32)]
    if bias is not None:
        in_specs.append(vec())
        args.append(bias.reshape(1, -1).astype(jnp.float32))
    if extra_bias is not None:
        # full [B, bk] block (a (1, bk) block over [B, K] is an illegal
        # sublane shape when B > 1); the kernel row-indexes by batch id
        in_specs.append(pl.BlockSpec((B, bk), lambda b, i, k: (0, k),
                                     memory_space=pltpu.VMEM))
        args.append(extra_bias.astype(jnp.float32))
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, bp, Q, bk),
                                     lambda b, i, k: (b, i, 0, k),
                                     memory_space=pltpu.VMEM))
        args.append(residual)

    has_b, has_e, has_r = (bias is not None, extra_bias is not None,
                           residual is not None)

    def kern(*refs):
        x_r, w_r, sc_r, b0_r = refs[:4]
        rest = list(refs[4:-1])
        o_r = refs[-1]
        b_r = rest.pop(0) if has_b else None
        e_r = rest.pop(0) if has_e else None
        r_r = rest.pop(0) if has_r else None
        _conv_kernel(x_r, w_r, sc_r, b0_r, b_r, e_r, r_r, o_r,
                     bp=bp, Q=Q, Wp=Wp, kh=kh, kw=kw,
                     tap_concat=tap_concat)

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


def s2d_weights(w_int8: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a stride-2 conv's [kh, kw, C, K] weights into the
    equivalent stride-1 space-to-depth form [ceil(kh/2), ceil(kw/2), 4C, K].

    A stride-2 conv over x equals a stride-1 conv over the 2x2
    space-to-depth of x: original tap (r, s) maps to phase
    (2*(r % 2) + (s % 2)) of the depth axis at shifted tap
    (r // 2, s // 2); phase-taps past the kernel extent stay zero. This
    keeps the MXU row-slab kernel structure for SDXL's downsamplers with
    zero extra FLOPs — the TPU answer to the reference's strided CUTLASS
    conv iterators (csrc/qconv2d/cutlassConv2d_*.cu)."""
    kh, kw, C, K = w_int8.shape
    Kh, Kw = (kh + 1) // 2, (kw + 1) // 2
    w = jnp.zeros((Kh, Kw, 4, C, K), dtype=w_int8.dtype)
    for r in range(kh):
        for s in range(kw):
            w = w.at[r // 2, s // 2, 2 * (r % 2) + (s % 2)].set(w_int8[r, s])
    return w.reshape(Kh, Kw, 4 * C, K)


def space_to_depth_codes(x_p: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], phase-major channel order
    (phase = 2 * row-parity + col-parity), matching ``s2d_weights``."""
    B, H, W, C = x_p.shape
    x = x_p.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def qconv2d_pallas_s2(
    x_int8: jnp.ndarray,  # [B, H, W, C] int8 codes
    w_int8: jnp.ndarray,  # [kh, kw, C, K] int8 (original layout)
    scale: jnp.ndarray,
    bias0: jnp.ndarray,
    zp_shifted: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    padding=(1, 1),
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-2 W8A8 conv as stride-1 over space-to-depth input. Padding
    uses the zp code BEFORE the depth fold, so every folded position still
    encodes ``x = 0`` and ``bias0`` stays the uniform per-channel constant
    (zero phase-weights kill the out-of-extent taps)."""
    B, H, W, C = x_int8.shape
    ph, pw = padding
    pad_val = zp_shifted.astype(jnp.int8)
    # bottom/right pad to even size for the 2x2 fold; the extra zp rows
    # only feed outputs the VALID conv never produces or phase taps whose
    # weights are zero
    Hp, Wp = _round_up(H + 2 * ph, 2), _round_up(W + 2 * pw, 2)
    x_p = jax.lax.pad(
        x_int8, pad_val,
        ((0, 0, 0), (ph, Hp - H - ph, 0), (pw, Wp - W - pw, 0), (0, 0, 0)))
    x4 = space_to_depth_codes(x_p)
    return qconv2d_pallas(
        x4, s2d_weights(w_int8), scale, bias0, zp_shifted, bias=bias,
        padding=(0, 0), out_dtype=out_dtype, interpret=interpret)
