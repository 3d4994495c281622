"""Fused GroupNorm + SiLU + int8-quantize Pallas kernel — producer-side
int8 emission for the resnet conv chains.

In the int8_sec deploy path every ResnetBlock2D conv input is produced
by ``GroupNorm -> SiLU``; the conv then re-reads the bf16 tensor to
quantize it (``qops.quantize_per_tensor``). On TPU the quantize lands as
a standalone ``clamp_convert`` fusion (XLA cannot fuse an elementwise
producer into a Pallas custom call, and the GN stat reduces are separate
``convert_reduce`` fusions) — measured ~2.9 ms/step of such ops on the
SDXL-Turbo int8 step. This kernel produces the NEXT conv's int8 codes
straight from the raw resnet input in one pass:

    codes = quantize(silu(group_norm(x, gamma, beta)), s_a, zp)

HBM traffic: read x (bf16) twice (stats pass + transform pass) + write
codes (int8) = 5 bytes/elem, vs the XLA chain's >= 7 (reduce read,
normalize read+write, quantize read+write). More importantly it deletes
two kernel launches per site — the quantize fusions are op-latency
bound (~3.5 us each at B=1).

This is the TPU counterpart of the reference's producer-fused
quantization design (csrc/quant_dequant/quantize_kernel_vectorized.cu —
the reference keeps quantize as a separate vectorized kernel; we go one
step further and fold the whole normalize-activate-quantize chain).

Group statistics: spatial partial sums are accumulated per channel in
an f32 VMEM scratch across row-blocks (grid phase 0), then folded into
per-group mean/rstd with two tiny dots against a constant [C, G]
group-membership matrix (channel groups are C/G wide — not lane-aligned,
so a matmul against the membership matrix replaces an impossible
in-lane segmented reshape). Phase 1 re-streams x and applies
``y = x * a + b`` (a = gamma*rstd, b = beta - mean*gamma*rstd), SiLU,
and the per-tensor quantize, storing int8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_div(total: int, target: int) -> int:
    best = None
    for d in range(1, total + 1):
        if total % d == 0 and d <= target:
            best = d
    return best or total


def group_matrix(C: int, groups: int) -> np.ndarray:
    """[C, G] f32 one-hot group membership (channels grouped
    contiguously, flax/diffusers GroupNorm convention)."""
    assert C % groups == 0, (C, groups)
    m = np.zeros((C, groups), np.float32)
    gs = C // groups
    for g in range(groups):
        m[g * gs : (g + 1) * gs, g] = 1.0
    return m


def _kernel(x_ref, gmat_ref, gam_ref, beta_ref, cst_ref, o_ref,
            stats_ref, ab_ref, *, N, C, groups, eps, silu):
    p = pl.program_id(1)
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(p == 0)
    def _stats():
        @pl.when(i == 0)
        def _z():
            stats_ref[...] = jnp.zeros_like(stats_ref)

        xf = x_ref[0].astype(jnp.float32)
        stats_ref[0, :] += jnp.sum(xf, axis=0)
        stats_ref[1, :] += jnp.sum(xf * xf, axis=0)

        @pl.when(i == ni - 1)
        def _fold():
            n = jnp.float32(N * (C // groups))
            gsum = jax.lax.dot_general(
                stats_ref[0:1, :], gmat_ref[...],
                (((1,), (0,)), ((), ())))  # [1, G]
            gsq = jax.lax.dot_general(
                stats_ref[1:2, :], gmat_ref[...],
                (((1,), (0,)), ((), ())))
            mean_g = gsum / n
            var_g = gsq / n - mean_g * mean_g
            rstd_g = jax.lax.rsqrt(var_g + eps)
            # broadcast back per channel: [1, G] x [C, G]^T -> [1, C]
            mean_c = jax.lax.dot_general(
                mean_g, gmat_ref[...], (((1,), (1,)), ((), ())))
            rstd_c = jax.lax.dot_general(
                rstd_g, gmat_ref[...], (((1,), (1,)), ((), ())))
            a = gam_ref[...] * rstd_c
            ab_ref[0:1, :] = a
            ab_ref[1:2, :] = beta_ref[...] - mean_c * a

    @pl.when(p == 1)
    def _transform():
        xf = x_ref[0].astype(jnp.float32)
        y = xf * ab_ref[0:1, :] + ab_ref[1:2, :]
        if silu:
            y = y * jax.nn.sigmoid(y)
        q = jnp.round(y * cst_ref[0, 0]) + cst_ref[0, 1]
        o_ref[0] = jnp.clip(q, cst_ref[0, 2], cst_ref[0, 3]).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu",
                                             "interpret", "block_rows",
                                             "clip"))
def gn_silu_quantize(
    x: jnp.ndarray,  # [B, H, W, C] (or [B, N, C]) bf16/f32
    gamma: jnp.ndarray,  # [C]
    beta: jnp.ndarray,  # [C]
    scale_inv: jnp.ndarray,  # 0-d f32 (1 / act scale)
    zp_shifted: jnp.ndarray,  # 0-d f32 (act zero point - 2^(b-1))
    groups: int = 32,
    eps: float = 1e-5,
    silu: bool = True,
    interpret: bool = False,
    block_rows: int = 0,
    clip: tuple = (-128.0, 127.0),  # act_clip_range(a_bits)
) -> jnp.ndarray:
    """``quantize(silu(group_norm(x)), scale_inv, zp)`` -> int8 codes,
    same shape as ``x``. Matches ``qops.quantize_per_tensor`` code
    semantics exactly (round-half-even, clip at the consumer's a_bits
    saturation bounds)."""
    shape = x.shape
    B, C = shape[0], shape[-1]
    N = int(np.prod(shape[1:-1]))
    xf = x.reshape(B, N, C)
    # row-block: bound the f32 working set to ~2 MB
    bs = block_rows or _pick_div(N, max(8, (2 * 1024 * 1024 // (4 * C))
                                        // 8 * 8))
    grid = (B, 2, N // bs)
    gmat = jnp.asarray(group_matrix(C, groups))
    consts = jnp.stack([scale_inv.astype(jnp.float32).reshape(()),
                        zp_shifted.astype(jnp.float32).reshape(()),
                        jnp.float32(clip[0]), jnp.float32(clip[1])]
                       ).reshape(1, 4)

    out = pl.pallas_call(
        functools.partial(_kernel, N=N, C=C, groups=groups, eps=eps,
                          silu=silu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, C), lambda b, p, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, groups), lambda b, p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda b, p, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, C), lambda b, p, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.int8),
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32),
                        pltpu.VMEM((2, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=12 * B * N * C,
            bytes_accessed=4 * B * N * C + B * N * C,
            transcendentals=B * N * C),
        interpret=interpret,
    )(xf, gmat, gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32), consts)
    return out.reshape(shape)
