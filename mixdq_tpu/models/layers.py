"""Quant-aware Flax primitives: QDense, QConv, QAct.

TPU-native counterpart of the reference's ``QuantLayer`` wrapper
(quant_layer.py:14-115). Instead of wrapping torch modules post-hoc, every
Conv/Linear in our models *is* one of these modules; quantization behavior
is driven entirely by the ``QuantCtx`` argument (see
``mixdq_tpu/quant/state.py``), so the same compiled graph serves FP,
stats-collection, and any per-layer fake-quant configuration.

Layouts are TPU-native: activations NHWC, conv kernels HWIO, dense kernels
[in, out]; per-channel weight quant runs over the output-channel (last)
axis — the same channel set as the reference's torch OIHW dim 0.

Channel-split (quant_layer.py:74-87): a conv whose input is a
``concat([h, skip])`` quantizes the two halves with separate scale pairs.
Here ``split`` is a static call argument supplied by the up-block forward
(quant_block_forward_func.py:97-99) and the twin qparams live in the same
``LayerQParams`` node (``w0_*``/``a0_*``).
"""

from __future__ import annotations

from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..quant.state import QuantCtx, canonical_name


def _minmax_reduce(old, new):
    if old == ():  # linen sow init value
        return new
    return (jnp.minimum(old[0], new[0]), jnp.maximum(old[1], new[1]))


def _sow_act_stats(mod: nn.Module, name: str, x: jnp.ndarray, suffix: str = ""):
    """Record per-tensor activation min/max (clamped to contain 0,
    base_quantizer.py:155-158) into the 'quant_stats' collection."""
    xf = x.astype(jnp.float32)
    mn = jnp.minimum(jnp.min(xf), 0.0)
    mx = jnp.maximum(jnp.max(xf), 0.0)
    mod.sow("quant_stats", name + suffix, (mn, mx), reduce_fn=_minmax_reduce)


#: Shipped deploy_compute strategies (every one measured >= 'int8' on its
#: target family; the experimental losers — fused_int8 / int8_tf /
#: int8_cd / int8_pc — were removed after in-model benchmarks, see
#: DESIGN_NOTES.md; their kernels survive as library ops + microbenches).
DEPLOY_COMPUTE_MODES = ("int8", "int8_sec", "dequant", "pallas_dequant")


def resolve_compute(compute: str, name: str, spatial_conv: bool = False,
                    is_conv: bool = False) -> str:
    """Map the ctx-level deploy compute strategy to a per-layer one."""
    if compute not in DEPLOY_COMPUTE_MODES:
        raise ValueError(
            f"unknown deploy_compute {compute!r}; shipped modes: "
            f"{DEPLOY_COMPUTE_MODES}")
    if compute == "int8_sec":
        # whole-section pallas convs: EVERY conv leaves XLA's conv
        # pipeline — spatial convs (any stride) via the implicit-GEMM
        # Pallas kernels, 1x1 convs as plain int8 dots over flattened
        # pixels. With zero XLA conv ops left in the graph, a pallas
        # custom-call cannot poison conv layout assignment (the
        # graph-wide failure mode that sank the removed int8_pc/int8_tf
        # modes — DESIGN_NOTES). Dense layers keep the XLA int8 dot path.
        return compute if is_conv else "int8"
    return compute


def geglu_fusable(ctx: QuantCtx, dp_p, dp_c) -> bool:
    """Whether the GEGLU projection + gate + consumer act-quantize can run
    as ONE Pallas kernel (``pallas_qmatmul.geglu_qmatmul``): int8_sec
    deploy, plain int8 linear entries on both the proj (weights unpacked,
    acts on) and the consumer (ff.net.2) side, and the Pallas backend
    available. Mirrors the conditions QDense's geglu_out branch needs."""
    from ..ops import pallas_mode

    return (ctx.mode == "int8" and ctx.deploy_compute == "int8_sec"
            and not ctx.dequant_small_m
            and dp_p is not None and dp_p.kind == "linear"
            and dp_p.w_int is not None and not dp_p.act_off
            and dp_c is not None and dp_c.kind == "linear"
            and not dp_c.act_off and dp_c.scale_inv is not None
            and pallas_mode()[0])


def deploy_linear(x, dp, compute: str, dtype):
    """Real-quant matmul for one deploy entry (no bias, no BoS handling —
    callers layer those on top). Shared by ``QDense`` and the fused
    QKV/KV projection path in ``models/attention.py``.

    ``compute`` strategies (see ``QuantCtx.deploy_compute``):
    int8 (integer MXU + fused epilogue), dequant / pallas_dequant
    (weight-only). Packed-W4 entries under the dequant family use the
    Pallas nibble-unpack kernel.
    """
    from ..ops import qops

    pre_codes = x.dtype == jnp.int8
    if not pre_codes:
        x = x.astype(dtype)
    lead = x.shape[:-1]
    if dp.w_packed is not None and compute == "int8":
        # W4 with int8 MXU math: unpack the halves-packed nibbles to int8
        # codes with XLA ops (the reference's quint4x2-storage/int8-compute
        # design, quantize_sdxl.py:46-48). Under the sampler scan XLA
        # hoists this loop-invariant unpack OUT of the loop, so steps run
        # at full int8 speed while the resident checkpoint stays 4x
        # packed. (The pallas wq4 kernel route — 'dequant' compute —
        # avoids the transient unpacked copy but measured 2.2x slower
        # in-model; see DESIGN_NOTES.)
        lo = (dp.w_packed & 0xF).astype(jnp.int8) - 8
        hi = (dp.w_packed >> 4).astype(jnp.int8) - 8
        dp = dp.replace(w_int=jnp.concatenate([lo, hi], axis=0),
                        w_packed=None)
    if pre_codes:
        # producer-fused input: x already holds THIS layer's int8 act
        # codes (emitted by ln_quantize / gn_silu_quantize upstream) —
        # valid only on the int8 compute path
        assert compute == "int8" and dp.w_packed is None, (compute,)
        return qops.qlinear(x, dp.w_int, dp.scale, dp.bias0,
                            out_dtype=dtype)
    if dp.w_packed is not None:
        # halves-packed W4: Pallas in-kernel nibble unpack + bf16 MXU
        # (4x weight memory vs bf16). CPU fallback unpacks.
        w_delta = dp.scale * dp.scale_inv
        x2 = x.reshape(-1, x.shape[-1])
        if jax.default_backend() != "cpu":
            from ..ops.pallas_wq_matmul import wq4_matmul

            y2 = wq4_matmul(x2, dp.w_packed, w_delta, out_dtype=dtype)
        else:
            lo = (dp.w_packed & 0xF).astype(jnp.int8) - 8
            hi = (dp.w_packed >> 4).astype(jnp.int8) - 8
            w_int = jnp.concatenate([lo, hi], axis=0)
            y2 = jnp.dot(x2, w_int.astype(dtype))
            y2 = y2 * w_delta.astype(dtype)
        return y2.reshape(*lead, y2.shape[-1])
    if compute in ("dequant", "pallas_dequant"):
        # weight-only int8: the convert (int8 -> bf16) fuses into the
        # dot's operand read on TPU, and the per-out-channel scale
        # applies to the OUTPUT — no bf16 weight tensor ever
        # materializes in HBM (scaling before the dot would force one,
        # measured 10x slower). 'pallas_dequant' uses the hand-written
        # VMEM-dequant kernel instead.
        w_delta = dp.scale * dp.scale_inv  # [N]
        if compute == "pallas_dequant" and jax.default_backend() != "cpu":
            from ..ops.pallas_wq_matmul import wq_matmul

            y2 = wq_matmul(x.reshape(-1, x.shape[-1]), dp.w_int,
                           w_delta, out_dtype=dtype)
            return y2.reshape(*lead, y2.shape[-1])
        y = jnp.dot(x, dp.w_int.astype(dtype))
        return y * w_delta.astype(dtype)
    codes = qops.quantize_per_tensor(x, dp.scale_inv, dp.zp_shifted,
                                     *qops.act_clip_range(dp.a_bits))
    return qops.qlinear(codes, dp.w_int, dp.scale, dp.bias0,
                        out_dtype=dtype)


class QDense(nn.Module):
    """Quant-aware linear layer (reference QuantLayer over nn.Linear).

    ``bos_aware_axis``: if set (to the token axis) and ``ctx.bos_aware``,
    the first token goes through the FP path while the rest are quantized
    — MixDQ's BoS protection for cross-attn k/v projections
    (quant_block.py:600-625).
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    # None => params stored in the compute dtype (bf16-resident weights,
    # matching the reference's fp16 checkpoints; fp32 storage would double
    # weight HBM traffic and unfairly slow the FP baseline)
    param_dtype: Any = None

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx(), bos_aware: bool = False,
                 geglu_out=None):
        """``geglu_out``: the downstream ff.net.2 DeployEntry — selects the
        fused GEGLU kernel (this projection's GEMM + gate + the consumer's
        act-quantize in one Pallas call) and makes the return value that
        consumer's int8 codes ``[..., features // 2]``. Callers must have
        checked ``geglu_fusable`` first."""
        name = canonical_name(self.path)
        in_features = x.shape[-1]
        pdt = self.param_dtype or self.dtype
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), pdt)
            if self.use_bias
            else None
        )

        # Real int8 path: fp kernel param is pruned (deploy replaces it) —
        # the source of the static-memory saving (quant/deploy.py).
        dp = (ctx.deploy.get(name) if (ctx.mode == "int8" and ctx.deploy)
              else None)
        if dp is not None:
            if dp.kind == "fused_away":
                raise ValueError(
                    f"layer {name} was folded into a fused QKV/KV deploy "
                    "entry; it must be called through the fused attention "
                    "path (ctx.fuse_qkv)")
            pre_codes = x.dtype == jnp.int8
            if pre_codes:
                # producer-fused input (ln_quantize upstream): x holds
                # this layer's act codes already
                assert not (bos_aware and ctx.bos_aware), name
            else:
                x = x.astype(self.dtype)
            if (ctx.linear_bank is not None and not pre_codes
                    and geglu_out is None
                    and not (bos_aware and ctx.bos_aware)
                    and name in ctx.linear_bank):
                # hoisted shared-input bank (deploy.precompute_linear_bank):
                # this layer's int8 GEMM already ran level-batched at the
                # UNet top; only the fp bias remains
                y = ctx.linear_bank[name]
                return y if bias is None else y + bias.astype(self.dtype)
            if geglu_out is not None:
                from ..ops import pallas_mode
                from ..ops.pallas_qmatmul import geglu_qmatmul
                from ..ops.qops import act_clip_range, quantize_per_tensor

                codes = (x if pre_codes else quantize_per_tensor(
                    x, dp.scale_inv, dp.zp_shifted,
                    *act_clip_range(dp.a_bits)))
                lead = codes.shape[:-1]
                import os

                # MIXDQ_GEGLU_GATE: trace-time A/B knob for the in-kernel
                # gate ('tanh' default / 'sigmoid' cheaper VPU chain /
                # 'none' latency probe); unset follows ctx.gelu
                gate = (os.environ.get("MIXDQ_GEGLU_GATE", "").strip()
                        or ("tanh" if ctx.gelu == "tanh" else "exact"))
                out = geglu_qmatmul(
                    codes.reshape(-1, codes.shape[-1]), dp.w_int, dp.scale,
                    dp.bias0, geglu_out.scale_inv, geglu_out.zp_shifted,
                    bias=None if bias is None else bias.astype(jnp.float32),
                    bm=int(os.environ.get("MIXDQ_GEGLU_BM", "0")),
                    bn=int(os.environ.get("MIXDQ_GEGLU_BN", "0")),
                    gelu_tanh=(ctx.gelu == "tanh"), gate_mode=gate,
                    clip=act_clip_range(geglu_out.a_bits),
                    interpret=pallas_mode()[1])
                return out.reshape(*lead, out.shape[-1])
            rc = resolve_compute(ctx.deploy_compute, name)
            if dp.act_off:
                # act-protected layer: weight-only (acts stay FP) — the
                # simulation semantics of --act_protect with the int8
                # weight-residency win kept
                rc = "dequant"
            if (rc == "int8" and ctx.dequant_small_m and dp.w_packed is None
                    and not pre_codes
                    and x.size // x.shape[-1] <= ctx.dequant_small_m):
                rc = "dequant"  # small-M hybrid, see QuantCtx
            y = deploy_linear(x, dp, rc, self.dtype)
            # weight-only routes (dequant family; packed-W4 via the wq4
            # kernel) don't quantize acts, so the BoS token needs no
            # protection there. Packed entries under int8 compute unpack
            # in-graph and continue to the BoS path below.
            if ((dp.w_packed is not None and rc != "int8")
                    or rc in ("dequant", "pallas_dequant")):
                if bias is not None:
                    y = y + bias.astype(self.dtype)
                return y
            if bos_aware and ctx.bos_aware and x.ndim >= 3:
                if dp.bos_out is not None:
                    # precomputed BoS output (bos_pre_computed.pt analogue,
                    # nn/Linear.py:178-194): broadcast over batch
                    y0 = jnp.broadcast_to(
                        dp.bos_out[None].astype(self.dtype),
                        x.shape[:-2] + (1, dp.bos_out.shape[-1]))
                else:
                    # fall back to dequantized-FP matmul for the BoS token
                    w_fp = (dp.w_int.astype(jnp.float32)
                            * (dp.scale * dp.scale_inv)[None, :])
                    y0 = jnp.dot(x[..., :1, :].astype(jnp.float32),
                                 w_fp).astype(self.dtype)
                y = jnp.concatenate([y0, y[..., 1:, :]], axis=-2)
            if bias is not None:
                y = y + bias.astype(self.dtype)
            return y

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features),
            pdt,
        )
        if ctx.collect_stats:
            _sow_act_stats(self, name, x)
        if ctx.capture_acts:
            self.sow("act_capture", name, x)

        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)

        if ctx.mode == "fake":
            xq = ctx.quant_act(name, x)
            kq = ctx.quant_weight(name, kernel, channel_axis=-1)
            if bos_aware and ctx.bos_aware and x.ndim >= 3:
                # FP first token, quant rest (quant_block.py:600-625).
                y_fp0 = jnp.dot(x[..., :1, :], kernel)
                y_q = jnp.dot(xq[..., 1:, :], kq)
                y = jnp.concatenate([y_fp0, y_q], axis=-2)
            else:
                y = jnp.dot(xq, kq)
        else:
            y = jnp.dot(x, kernel)

        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class QConv(nn.Module):
    """Quant-aware 2D convolution, NHWC/HWIO (reference QuantLayer over
    nn.Conv2d). ``padding`` follows torch semantics (symmetric int pad)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = None  # None => compute dtype (see QDense)

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx(), split: int = 0,
                 extra_bias=None, residual=None):
        """``extra_bias`` [B, features] (e.g. the resnet time-embedding
        projection) and ``residual`` [B, P, Q, features] are applied to
        the output exactly once in every mode — fused into the Pallas
        kernel epilogue on the int8_sec path, plain adds elsewhere."""
        name = canonical_name(self.path)
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        pdt = self.param_dtype or self.dtype
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), pdt)
            if self.use_bias
            else None
        )

        dp = (ctx.deploy.get(name) if (ctx.mode == "int8" and ctx.deploy)
              else None)
        if dp is not None:
            spatial = kh * kw > 1
            mode = resolve_compute(ctx.deploy_compute, name, spatial,
                                   is_conv=True)
            if dp.act_off:
                mode = "dequant"  # act-protected: weight-only conv
            if x.dtype == jnp.int8:
                # producer-fused input: x already holds THIS layer's act
                # codes (emitted by gn_silu_quantize upstream) — valid
                # only on the int8 compute paths for non-split entries
                assert mode in ("int8", "int8_sec") and dp.kind == "conv", (
                    name, mode, dp.kind)
                return self._int8_forward(
                    x, dp, split, mode=mode, pre_codes=True,
                    bias=None if bias is None else bias.astype(self.dtype),
                    extra_bias=extra_bias, residual=residual)
            # small-M hybrid (see QuantCtx.dequant_small_m): 1x1 convs
            # are GEMMs over B*H*W pixels — below the threshold the
            # act-quantize op costs more than int8 math saves. Spatial
            # convs keep the int8 Pallas path (their quantize amortizes
            # over kh*kw reuse and the kernels need s8 input).
            if (mode in ("int8", "int8_sec") and not spatial
                    and self.strides == (1, 1) and ctx.dequant_small_m
                    and x.size // x.shape[-1] <= ctx.dequant_small_m):
                mode = "dequant"
            return self._int8_forward(
                x.astype(self.dtype), dp, split, mode=mode,
                bias=None if bias is None else bias.astype(self.dtype),
                extra_bias=extra_bias, residual=residual)

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, in_features, self.features), pdt,
        )
        if ctx.collect_stats:
            if split:
                _sow_act_stats(self, name, x[..., :split])
                _sow_act_stats(self, name, x[..., split:], suffix=".split")
            else:
                _sow_act_stats(self, name, x)
        if ctx.capture_acts:
            self.sow("act_capture", name, x)

        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)

        if ctx.mode == "fake":
            if split:
                # Two scale sets over the channel-concat input
                # (quant_layer.py:74-87); weight split over input channels
                # (HWIO axis 2, the torch dim-1 equivalent).
                x0 = ctx.quant_act(name, x[..., :split])
                x1 = ctx.quant_act(name, x[..., split:], split_part=1)
                xq = jnp.concatenate([x0, x1], axis=-1)
                k0 = ctx.quant_weight(name, kernel[:, :, :split, :], channel_axis=-1)
                k1 = ctx.quant_weight(
                    name, kernel[:, :, split:, :], channel_axis=-1, split_part=1
                )
                kq = jnp.concatenate([k0, k1], axis=2)
            else:
                xq = ctx.quant_act(name, x)
                kq = ctx.quant_weight(name, kernel, channel_axis=-1)
            y = self._conv(xq, kq)
        else:
            y = self._conv(x, kernel)

        if bias is not None:
            y = y + bias.astype(self.dtype)
        if extra_bias is not None:
            y = y + extra_bias.astype(self.dtype)[:, None, None, :]
        if residual is not None:
            y = y + residual.astype(self.dtype)
        return y

    def _conv(self, x, kernel):
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        pads = [(pad[0], pad[0]), (pad[1], pad[1])]
        return jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=self.strides,
            padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _int8_forward(self, x, dp, split, mode="int8", bias=None,
                      extra_bias=None, residual=None, pre_codes=False):
        """Real-quant conv (dual-conv sum for channel-split layers,
        nn/Conv2d.py:312-347). ``bias``/``extra_bias``/``residual`` are
        applied exactly once — fused into the Pallas epilogue on the
        section path, plain adds elsewhere.
        ``mode='dequant'``: weight-only — int8 weights dequantized into a
        bf16 conv."""
        from ..ops import qops

        def finish(y, done=()):
            if bias is not None and "bias" not in done:
                y = y + bias
            if extra_bias is not None and "extra" not in done:
                y = y + extra_bias.astype(self.dtype)[:, None, None, :]
            if residual is not None and "res" not in done:
                y = y + residual.astype(self.dtype)
            return y

        dequant = mode == "dequant"
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        if dequant:
            # weight-only int8: convert-only kernel feed (fuses into the
            # conv's operand read), per-out-channel scale applied to the
            # OUTPUT so no bf16 weight materializes in HBM.
            if dp.kind == "conv_split":
                # the two halves carry separate per-out-channel deltas, so
                # run the dual convs separately and sum (nn/Conv2d.py:312-347)
                y0 = self._conv(x[..., : dp.split],
                                dp.part0.w_int.astype(self.dtype))
                y0 = y0 * (dp.part0.scale * dp.part0.scale_inv).astype(self.dtype)
                y1 = self._conv(x[..., dp.split:],
                                dp.part1.w_int.astype(self.dtype))
                y1 = y1 * (dp.part1.scale * dp.part1.scale_inv).astype(self.dtype)
                return finish(y0 + y1)
            y = self._conv(x, dp.w_int.astype(self.dtype))
            return finish(y * (dp.scale * dp.scale_inv).astype(self.dtype))
        from ..ops import pallas_mode

        use_pallas, interp = pallas_mode()
        sec = mode == "int8_sec"
        kh, kw = self.kernel_size
        pallas_ok = (sec and use_pallas) and not (
            kh * kw == 1 and self.strides == (1, 1))
        if pallas_ok and kh * kw > 1:
            # whole-image-resident kernel design: maps whose full block
            # set (image slab + weights + accumulator + out) cannot fit
            # VMEM (VAE decode 128-512px levels, odd-channel large maps)
            # fall back to the XLA s8 conv. The gate bounds the ACTUAL
            # blocks the kernel allocates — round 4 gated only the image
            # slab and shipped a scoped-VMEM stack OOM at VAE decode
            # shapes (bench_logs/r4_serve_sd15_qvae.err).
            from ..ops.pallas_qconv import conv_fits_vmem

            K_out = self.features
            if dp.kind == "conv_split":
                # dual-conv sum: each half runs its own kernel — gate on
                # the larger half's channel count
                c_gate = max(dp.split, x.shape[3] - dp.split)
            else:
                c_gate = x.shape[3]
            pallas_ok = conv_fits_vmem(
                x.shape[1], x.shape[2], c_gate, K_out, kh, kw, pad,
                stride=self.strides[0])

        def conv_1x1_dot(codes, e, b=None):
            # 1x1 conv IS a matmul — keep it off the conv pipeline
            # entirely (works on every backend)
            B, H, W, C = codes.shape
            y2 = qops.qlinear(codes.reshape(B * H * W, C),
                              e.w_int.reshape(C, -1), e.scale, e.bias0,
                              bias=b, out_dtype=self.dtype)
            return y2.reshape(B, H, W, -1)

        def conv_int8(codes, e, b=None, eb=None, res=None):
            """Returns (y, done): which of bias/extra/res got fused."""
            if sec and kh * kw == 1 and self.strides == (1, 1):
                return conv_1x1_dot(codes, e, b), ("bias",)
            if pallas_ok:
                from ..ops.pallas_qconv import (qconv2d_pallas,
                                                qconv2d_pallas_s2)

                if self.strides == (2, 2):
                    return (qconv2d_pallas_s2(codes, e.w_int, e.scale,
                                              e.bias0, e.zp_shifted,
                                              bias=b, extra_bias=eb,
                                              residual=res, padding=pad,
                                              out_dtype=self.dtype,
                                              interpret=interp),
                            ("bias", "extra", "res"))
                return (qconv2d_pallas(codes, e.w_int, e.scale, e.bias0,
                                       e.zp_shifted, bias=b, extra_bias=eb,
                                       residual=res, padding=pad,
                                       out_dtype=self.dtype,
                                       interpret=interp),
                        ("bias", "extra", "res"))
            return (qops.qconv2d(codes, e.w_int, e.scale, e.bias0,
                                 e.zp_shifted, bias=b, strides=self.strides,
                                 padding=pad, out_dtype=self.dtype),
                    ("bias",))

        if dp.kind == "conv_split":
            s = dp.split
            p0, p1 = dp.part0, dp.part1
            c0 = qops.quantize_per_tensor(x[..., :s], p0.scale_inv,
                                          p0.zp_shifted,
                                          *qops.act_clip_range(p0.a_bits))
            c1 = qops.quantize_per_tensor(x[..., s:], p1.scale_inv,
                                          p1.zp_shifted,
                                          *qops.act_clip_range(p1.a_bits))
            if pallas_ok and self.strides == (1, 1):
                # chain the dual-conv sum through the epilogues: part1
                # absorbs the external residual, part0 absorbs part1
                y1, _ = conv_int8(c1, p1, res=residual)
                y0, done = conv_int8(c0, p0, b=bias, eb=extra_bias, res=y1)
                return finish(y0, done)
            y0, done0 = conv_int8(c0, p0, b=bias)
            y1, _ = conv_int8(c1, p1)
            return finish(y0 + y1, done0)
        codes = (x if pre_codes
                 else qops.quantize_per_tensor(
                     x, dp.scale_inv, dp.zp_shifted,
                     *qops.act_clip_range(dp.a_bits)))
        y, done = conv_int8(codes, dp, b=bias,
                            eb=extra_bias if pallas_ok else None,
                            res=residual if pallas_ok else None)
        return finish(y, done)


class QAct(nn.Module):
    """Standalone activation quantizer (the reference's bare ``ActQuantizer``
    modules attached for q/k/v/softmax tensors, quant_block.py:213-233).

    The module's own path is the layer name (e.g.
    ``...attn1.act_quantizer_q``), matching reference checkpoint keys.
    ``softmax=True`` selects the always-zero softmax spec.
    """

    softmax: bool = False

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx()):
        name = canonical_name(self.path)
        if ctx.collect_stats:
            _sow_act_stats(self, name, x)
        if ctx.mode != "fake":
            return x
        spec = ctx.softmax_aq if (self.softmax and ctx.softmax_aq is not None) else ctx.aq
        return ctx.quant_act(name, x, spec=spec)
