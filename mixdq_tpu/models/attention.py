"""Attention / transformer blocks with quantization hooks.

Diffusers-parity structure (names match the reference arch dump so
per-layer bit YAMLs apply verbatim):

* ``Attention`` — to_q/to_k/to_v/to_out.0 projections as QDense, optional
  q/k/v/softmax activation quantizers (the reference attaches bare
  ``ActQuantizer`` modules ``act_quantizer_{q,k,v,softmax}``,
  quant_block.py:213-233), and BoS-aware cross-attention: the first text
  token (huge-magnitude BoS embedding) routes through the FP path while
  the rest quantize (quant_block.py:600-625).
* ``FeedForward`` — GEGLU (``ff.net.0.proj`` + ``ff.net.2``).
* ``BasicTransformerBlock`` — attn1 (self) / attn2 (cross) / ff with
  pre-LayerNorms.
* ``Transformer2DModel`` — GroupNorm + (linear|conv) proj_in/out around the
  block stack.

The attention math itself is a single fused-softmax einsum chain — XLA
maps it onto the MXU; no manual head-batching like the reference's
``head_to_batch_dim`` bmm path (quant_block.py:628-636) is needed.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..quant.state import QuantCtx, canonical_name
from .layers import QAct, QDense


class _LNParams(nn.Module):
    """Parameter-only stand-in for nn.LayerNorm (same param names/shapes)
    used by the fused ln_quantize path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


def deploy_res_add(residual, delta, ctx: QuantCtx):
    """Residual add pinned to the model dtype on the real-quant path.

    Without the barrier, XLA's bf16-conversion folding keeps every
    transformer-block residual contribution alive in f32 up to the next
    standalone act-quantize: each to_out/proj GEMM fusion then emits a
    DUPLICATE f32[T, C] copy next to its bf16 output, and the proj_out
    quantize fusion re-reads all of them and re-does the whole add chain
    in f32 (measured ~0.6 ms/step of duplicated HBM traffic at
    SDXL-Turbo B=1, bench_logs/r4_prof_sec2.txt '?' bucket). The barrier
    stops the folding; numerics match the bf16 baseline, which
    accumulates residuals in bf16 anyway."""
    out = residual + delta
    if ctx.mode == "int8" and ctx.deploy is not None:
        out = jax.lax.optimization_barrier(out)
    return out


def materialize_ln_codes(x, ln):
    """Apply the deferred pre-LayerNorm + consumer act-quantize via the
    standalone ``ln_quantize`` kernel — the fallback when a whole-block
    kernel's gates fail at a site and the LN could not fold in-kernel."""
    gamma, beta, dp = ln
    from ..ops import pallas_mode
    from ..ops.pallas_ln_quant import ln_quantize
    from ..ops.qops import act_clip_range

    return ln_quantize(x, gamma, beta, dp.scale_inv, dp.zp_shifted,
                       interpret=pallas_mode()[1],
                       clip=act_clip_range(dp.a_bits))


def ln_fold_args(ln):
    """(gamma, beta, x_scale_inv, x_zp_shifted, x_clip, eps) for the
    whole-block kernels' LN-folded mode."""
    from ..ops.qops import act_clip_range

    gamma, beta, dp = ln
    return (gamma, beta, dp.scale_inv, dp.zp_shifted,
            act_clip_range(dp.a_bits), 1e-5)


def outfuse_enabled(site: str) -> bool:
    """Trace-time A/B knob for the whole-block out-GEMM fusions.
    ``MIXDQ_SEC_OUTFUSE`` = "1" (all sites), "0" (none), or a comma list
    of sites from {attn1, attn2, ff} — used by scripts/sec_ab_bench.py
    to bisect per-site wins on real hardware.

    Default = "attn2" (measured, bench_logs/r4_secab.txt, interleaved
    5-round medians at SDXL-Turbo B=1): attn2-only 8.93 ms/step vs
    split-kernels 9.18, attn1-only 9.24, all-three 9.37, ff-only 10.27.
    Only the cross-attention whole-block kernel wins — its to_q GEMM
    rides k/v panels that are small at every level; the whole-FF kernel
    loses big (the net.2 contraction starves the MXU at hpp=1), and
    attn1 is neutral-to-negative at the 1024-token levels."""
    import os

    v = os.environ.get("MIXDQ_SEC_OUTFUSE", "").strip()
    if not v:  # unset OR set-but-empty (shell var expansion): the
        v = "attn2"  # measured default, NOT "enable all"
    if v == "1":
        return True
    if v == "0":
        return False
    sites = {t.strip() for t in v.split(",") if t.strip()}
    known = {"attn1", "attn2", "ff"}
    if sites - known:
        import warnings

        warnings.warn(f"MIXDQ_SEC_OUTFUSE: unrecognized sites "
                      f"{sorted(sites - known)} (known: {sorted(known)})")
    return site in sites


def fused_ln_entry(ctx: QuantCtx, dense_name: Optional[str]):
    """The deploy entry of ``dense_name`` if its pre-LayerNorm producer
    can fuse into an ln_quantize kernel (int8_sec Pallas path, int8 dense
    entry, on TPU) — the dense-side twin of resnet.fused_gn_entry."""
    if dense_name is None:
        return None
    if ctx.mode != "int8" or ctx.deploy_compute != "int8_sec":
        return None
    if ctx.dequant_small_m:
        # the consumer may switch to weight-only at trace time, which
        # cannot take pre-quantized codes
        return None
    from ..ops import pallas_mode

    if not pallas_mode()[0]:
        return None
    dp = ctx.deploy.get(dense_name) if ctx.deploy else None
    if (dp is None or dp.kind != "linear" or dp.scale_inv is None
            or dp.act_off):
        return None
    return dp


class _BiasParams(nn.Module):
    """Parameter-only stand-in for a QDense bias (same param name/shape/
    dtype) used by the whole-block attention kernels, which consume the
    to_out projection's bias directly instead of calling the layer."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param("bias", nn.initializers.zeros, (self.features,),
                          self.dtype)


class Attention(nn.Module):
    """Multi-head attention with quantizable projections."""

    query_dim: int
    heads: int
    head_dim: int
    cross_attention_dim: Optional[int] = None  # None => self-attention
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states=None,
                 ctx: QuantCtx = QuantCtx(), residual=None, ln=None):
        """``residual``: the transformer block's residual stream (the
        pre-LayerNorm hidden states). When given, the return value is
        ``residual + attention_delta`` — on the whole-block int8_sec
        kernels the add happens INSIDE the kernel epilogue; every other
        path applies ``deploy_res_add``.

        ``ln`` = (gamma, beta, consumer_deploy_entry): the block's
        pre-LayerNorm is DEFERRED — ``hidden_states`` is then the raw
        residual stream. The whole-block kernels fold the LN + consumer
        act-quantize in-kernel; any fallback path first materializes the
        codes via the standalone ``ln_quantize`` kernel (numerically the
        same producer-fusion as before)."""
        inner = self.heads * self.head_dim
        is_cross = encoder_hidden_states is not None
        kv_input = encoder_hidden_states if is_cross else hidden_states
        base = canonical_name(self.path)
        # LN-folding needs the kernel's residual (the raw input) to BE the
        # block residual; the block passes the same array for both
        ln_foldable = ln is not None and residual is hidden_states

        def finish(delta):
            if residual is None:
                return delta
            return deploy_res_add(residual, delta, ctx)

        # Fused QKV/KV projection (int8 deploy only): one shared-act-scale
        # GEMM instead of three — see deploy.fuse_attention_projections.
        dp_f = None
        if ctx.mode == "int8" and ctx.deploy and ctx.fuse_qkv:
            dp_f = ctx.deploy.get(base + (".to_kv" if is_cross else ".to_qkv"))
        if dp_f is not None:
            from .layers import deploy_linear, resolve_compute

            fused_name = base + (".to_kv" if is_cross else ".to_qkv")
            rc = resolve_compute(ctx.deploy_compute, fused_name)
            if (rc == "int8" and ctx.dequant_small_m
                    and dp_f.w_packed is None
                    and kv_input.dtype != jnp.int8
                    and (kv_input.size // kv_input.shape[-1]
                         <= ctx.dequant_small_m)):
                rc = "dequant"  # small-M hybrid, see QuantCtx
            # QKV-fused whole-attention (self-attn, int8_sec): the norm1
            # ln_quantize codes feed ONE kernel that runs the int8 qkv
            # GEMM + MHA + to_out act-quantize — the separate to_qkv
            # GEMM and its [T, 3C] bf16 HBM round-trip disappear.
            if (not is_cross and rc == "int8"
                    and ctx.deploy_compute == "int8_sec"
                    and ctx.attn_impl == "auto"
                    and (kv_input.dtype == jnp.int8 or ln is not None)
                    and kv_input.ndim == 3
                    and dp_f.w_int is not None
                    and dp_f.w_int.dtype == jnp.int8 and not dp_f.act_off):
                from ..ops import pallas_mode
                from ..ops.pallas_sec_attention import (
                    sec_attention_qkv, sec_attention_qkv_ok,
                    sec_attention_qkv_out, sec_attention_qkv_out_ok)

                use_pallas, interp = pallas_mode()
                dp_o = ctx.deploy.get(base + ".to_out.0")
                if (use_pallas and dp_o is not None
                        and dp_o.kind == "linear"
                        and dp_o.scale_inv is not None and not dp_o.act_off):
                    from ..ops.qops import act_clip_range

                    T_, C_ = kv_input.shape[1], kv_input.shape[2]
                    # Whole-block: + to_out int8 GEMM + bias + residual
                    # add inside the same kernel (one op per attn1 site);
                    # with a deferred LN the pre-norm + act-quantize fold
                    # in too and the raw input doubles as the residual
                    if (dp_o.w_int is not None
                            and dp_o.w_int.dtype == jnp.int8
                            and (ln is None or ln_foldable)
                            and outfuse_enabled("attn1")
                            and sec_attention_qkv_out_ok(
                                self.heads, self.head_dim, T_, C_)):
                        bias_o = _BiasParams(self.query_dim,
                                             dtype=self.dtype,
                                             name="to_out_0")()
                        return sec_attention_qkv_out(
                            kv_input, dp_f.w_int, dp_f.scale, dp_f.bias0,
                            dp_o.scale_inv, dp_o.zp_shifted,
                            dp_o.w_int, dp_o.scale, dp_o.bias0,
                            bias_o.astype(jnp.float32),
                            None if ln is not None else residual,
                            heads=self.heads, head_dim=self.head_dim,
                            scale=float(self.head_dim**-0.5),
                            out_dtype=self.dtype, interpret=interp,
                            clip=act_clip_range(dp_o.a_bits),
                            ln_args=(ln_fold_args(ln) if ln is not None
                                     else None))
                    if ln is not None:
                        kv_input = hidden_states = materialize_ln_codes(
                            hidden_states, ln)
                        ln = None
                    if sec_attention_qkv_ok(self.heads, self.head_dim,
                                            T_, C_):
                        codes = sec_attention_qkv(
                            kv_input, dp_f.w_int, dp_f.scale, dp_f.bias0,
                            dp_o.scale_inv, dp_o.zp_shifted,
                            heads=self.heads, head_dim=self.head_dim,
                            scale=float(self.head_dim**-0.5),
                            interpret=interp,
                            clip=act_clip_range(dp_o.a_bits))
                        return finish(QDense(self.query_dim,
                                             dtype=self.dtype,
                                             name="to_out_0")(codes, ctx))
            if not is_cross and ln is not None:
                # deferred LN not consumed by a whole-block kernel:
                # materialize the consumer codes before the fused GEMM
                kv_input = hidden_states = materialize_ln_codes(
                    hidden_states, ln)
                ln = None
            bank_y = (ctx.cross_kv.get(fused_name)
                      if (is_cross and rc == "int8"
                          and ctx.cross_kv is not None) else None)
            if bank_y is not None:
                # hoisted level-batched k/v projection (one einsum per
                # channel group at the UNet top instead of ~70 per-layer
                # GEMMs) — BoS protection already applied in the bank
                y = bank_y
            else:
                y = deploy_linear(kv_input, dp_f, rc, self.dtype)
            # BoS protection on cross-attn k/v (quant_block.py:585-625):
            # FP (precomputed or dequantized-weight) first-token output.
            # Weight-only 'dequant' compute doesn't quantize acts, so the
            # BoS token needs no protection there (mirrors QDense).
            if (bank_y is None
                    and is_cross and ctx.bos_aware and kv_input.ndim >= 3
                    and rc not in ("dequant", "pallas_dequant")):
                if dp_f.bos_out is not None:
                    y0 = jnp.broadcast_to(
                        dp_f.bos_out[None].astype(self.dtype),
                        y.shape[:-2] + (1, dp_f.bos_out.shape[-1]))
                else:
                    w_int = dp_f.w_int
                    if w_int is None:  # packed-W4 fused entry
                        lo = (dp_f.w_packed & 0xF).astype(jnp.int8) - 8
                        hi = (dp_f.w_packed >> 4).astype(jnp.int8) - 8
                        w_int = jnp.concatenate([lo, hi], axis=0)
                    w_fp = (w_int.astype(jnp.float32)
                            * (dp_f.scale * dp_f.scale_inv)[None, :])
                    y0 = jnp.dot(kv_input[..., :1, :].astype(jnp.float32),
                                 w_fp).astype(self.dtype)
                y = jnp.concatenate([y0, y[..., 1:, :]], axis=-2)
            if is_cross:
                # Q-fused whole-attention (cross-attn, int8_sec): the
                # norm2 ln_quantize codes feed ONE kernel that runs the
                # int8 to_q GEMM + MHA over the (BoS-protected) k/v
                # panels of the fused to_kv output + to_out act-quantize
                # — the separate to_q GEMM and its [Tq, C] bf16 HBM
                # round-trip disappear.
                if (ctx.deploy_compute == "int8_sec"
                        and ctx.attn_impl == "auto"
                        and not ctx.dequant_small_m
                        and (hidden_states.dtype == jnp.int8
                             or ln is not None)
                        and hidden_states.ndim == 3
                        and y.dtype != jnp.int8):
                    from ..ops import pallas_mode
                    from ..ops.pallas_sec_attention import (
                        sec_attention_q, sec_attention_q_ok,
                        sec_attention_q_out, sec_attention_q_out_ok)

                    use_pallas, interp = pallas_mode()
                    dp_q = ctx.deploy.get(base + ".to_q")
                    dp_o = ctx.deploy.get(base + ".to_out.0")
                    if (use_pallas and dp_q is not None
                            and dp_q.kind == "linear"
                            and dp_q.w_int is not None
                            and dp_q.w_int.dtype == jnp.int8
                            and not dp_q.act_off
                            and dp_o is not None and dp_o.kind == "linear"
                            and dp_o.scale_inv is not None
                            and not dp_o.act_off):
                        from ..ops.qops import act_clip_range

                        Tq_, Tk_ = hidden_states.shape[1], y.shape[1]
                        Cin_ = hidden_states.shape[2]
                        # Whole-block: + to_out int8 GEMM + bias +
                        # residual add inside the same kernel; deferred
                        # LN folds in too
                        if (dp_o.w_int is not None
                                and dp_o.w_int.dtype == jnp.int8
                                and (ln is None or ln_foldable)
                                and outfuse_enabled("attn2")
                                and sec_attention_q_out_ok(
                                    self.heads, self.head_dim, Tq_, Tk_,
                                    Cin_, 0, inner)):
                            bias_o = _BiasParams(self.query_dim,
                                                 dtype=self.dtype,
                                                 name="to_out_0")()
                            return sec_attention_q_out(
                                hidden_states, dp_q.w_int, dp_q.scale,
                                dp_q.bias0, y, y, dp_o.scale_inv,
                                dp_o.zp_shifted, dp_o.w_int, dp_o.scale,
                                dp_o.bias0, bias_o.astype(jnp.float32),
                                None if ln is not None else residual,
                                heads=self.heads, head_dim=self.head_dim,
                                scale=float(self.head_dim**-0.5),
                                k_off=0, v_off=inner,
                                out_dtype=self.dtype, interpret=interp,
                                clip=act_clip_range(dp_o.a_bits),
                                ln_args=(ln_fold_args(ln) if ln is not None
                                         else None))
                        if ln is not None:
                            hidden_states = materialize_ln_codes(
                                hidden_states, ln)
                            ln = None
                        if sec_attention_q_ok(self.heads, self.head_dim,
                                              Tq_, Tk_, Cin_, 0, inner):
                            codes = sec_attention_q(
                                hidden_states, dp_q.w_int, dp_q.scale,
                                dp_q.bias0, y, y, dp_o.scale_inv,
                                dp_o.zp_shifted,
                                heads=self.heads, head_dim=self.head_dim,
                                scale=float(self.head_dim**-0.5),
                                k_off=0, v_off=inner, interpret=interp,
                                clip=act_clip_range(dp_o.a_bits))
                            return finish(QDense(self.query_dim,
                                                 dtype=self.dtype,
                                                 name="to_out_0")(codes,
                                                                  ctx))
                if ln is not None:
                    hidden_states = materialize_ln_codes(hidden_states, ln)
                    ln = None
                q = QDense(inner, use_bias=False, dtype=self.dtype,
                           name="to_q")(hidden_states, ctx)
                srcs, offs = (q, y, y), (0, 0, inner)
            else:
                srcs, offs = (y, y, y), (0, inner, 2 * inner)
        else:
            if ln is not None:
                hidden_states = materialize_ln_codes(hidden_states, ln)
                if not is_cross:
                    kv_input = hidden_states
                ln = None
            q = QDense(inner, use_bias=False, dtype=self.dtype, name="to_q")(
                hidden_states, ctx)
            # BoS protection applies to cross-attn k/v over text embeddings
            # (quant_block.py:585-625).
            k = QDense(inner, use_bias=False, dtype=self.dtype, name="to_k")(
                kv_input, ctx, bos_aware=is_cross)
            v = QDense(inner, use_bias=False, dtype=self.dtype, name="to_v")(
                kv_input, ctx, bos_aware=is_cross)
            srcs, offs = (q, k, v), (0, 0, 0)

        # Whole-attention Pallas kernel (int8_sec, T<=1024 levels): ONE
        # custom call computes QK^T+softmax+PV reading q/k/v straight out
        # of the projection outputs via lane offsets (no split/transpose
        # ops) and emits to_out's int8 act codes — producer-side int8
        # emission for the attention chain. The reference never
        # accelerates attention (quant_block.py:628-652 keeps torch bmm).
        if (ctx.mode == "int8" and ctx.deploy_compute == "int8_sec"
                and ctx.attn_impl == "auto" and not ctx.dequant_small_m
                and ctx.deploy):
            from ..ops import pallas_mode
            from ..ops.pallas_sec_attention import (sec_attention,
                                                    sec_attention_ok)

            use_pallas, interp = pallas_mode()
            dp_o = ctx.deploy.get(base + ".to_out.0")
            Tq_, Tk_ = srcs[0].shape[1], srcs[1].shape[1]
            if (use_pallas and dp_o is not None and dp_o.kind == "linear"
                    and dp_o.scale_inv is not None and not dp_o.act_off
                    and sec_attention_ok(self.heads, self.head_dim,
                                         Tq_, Tk_, *offs)):
                from ..ops.qops import act_clip_range

                codes = sec_attention(
                    *srcs, dp_o.scale_inv, dp_o.zp_shifted,
                    heads=self.heads, head_dim=self.head_dim,
                    scale=float(self.head_dim**-0.5),
                    q_off=offs[0], k_off=offs[1], v_off=offs[2],
                    interpret=interp, clip=act_clip_range(dp_o.a_bits))
                return finish(QDense(self.query_dim, dtype=self.dtype,
                                     name="to_out_0")(codes, ctx))

        if dp_f is not None:
            if is_cross:
                k, v = jnp.split(y, 2, axis=-1)
            else:
                q, k, v = jnp.split(y, 3, axis=-1)

        if ctx.qkv_quant:
            q = QAct(name="act_quantizer_q")(q, ctx)
            k = QAct(name="act_quantizer_k")(k, ctx)
            v = QAct(name="act_quantizer_v")(v, ctx)

        B, Tq, _ = q.shape
        Tk = k.shape[1]
        q = q.reshape(B, Tq, self.heads, self.head_dim)
        k = k.reshape(B, Tk, self.heads, self.head_dim)
        v = v.reshape(B, Tk, self.heads, self.head_dim)

        scale = self.head_dim**-0.5
        # Flash kernels bypass the materialized probs tensor, so they are
        # incompatible with the (simulation-only) softmax fake-quantizer;
        # fall back to the einsum chain whenever it is active.
        fake_sm = ctx.mode == "fake" and ctx.qkv_quant
        impl = ctx.attn_impl
        if impl == "auto":
            # measured crossover (TPU v5e): the Pallas flash kernels beat
            # the XLA einsum chain only when the logits matrix is large
            # (T=4096: 1.28x; T<=1024: 0.8-1.0x — d=64 pads to 128 lanes)
            impl = "flash" if Tq * Tk >= 2**22 else "einsum"
            # int8 deploy path, large-T SELF-attention: optionally run the
            # flash matmuls on the int8 MXU (dynamic per-tensor q/k/v
            # quant — the deploy analogue of the reference's q/k/v/softmax
            # act quantizers, quant_block.py:213-233). Cross-attn keeps
            # bf16: its BoS text token's magnitude would poison a
            # per-tensor dynamic scale (the very problem BoS protection
            # exists for). MEASURED NEUTRAL-TO-NEGATIVE at SDXL-1024
            # (bench_logs/r5_flash_ab_1024.txt, interleaved 5-round
            # medians: bf16 45.48 ms/step, int8qk 45.81, int8qkv 46.05;
            # UNet-output SQNR identical at 23.8 dB) — the T=4096 flash
            # kernel is softmax/VPU-bound, not MXU-bound, so int8 math
            # buys nothing and pays its re-quantize overhead. Default is
            # therefore bf16; MIXDQ_INT8_FLASH: "1" full-int8 / "qk"
            # QK^T-only / "0" bf16 flash (default) — trace-time A/B knob.
            if impl == "flash" and ctx.mode == "int8" and not is_cross:
                knob = os.environ.get("MIXDQ_INT8_FLASH", "0").strip()
                if knob == "1":
                    impl = "int8qkv_flash"
                elif knob == "qk":
                    impl = "int8_flash"
        if (impl != "einsum" and not fake_sm
                and jax.default_backend() != "cpu"):
            from ..ops import pallas_attention as pa

            if impl == "int8qkv_flash":
                out = pa.int8qkv_mha(q, k, v, scale, out_dtype=self.dtype)
            elif impl == "int8_flash":
                out = pa.int8_mha(q, k, v, scale, out_dtype=self.dtype)
            else:
                out = pa.mha(q, k, v, scale)
            out = out.reshape(B, Tq, inner).astype(self.dtype)
        else:
            # head-major batched matmuls: einsums with the head axis in
            # different positions ("bqhd,bkhd->bhqk" / "bhqk,bkhd->bqhd")
            # make XLA lower the contraction as a base-dilated
            # *convolution* inside a loop fusion (measured ~2x the bmm
            # time at T=1024, and it drags the downstream to_out
            # quantize into the same slow fusion on the int8 path);
            # aligning batch dims (b, h) on both operands yields plain
            # MXU batched GEMMs
            qh = q.transpose(0, 2, 1, 3)  # [B, h, Tq, d]
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
            probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            if ctx.qkv_quant and ctx.softmax_aq is not None:
                probs = QAct(softmax=True, name="act_quantizer_softmax")(probs, ctx)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
            out = out.transpose(0, 2, 1, 3).reshape(B, Tq, inner)

        out = QDense(self.query_dim, dtype=self.dtype, name="to_out_0")(out, ctx)
        return finish(out)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx(), consumer_dp=None,
                 out_gemm=None):
        """``consumer_dp``: the downstream ff.net.2 deploy entry — when the
        fused GEGLU kernel applies (``layers.geglu_fusable``), the proj
        GEMM + gate + that consumer's act-quantize run as ONE Pallas call
        and the return value is the consumer's int8 codes [..., inner].

        ``out_gemm``: (net2_bias, residual, ln) — the whole-FF kernel:
        the ff.net.2 int8 GEMM + bias + block residual add also fold into
        the same call and the return value is bf16 [..., dim] (the
        updated hidden states); with ``ln`` set the pre-LayerNorm + proj
        act-quantize fold in too (``x`` raw, doubling as the residual).
        Callers must have checked ``geglu_out_ok``."""
        from .layers import geglu_fusable

        base = canonical_name(self.path)
        dp_p = (ctx.deploy.get(f"{base}.proj")
                if ctx.mode == "int8" and ctx.deploy else None)
        if consumer_dp is not None and geglu_fusable(ctx, dp_p, consumer_dp):
            if out_gemm is not None:
                from ..ops import pallas_mode
                from ..ops.pallas_qmatmul import geglu_out_qmatmul
                from ..ops.qops import act_clip_range, quantize_per_tensor

                net2_bias, residual, ln = out_gemm
                bias_p = _BiasParams(self.inner_dim * 2, dtype=self.dtype,
                                     name="proj")()
                if ln is not None:
                    codes = x.astype(self.dtype)  # raw input, LN in-kernel
                else:
                    codes = (x if x.dtype == jnp.int8
                             else quantize_per_tensor(
                                 x.astype(self.dtype), dp_p.scale_inv,
                                 dp_p.zp_shifted,
                                 *act_clip_range(dp_p.a_bits)))
                lead = codes.shape[:-1]
                C_out = consumer_dp.w_int.shape[1]
                out = geglu_out_qmatmul(
                    codes.reshape(-1, codes.shape[-1]), dp_p.w_int,
                    dp_p.scale, dp_p.bias0, consumer_dp.scale_inv,
                    consumer_dp.zp_shifted, consumer_dp.w_int,
                    consumer_dp.scale, consumer_dp.bias0,
                    bias=bias_p.astype(jnp.float32),
                    out_bias=(None if net2_bias is None
                              else net2_bias.astype(jnp.float32)),
                    residual=(None if residual is None or ln is not None
                              else residual.reshape(-1, C_out)),
                    gelu_tanh=(ctx.gelu == "tanh"),
                    clip=act_clip_range(consumer_dp.a_bits),
                    out_dtype=self.dtype, interpret=pallas_mode()[1],
                    ln_args=(ln_fold_args(ln) if ln is not None else None))
                return out.reshape(*lead, C_out)
            return QDense(self.inner_dim * 2, dtype=self.dtype,
                          name="proj")(x, ctx, geglu_out=consumer_dp)
        h = QDense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x, ctx)
        h, gate = jnp.split(h, 2, axis=-1)
        # tanh-approx by default (ctx.gelu): exact erf gelu lowers to a
        # ~35-op f32 erfc polynomial on TPU — see QuantCtx.gelu.
        # 'sigmoid' = x*sigmoid(1.702x), the shortest VPU chain (kept
        # available on the sim path so a sigmoid-gated deploy kernel can
        # stay sim/deploy-matched).
        if ctx.gelu == "sigmoid":
            return h * (gate * nn.sigmoid(1.702 * gate))
        return h * nn.gelu(gate, approximate=(ctx.gelu == "tanh"))


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx(), residual=None,
                 ln=None):
        """``residual``: the transformer block's residual stream. When
        given, the return value is ``residual + ff_delta`` — inside the
        whole-FF kernel epilogue on the int8_sec path, via
        ``deploy_res_add`` otherwise. ``ln``: deferred pre-LayerNorm
        (see ``Attention.__call__``)."""
        inner = self.dim * self.mult
        base = canonical_name(self.path)
        dp_2 = (ctx.deploy.get(f"{base}.net.2")
                if ctx.mode == "int8" and ctx.deploy else None)
        dp_p = (ctx.deploy.get(f"{base}.net.0.proj")
                if ctx.mode == "int8" and ctx.deploy else None)
        # Whole-FF kernel: GEGLU + ff.net.2 GEMM + bias + residual add in
        # one call (one op per ff site); deferred LN folds in too
        from .layers import geglu_fusable

        if (dp_2 is not None and geglu_fusable(ctx, dp_p, dp_2)
                and dp_2.w_int is not None and dp_2.w_int.dtype == jnp.int8):
            from ..ops.pallas_qmatmul import geglu_out_ok

            M = x.size // x.shape[-1]
            K, C_out = x.shape[-1], dp_2.w_int.shape[1]
            ln_foldable = (ln is not None and residual is x
                           and K % 128 == 0 and C_out == K)
            if ((ln is None or ln_foldable) and outfuse_enabled("ff")
                    and geglu_out_ok(M, K, inner, C_out)):
                bias2 = _BiasParams(self.dim, dtype=self.dtype,
                                    name="net_2")()
                return GEGLU(inner, dtype=self.dtype, name="net_0")(
                    x, ctx, consumer_dp=dp_2,
                    out_gemm=(bias2, residual, ln))
        if ln is not None:
            x = materialize_ln_codes(x, ln)
        x = GEGLU(inner, dtype=self.dtype, name="net_0")(x, ctx,
                                                         consumer_dp=dp_2)
        x = QDense(self.dim, dtype=self.dtype, name="net_2")(x, ctx)
        if residual is not None:
            return deploy_res_add(residual, x, ctx)
        return x


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int
    cross_attention_dim: int
    dtype: Any = jnp.float32

    def _ln(self, x, idx: int, consumer: Optional[str], ctx: QuantCtx):
        """Pre-LayerNorm: plain bf16 LayerNorm, or — when the consumer
        dense layer is int8_sec-fusable — DEFERRED: returns the raw input
        plus ``(gamma, beta, consumer_entry)`` so the sub-module can fold
        the LN + act-quantize into its whole-block kernel (falling back
        to the standalone ln_quantize producer kernel)."""
        dp = fused_ln_entry(ctx, consumer)
        if dp is not None:
            import os

            gamma, beta = _LNParams(x.shape[-1], name=f"norm{idx}")()
            if os.environ.get("MIXDQ_SEC_LNFOLD", "1") == "0":
                # A/B knob: standalone producer kernel instead of the
                # in-kernel LN fold (trace-time switch, bench only)
                return materialize_ln_codes(x, (gamma, beta, dp)), None
            return x, (gamma, beta, dp)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name=f"norm{idx}")(x), None

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states,
                 ctx: QuantCtx = QuantCtx()):
        base = canonical_name(self.path)
        # producer-fused LN -> int8 codes for the downstream dense layers
        # (norm1 only when the fused to_qkv entry guarantees ONE shared
        # act scale across q/k/v; norm2 feeds attn2.to_q alone; norm3
        # feeds ff.net.0.proj alone)
        h, ln1 = self._ln(hidden_states, 1,
                          f"{base}.attn1.to_qkv" if ctx.fuse_qkv else None,
                          ctx)
        # the residual add rides Attention: inside the whole-block kernel
        # epilogue on the int8_sec path, deploy_res_add otherwise
        hidden_states = Attention(
            self.dim, self.heads, self.head_dim, dtype=self.dtype, name="attn1"
        )(h, None, ctx, residual=hidden_states, ln=ln1)

        h, ln2 = self._ln(hidden_states, 2, f"{base}.attn2.to_q", ctx)
        hidden_states = Attention(
            self.dim, self.heads, self.head_dim,
            cross_attention_dim=self.cross_attention_dim,
            dtype=self.dtype, name="attn2",
        )(h, encoder_hidden_states, ctx, residual=hidden_states, ln=ln2)

        h, ln3 = self._ln(hidden_states, 3, f"{base}.ff.net.0.proj", ctx)
        hidden_states = FeedForward(self.dim, dtype=self.dtype, name="ff")(
            h, ctx, residual=hidden_states, ln=ln3)
        return hidden_states


class Transformer2DModel(nn.Module):
    """Spatial transformer: NHWC feature map -> tokens -> blocks -> map."""

    in_channels: int
    heads: int
    head_dim: int
    num_layers: int
    cross_attention_dim: int
    use_linear_projection: bool = True
    norm_num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states,
                 ctx: QuantCtx = QuantCtx()):
        from .layers import QConv  # local import to avoid cycle at module load

        B, H, W, C = hidden_states.shape
        inner = self.heads * self.head_dim
        residual = hidden_states

        from .resnet import fused_gn_entry

        name = canonical_name(self.path)
        dp_in = fused_gn_entry(ctx, f"{name}.proj_in", kind="linear") if (
            self.use_linear_projection and not ctx.dequant_small_m) else None
        if dp_in is not None:
            # producer-fused GroupNorm (no SiLU) emitting proj_in's int8
            # codes — same kernel as the resnet chains, silu=False
            from ..ops import pallas_mode
            from ..ops.pallas_gn_quant import gn_silu_quantize

            from .resnet import _GNParams

            from ..ops.qops import act_clip_range

            gamma, beta = _GNParams(C, name="norm")()
            h = gn_silu_quantize(hidden_states, gamma, beta, dp_in.scale_inv,
                                 dp_in.zp_shifted, groups=self.norm_num_groups,
                                 eps=1e-6, silu=False,
                                 interpret=pallas_mode()[1],
                                 clip=act_clip_range(dp_in.a_bits))
            h = h.reshape(B, H * W, C)
            h = QDense(inner, dtype=self.dtype, name="proj_in")(h, ctx)
        elif self.use_linear_projection:
            h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                             dtype=self.dtype, name="norm")(hidden_states)
            h = h.reshape(B, H * W, C)
            h = QDense(inner, dtype=self.dtype, name="proj_in")(h, ctx)
        else:
            h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                             dtype=self.dtype, name="norm")(hidden_states)
            h = QConv(inner, kernel_size=(1, 1), padding=0, dtype=self.dtype,
                      name="proj_in")(h, ctx)
            h = h.reshape(B, H * W, inner)

        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                inner, self.heads, self.head_dim, self.cross_attention_dim,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(h, encoder_hidden_states, ctx)

        if self.use_linear_projection:
            h = QDense(self.in_channels, dtype=self.dtype, name="proj_out")(h, ctx)
            h = h.reshape(B, H, W, self.in_channels)
        else:
            h = h.reshape(B, H, W, inner)
            h = QConv(self.in_channels, kernel_size=(1, 1), padding=0,
                      dtype=self.dtype, name="proj_out")(h, ctx)
        return deploy_res_add(residual, h, ctx)
