#!/usr/bin/env python
"""Per-op TPU time breakdown of one UNet step (bf16 / int8 / int8_fq /
dequant), via a jax.profiler device trace parsed from the xplane proto.

The reference's nsys / torch.profiler orchestration counterpart
(kernels/quantize_sdxl.py:461-479; kernels/scripts/run_quantize_profile.sh)
— here the trace is captured around a chained lax.scan runner (the same
methodology as bench.py) and XLA Ops events are aggregated into op-class
buckets (quantize, int8 conv/GEMM, bf16 conv/GEMM, norms, attention...)
so the "where do the milliseconds go" question is answered directly.

Usage:
  python scripts/profile_unet.py --mode int8_fq [--inner 8] [--top 30]
"""

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def build_runner(mode: str, family_name: str, B: int, inner: int):
    from mixdq_tpu.models.configs import get_family
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.state import FP_CTX, quantizable_layers, uniform_ctrl

    f = get_family(family_name)
    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(f.unet, dtype=dtype)
    H = f.unet.sample_size
    k = jax.random.PRNGKey(0)
    sample = jax.random.normal(k, (B, H, H, f.unet.in_channels), dtype)
    t = jnp.asarray(999.0)
    ehs = jax.random.normal(k, (B, 77, f.unet.cross_attention_dim), dtype)
    added = None
    if f.unet.addition_embed_type == "text_time":
        pooled = (f.text_encoder_2.projection_dim
                  if f.text_encoder_2 is not None else 1280)
        added = {"text_embeds": jnp.zeros((B, pooled), dtype),
                 "time_ids": jnp.zeros((B, 6), dtype)}
    variables = jax.jit(unet.init)(jax.random.PRNGKey(0), sample, t, ehs, added)

    if mode == "bf16":
        ctx = FP_CTX.replace(attn_impl=os.environ.get("MIXDQ_PROF_ATTN",
                                                      "auto"))
        vars_used = variables
    else:
        from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params

        wq = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
        aq = QuantSpec(running_stat=True)
        names = quantizable_layers(variables["params"])
        qparams = cal.calibrate(unet, variables, [(sample, t, ehs, added)],
                                wq, aq)
        ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)
        compute = {"int8_fq": "int8",
                   "int8_fq_sec": "int8_sec"}.get(mode, mode)
        ctx = deploy_unet_ctx(unet, variables, qparams, ctrl, wq, aq,
                              skip_spatial_convs=(mode == "dequant"),
                              fuse_qkv=mode.startswith("int8_fq"))
        # attn_impl='auto' matches bench.py's headline configuration
        # (sec_attention / flash gating); the QuantCtx default 'einsum'
        # would profile a path the bench never runs
        ctx = ctx.replace(deploy_compute=compute,
                          attn_impl=os.environ.get("MIXDQ_PROF_ATTN",
                                                   "auto"))
        vars_used = jax.device_put(deployed_params(variables, ctx))

    def chained(v, c, s, *rest):
        out = unet.apply(v, s, *rest, c)
        return (out / (1.0 + jnp.abs(out))).astype(s.dtype)

    def scan_fn(v, c, s, *rest):
        def body(carry, _):
            return chained(v, c, carry, *rest), ()
        s, _ = jax.lax.scan(body, s, None, length=inner)
        return s

    run = jax.jit(scan_fn)
    # params/ctx as jit args (closing over them would bake ~2.6GB of
    # weights into the program as constants)
    runner = lambda s, *rest: run(vars_used, ctx, s, *rest)
    runner.jit_fn = run  # expose for .lower() (HLO dumps)
    runner.jit_args = (vars_used, ctx)
    return runner, (sample, t, ehs, added)


_BUCKETS = [
    ("pallas", re.compile(r"custom-call|tpu_custom_call", re.I)),
    ("quantize", re.compile(r"convert|clamp|round", re.I)),
    ("conv", re.compile(r"conv", re.I)),
    ("gemm/dot", re.compile(r"dot|matmul|gemm", re.I)),
    ("reduce/norm", re.compile(r"reduce|norm", re.I)),
    ("elementwise", re.compile(r"fusion|add|multiply|subtract|divide|select|exp|tanh|logistic|max|min", re.I)),
    ("copy/layout", re.compile(r"copy|transpose|reshape|bitcast|pad|slice|concat", re.I)),
]


def _op_head(name: str) -> str:
    """The op's own name, stripped of operand text: matching the FULL hlo
    line buckets an op by its *operands* (e.g. a custom-call whose input
    is %clamp_convert_fusion lands in 'quantize') — only classify on the
    text before the operand list."""
    head = name.split(" = ", 1)
    if len(head) == 2:
        # "%opname = type op-kind(operands...)" -> opname + kind token
        kind = head[1].split("(", 1)[0]
        return head[0] + " " + kind
    return name


def aggregate(trace_dir: str, steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert files, f"no xplane.pb under {trace_dir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(files)[-1], "rb").read())
    per_op = collections.Counter()  # ps
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                per_op[ev_names.get(ev.metadata_id, "?")] += ev.duration_ps
    return per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="int8_fq",
                    choices=["bf16", "int8", "int8_fq", "int8_fq_sec",
                             "dequant"])
    ap.add_argument("--family", default="sdxl-turbo")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2,
                    help="traced scan calls (steps = reps*inner)")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    runner, (sample, t, ehs, added) = build_runner(
        args.mode, args.family, args.batch, args.inner)
    s = runner(sample, t, ehs, added)  # compile + warmup
    jax.block_until_ready(s)

    trace_dir = args.outdir or tempfile.mkdtemp(prefix=f"unet_{args.mode}_")
    steps = args.reps * args.inner
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.reps):
        s = runner(s, t, ehs, added)
    jax.block_until_ready(s)
    jax.profiler.stop_trace()

    per_op = aggregate(trace_dir, steps)
    total_ms = sum(per_op.values()) / 1e9
    print(f"mode={args.mode} total device time: {total_ms:.2f} ms over "
          f"{steps} steps = {total_ms/steps:.3f} ms/step")

    buckets = collections.Counter()
    for name, ps in per_op.items():
        if name.startswith("%while"):
            # the sampler loop op's duration covers its whole body, which
            # is also reported per-op — counting it double-counts the step
            continue
        head = _op_head(name)
        for bname, pat in _BUCKETS:
            if pat.search(head):
                buckets[bname] += ps
                break
        else:
            buckets["other"] += ps
    print("\n-- bucket ms/step --")
    for bname, ps in buckets.most_common():
        print(f"{ps/1e9/steps:8.3f}  {bname}")

    print(f"\n-- top {args.top} ops (ms/step) --")
    for name, ps in per_op.most_common(args.top):
        print(f"{ps/1e9/steps:8.4f}  {name[:110]}")
    print(f"\ntrace dir: {trace_dir}")


if __name__ == "__main__":
    main()
