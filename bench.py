#!/usr/bin/env python
"""Benchmark: SDXL-Turbo UNet step latency, quantized vs bf16, on the
available accelerator (TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value = quantized UNet ms/step and vs_baseline = bf16_ms / quant_ms
(speedup over the bf16 baseline on the same hardware — the reference's
headline is W8A8 1.27-1.45x over FP16 on GPUs, README.md:48-53; the TPU
north star is >=1.3x, BASELINE.json).

Extra detail lines go to stderr so stdout stays one JSON line.

Env knobs: MIXDQ_BENCH_FAMILY (default sdxl-turbo), MIXDQ_BENCH_BATCH
(default 1), MIXDQ_BENCH_BACKEND (int8|fake, default int8 when kernels
available), MIXDQ_BENCH_ITERS (default 20).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    family_name = os.environ.get("MIXDQ_BENCH_FAMILY", "sdxl-turbo")
    B = int(os.environ.get("MIXDQ_BENCH_BATCH", "1"))
    iters = int(os.environ.get("MIXDQ_BENCH_ITERS", "10"))
    backend = os.environ.get("MIXDQ_BENCH_BACKEND", "auto")

    from mixdq_tpu.models.configs import get_family
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.state import QuantCtx, quantizable_layers, uniform_ctrl

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

    log(f"bench: {family_name} B={B} on {jax.devices()[0]}")
    t0 = time.time()
    variables = jax.jit(unet.init)(jax.random.PRNGKey(0), sample, t, ehs, added)
    jax.block_until_ready(variables)
    log(f"init: {time.time()-t0:.1f}s")

    inner = int(os.environ.get("MIXDQ_BENCH_INNER", "8"))

    def make_runner(fn):
        """Jit a runner of ``inner`` chained steps: each step consumes the
        previous step's output (UNet in/out shapes match), so executions
        form a true dependency chain — immune to any result caching or
        overlap in the remote execution path, and representative of the
        real sampler loop. The chain runs INSIDE one jit (lax.scan) so
        the per-dispatch overhead of the remote TPU tunnel (~2 ms/call)
        is amortized to ~2/inner ms. Jitted ONCE per variant (a fresh
        closure per measurement would recompile the UNet every round)."""
        def chained(s, *rest):
            out = fn(s, *rest)
            # keep the chained values bounded so repeated random-weight
            # UNet applications can't overflow
            return (out / (1.0 + jnp.abs(out))).astype(s.dtype)

        def scan_fn(s, *rest):
            def body(c, _):
                return chained(c, *rest), ()
            s, _ = jax.lax.scan(body, s, None, length=inner)
            return s

        return jax.jit(scan_fn)

    def timeit(cf, *args):
        s = args[0]
        rest = args[1:]
        s = cf(s, *rest)  # compile (cached after the first round)
        jax.block_until_ready(s)
        s = cf(s, *rest)
        jax.block_until_ready(s)
        t0 = time.time()
        for _ in range(iters):
            s = cf(s, *rest)
        jax.block_until_ready(s)
        return (time.time() - t0) / (iters * inner) * 1000.0

    # bf16 baseline (sample is the chained arg -> first)
    attn = os.environ.get("MIXDQ_BENCH_ATTN", "auto")
    from mixdq_tpu.quant.state import FP_CTX
    fp_ctx = FP_CTX.replace(attn_impl=attn)
    fp_fn = lambda s, v, tt, e, a: unet.apply(v, s, tt, e, a, fp_ctx)

    # quantized path
    wq = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    aq = QuantSpec(running_stat=True)
    w_bits = int(os.environ.get("MIXDQ_BENCH_WBITS", "8"))
    names = quantizable_layers(variables["params"])
    qparams = cal.calibrate(unet, variables, [(sample, t, ehs, added)], wq, aq)
    ctrl = uniform_ctrl(names, w_bits=w_bits, a_bits=8)

    # Mixed-precision deploy bench (the reference's actual headline
    # configuration — W4A8-mixed 1.5x/3.4x, README.md:28): point these at
    # the elected final_config YAMLs + act-protect list, e.g.
    #   MIXDQ_BENCH_MP_W=configs/mp/sdxl_turbo/final_config/weight/5.04.yaml
    #   MIXDQ_BENCH_MP_A=configs/mp/sdxl_turbo/final_config/act/7.43.yaml
    #   MIXDQ_BENCH_MP_PROTECT=configs/mp/sdxl_turbo/act_protect.yaml
    mp_w = os.environ.get("MIXDQ_BENCH_MP_W")
    mp_a = os.environ.get("MIXDQ_BENCH_MP_A")
    mp_protect = os.environ.get("MIXDQ_BENCH_MP_PROTECT")
    mp_label = ""
    if mp_w or mp_a or mp_protect:
        import yaml

        from mixdq_tpu.quant.state import apply_bitwidth_config, protect_layers

        cb = wq.candidate_bits
        if mp_w:
            with open(mp_w) as fh:
                ctrl = apply_bitwidth_config(ctrl, yaml.safe_load(fh),
                                             "weight", cb)
            mp_label += f" W{os.path.basename(mp_w).rsplit('.', 1)[0]}"
        if mp_protect:
            with open(mp_protect) as fh:
                ctrl = protect_layers(ctrl, yaml.safe_load(fh), "act")
        if mp_a:
            with open(mp_a) as fh:
                ctrl = apply_bitwidth_config(ctrl, yaml.safe_load(fh),
                                             "act", cb)
            mp_label += f"A{os.path.basename(mp_a).rsplit('.', 1)[0]}"

    q_fn = lambda s, v, c, tt, e, a: unet.apply(v, s, tt, e, a, c)

    # Build all candidate quant variants, then measure INTERLEAVED with
    # the bf16 baseline across rounds and take per-mode minimums: this
    # environment migrates between hosts with very different perf
    # characteristics, so sequential per-mode measurement is unfair.
    variants = {}
    if backend in ("int8", "int8_fq", "int8_fq_sec", "dequant", "auto"):
        from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
        # auto = the shipped contenders (the losing experimental modes —
        # fused_int8 / int8_tf / int8_cd / int8_pc — were removed after
        # in-model benchmarks, DESIGN_NOTES.md)
        modes = ([backend] if backend != "auto"
                 else ["int8", "int8_fq", "int8_fq_sec"])
        for m in modes:
            # int8_fq = int8 compute + fused QKV/KV attention projections
            # (one shared-act-scale GEMM instead of three);
            # int8_fq_sec: + whole-section pallas convs — every conv is a
            # Pallas int8 implicit-GEMM kernel (stride-2 via s2d, 1x1 as
            # dots), so no XLA conv remains to be layout-poisoned
            compute = {"int8_fq": "int8",
                       "int8_fq_sec": "int8_sec"}.get(m, m)
            # dequant mode keeps spatial convs FP (convert fuses into
            # matmuls but not convs; dense = 87% of SDXL weights)
            # W4: dense weights ship halves-packed in every mode — the
            # int8 modes unpack in-graph (hoisted out of the sampler
            # scan, full int8 speed); dequant mode uses the pallas wq4
            # kernel (no transient unpacked copy, slower)
            pack = w_bits == 4 or bool(mp_w)  # MP elects W<=4 layers
            ctx = deploy_unet_ctx(unet, variables, qparams, ctrl, wq, aq,
                                  skip_spatial_convs=(m == "dequant"),
                                  pack_w4=pack,
                                  fuse_qkv=m.startswith("int8_fq"))
            if pack and m != "dequant":
                # latency-optimal W4: unpack once outside the sampler
                # loop (4x checkpoint, W8A8-speed steps); 'dequant' keeps
                # the packed pallas-wq4 route (4x resident end-to-end)
                from mixdq_tpu.quant.deploy import unpack_packed_entries
                ctx = ctx.replace(deploy=unpack_packed_entries(ctx.deploy))
            # small-M hybrid measured slower at B=1 (see QuantCtx
            # .dequant_small_m) — off unless explicitly requested
            small_m = int(os.environ.get("MIXDQ_BENCH_SMALLM", "0"))
            ctx = ctx.replace(deploy_compute=compute, attn_impl=attn,
                              dequant_small_m=(small_m
                                               if compute == "int8_sec"
                                               else 0))
            q_vars = jax.device_put(deployed_params(variables, ctx))
            variants[m] = (q_vars, ctx)
    else:
        ctx = QuantCtx(qparams=qparams, ctrl=ctrl, mode="fake", wq=wq, aq=aq)
        variants[backend] = (variables, ctx)

    # The host can migrate MID-BENCH with ~10x perf swings, so absolute
    # per-mode minima are incomparable. Measure each quant mode PAIRED
    # with a bf16 measurement taken immediately before it, keep the
    # per-pair speedup ratio, and report the median ratio across rounds.
    rounds = int(os.environ.get("MIXDQ_BENCH_ROUNDS", "3"))
    import statistics

    fp_runner = make_runner(fp_fn)
    q_runner = make_runner(q_fn)  # one jit object; per-ctx cache entries

    ratios = {m: [] for m in variants}
    times = {m: [] for m in variants}
    fp_times = []
    for r in range(rounds):
        for m, (qv, cm) in variants.items():
            fp = timeit(fp_runner, sample, variables, t, ehs, added)
            qm = timeit(q_runner, sample, qv, cm, t, ehs, added)
            ratios[m].append(fp / qm)
            times[m].append(qm)
            fp_times.append(fp)
            log(f"round {r} {m}: bf16={fp:.2f}ms {m}={qm:.2f}ms "
                f"ratio={fp/qm:.3f}")
    med = {m: statistics.median(rs) for m, rs in ratios.items()}
    backend = max(med, key=med.get)
    q_ms = statistics.median(times[backend])
    fp_ms = q_ms * med[backend]
    log(f"bf16 UNet: {statistics.median(fp_times):.2f} ms/step (median)")
    for m in variants:
        log(f"{m} UNet: {statistics.median(times[m]):.2f} ms/step "
            f"(median speedup {med[m]:.3f}x)")

    # memory accounting via XLA buffer assignment (device memory_stats is
    # unavailable through the axon tunnel); costs two extra compiles, so
    # opt-in to keep the default bench runtime bounded
    try:
        if os.environ.get("MIXDQ_BENCH_MEM", "0") != "1":
            raise RuntimeError("set MIXDQ_BENCH_MEM=1 to enable")
        best_vars, best_ctx = variants[backend]
        cf = jax.jit(q_fn).lower(sample, best_vars, best_ctx, t, ehs,
                                 added).compile()
        ma = cf.memory_analysis()
        log(f"{backend} memory: args {ma.argument_size_in_bytes/1e6:.0f} MB, "
            f"temps {ma.temp_size_in_bytes/1e6:.0f} MB, "
            f"peak {ma.peak_memory_in_bytes/1e6:.0f} MB")
        cf0 = jax.jit(fp_fn).lower(sample, variables, t, ehs, added).compile()
        ma0 = cf0.memory_analysis()
        log(f"bf16 memory: args {ma0.argument_size_in_bytes/1e6:.0f} MB, "
            f"peak {ma0.peak_memory_in_bytes/1e6:.0f} MB")
    except Exception as e:
        log(f"memory analysis unavailable: {e}")

    from mixdq_tpu.utils.profiling import host_fingerprint

    bits_tag = mp_label.strip() if mp_label else f"W{w_bits}A8"
    print(json.dumps({
        "metric": f"{family_name} UNet {bits_tag}({backend}) ms/step (B={B})",
        "value": round(q_ms, 2),
        "unit": "ms",
        "vs_baseline": round(fp_ms / q_ms, 3),
        # host-class attribution fields (VERDICT r4 Weak #7): the paired
        # bf16 window this ratio was measured against, and a fixed-size
        # matmul calibration number identifying the host speed class
        "bf16_ms": round(fp_ms, 2),
        "host_fingerprint_ms": host_fingerprint(),
    }))


if __name__ == "__main__":
    main()
