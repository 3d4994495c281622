#!/usr/bin/env bash
# Round-4 sequential TPU job queue (single chip — jobs must not overlap).
# Covers VERDICT r3 items #3 (B-sweep + SD1.5 int8+int8-VAE serving),
# #4 (memory table {bf16, W8A8, MP-W5.02, W4-packed} x {static, peak}),
# and #8 (SDXL-1024 / SD1.5 B=1 re-measures).
set -u
cd /root/repo
L=bench_logs
RF=configs/mp/sdxl_turbo/reference_final

run() {  # run <tag> <cmd...>
    local tag=$1; shift
    echo "== $tag: $* ==" >&2
    timeout 2400 "$@" > "$L/$tag.json" 2> "$L/$tag.err"
    echo "== $tag rc=$? ==" >&2
}

# 1. Controlled same-session B-sweep (VERDICT #3)
run r4_bsweep python scripts/batch_sweep.py --batches 1,2,4,8 --rounds 3

# 2. SD1.5 4-step serving: int8 UNet + int8 VAE decoder vs plain int8
#    (VERDICT #3; qparams are regenerable artifacts)
if [ ! -f outputs/sd15/qparams.msgpack ]; then
    run r4_sd15_calib python scripts/gen_calib_data.py \
        --config outputs/sd15/config.yaml
    run r4_sd15_ptq python scripts/ptq.py --config outputs/sd15/config.yaml \
        --outdir outputs/sd15
fi
run r4_serve_sd15_qvae python scripts/serve_bench.py --base_path outputs/sd15 \
    --steps 4 --batch_size 4 --quantize_vae
run r4_serve_sd15_plain python scripts/serve_bench.py \
    --base_path outputs/sd15 --steps 4 --batch_size 4

# 3. Memory table (VERDICT #4): static/peak per operating point. ms/step
#    rows come from bench.py lines below; reference claim to beat: 3.4x
#    W4A8 static (ref README.md:28), 1.94x W8A8 (README.md:41-45).
run r4_mem_w8 python scripts/memory_compare.py --compute int8_sec --json
run r4_mem_w4packed python scripts/memory_compare.py --w_bits 4 --pack_w4 \
    --compute dequant --json
run r4_mem_mp502 python scripts/memory_compare.py --compute dequant \
    --pack_w4 --mp_w $RF/weight_5.02.yaml --mp_a $RF/act_7.77.yaml \
    --act_protect $RF/act_protect_reference.yaml --json

# 4. ms/step at the same operating points (VERDICT #4 latency column;
#    MP now measured on the REAL elected reference-final configs)
MIXDQ_BENCH_MP_W=$RF/weight_5.02.yaml \
MIXDQ_BENCH_MP_A=$RF/act_7.77.yaml \
MIXDQ_BENCH_MP_PROTECT=$RF/act_protect_reference.yaml \
run r4_bench_mp502 python bench.py
MIXDQ_BENCH_WBITS=4 run r4_bench_w4 python bench.py

echo "r4 queue done" >&2
# Family re-measures (VERDICT #8) live in r4_family_bench.sh — they run
# LAST, after the round's kernel work freezes, so they include it.
