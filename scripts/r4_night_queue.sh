#!/usr/bin/env bash
# Round-4 post-A/B sequential TPU queue: the remaining VERDICT r3 items
# after the whole-block fusion defaults are settled (sec_ab_bench).
# Covers the crashed first-pass jobs (memory table, SD1.5 serving), the
# MP/W4 latency rows, and the family re-measures.
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

# memory table rows (VERDICT #4)
run r4_mem_w8 python scripts/memory_compare.py --compute int8_sec --json
run r4_mem_w4packed python scripts/memory_compare.py --w_bits 4 --pack_w4 \
    --compute dequant --json
run r4_mem_mp502 python scripts/memory_compare.py --compute dequant \
    --pack_w4 --mp_w $RF/weight_5.02.yaml --mp_a $RF/act_7.77.yaml \
    --act_protect $RF/act_protect_reference.yaml --json

# SD1.5 int8+int8-VAE serving (VERDICT #3). The untracked calib/qparams
# artifacts are wiped on workspace resets — regenerate what's missing.
if [ ! -f outputs/sd15_lcm/calib.npz ]; then
    run r4_sd15_calib python scripts/gen_calib_data.py \
        --config outputs/sd15/config.yaml
fi
if [ ! -f outputs/sd15/qparams.msgpack ]; then
    run r4_sd15_ptq python scripts/ptq.py --config outputs/sd15/config.yaml \
        --outdir outputs/sd15
fi
run r4_serve_sd15_qvae python scripts/serve_bench.py --base_path outputs/sd15 \
    --steps 4 --batch_size 4 --quantize_vae
run r4_serve_sd15_plain python scripts/serve_bench.py \
    --base_path outputs/sd15 --steps 4 --batch_size 4

# ms/step at the MP / W4 operating points (VERDICT #4 latency column)
MIXDQ_BENCH_MP_W=$RF/weight_5.02.yaml \
MIXDQ_BENCH_MP_A=$RF/act_7.77.yaml \
MIXDQ_BENCH_MP_PROTECT=$RF/act_protect_reference.yaml \
MIXDQ_BENCH_BACKEND=int8_fq_sec \
    run r4_bench_mp502 python bench.py
MIXDQ_BENCH_WBITS=4 MIXDQ_BENCH_BACKEND=int8_fq_sec \
    run r4_bench_w4 python bench.py

# family re-measures (VERDICT #8)
MIXDQ_BENCH_FAMILY=sdxl MIXDQ_BENCH_BACKEND=int8_fq_sec \
    run r4_bench_sdxl1024 python bench.py
MIXDQ_BENCH_FAMILY=sd15 MIXDQ_BENCH_BACKEND=int8_fq_sec \
    run r4_bench_sd15 python bench.py

# headline re-measure with the settled defaults
MIXDQ_BENCH_BACKEND=int8_fq_sec MIXDQ_BENCH_ROUNDS=5 \
    run r4_bench_final python bench.py

# controlled B-sweep re-run under the settled attn2-only default (the
# first r4_bsweep ran before the whole-block defaults landed)
run r4_bsweep2 python scripts/batch_sweep.py --batches 1,2,4,8 --rounds 3

echo "r4 night queue done" >&2
