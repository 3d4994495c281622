#!/usr/bin/env bash
# Round-3 sequential TPU job queue (single chip — jobs must not overlap).
# Each job writes its own bench_logs artifact; failures don't stop the
# queue. Run AFTER any in-flight TPU job completes.
set -u
cd /root/repo
L=bench_logs

run() {  # run <tag> <cmd...>
    local tag=$1; shift
    echo "== $tag: $* ==" >&2
    timeout 2400 "$@" > "$L/$tag.json" 2> "$L/$tag.err"
    echo "== $tag rc=$? ==" >&2
}

# 1. Controlled same-session B-sweep (VERDICT #8)
run r3_bsweep python scripts/batch_sweep.py --batches 1,2,4,8 --rounds 3

# 2. SD1.5 flow: calib + ptq (qparams were cleaned), then 4-step serving
#    with int8 UNet AND int8 VAE decoder (VERDICT #7)
if [ ! -f outputs/sd15/qparams.msgpack ]; then
    run r3_sd15_calib python scripts/gen_calib_data.py \
        --config outputs/sd15/config.yaml
    run r3_sd15_ptq python scripts/ptq.py --config outputs/sd15/config.yaml \
        --outdir outputs/sd15
fi
run r3_serve_sd15_qvae python scripts/serve_bench.py --base_path outputs/sd15 \
    --steps 4 --batch_size 4 --quantize_vae
run r3_serve_sd15_plain python scripts/serve_bench.py \
    --base_path outputs/sd15 --steps 4 --batch_size 4

# 3. MP-config quality eval through the REAL deploy backend (VERDICT #2:
#    "an eval_*.yaml on the same config via the deploy backend, not fake")
if [ ! -f outputs/sdxl_turbo/qparams.msgpack ]; then
    run r3_sdxl_calib python scripts/gen_calib_data.py \
        --config outputs/sdxl_turbo/config.yaml
    run r3_sdxl_ptq python scripts/ptq.py \
        --config outputs/sdxl_turbo/config.yaml --outdir outputs/sdxl_turbo
fi
run r3_eval_mp_int8 python scripts/evaluate.py --base_path outputs/sdxl_turbo \
    --backend int8 --n_prompts 4 \
    --config_weight_mp configs/mp/sdxl_turbo/final_config/weight/5.04.yaml \
    --config_act_mp configs/mp/sdxl_turbo/final_config/act/7.43.yaml \
    --act_protect configs/mp/sdxl_turbo/act_protect.yaml \
    --out outputs/sdxl_turbo/eval_mixed_int8.yaml

# 4. MP deploy memory line (VERDICT #2 "Z MB static")
MIXDQ_BENCH_MEM=1 \
MIXDQ_BENCH_MP_W=configs/mp/sdxl_turbo/final_config/weight/5.04.yaml \
MIXDQ_BENCH_MP_A=configs/mp/sdxl_turbo/final_config/act/7.43.yaml \
MIXDQ_BENCH_MP_PROTECT=configs/mp/sdxl_turbo/act_protect.yaml \
run r3_mp_mem python bench.py
