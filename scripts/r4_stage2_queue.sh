#!/usr/bin/env bash
# Round-4 stage-2 TPU queue: full-scale quality line for the SHIPPED
# int8_sec serving path (whole-block attn2 kernel + LN folds + bf16
# residual pinning), after the stage-1 measurement queue frees the chip.
# Waits on the stage-1 PID (/tmp/r4queue.pid) before touching the TPU.
set -u
cd /root/repo
L=bench_logs

if [ -f /tmp/r4queue.pid ]; then
    P=$(cat /tmp/r4queue.pid)
    while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi

run() {  # run <tag> <cmd...>
    local tag=$1; shift
    echo "== $tag: $* ==" >&2
    timeout 2400 "$@" > "$L/$tag.json" 2> "$L/$tag.err"
    echo "== $tag rc=$? ==" >&2
}

# the untracked calib/qparams artifacts are wiped on workspace resets
if [ ! -f outputs/sdxl_turbo/calib.npz ]; then
    run r4_sdxlt_calib python scripts/gen_calib_data.py \
        --config outputs/sdxl_turbo/config.yaml
fi
if [ ! -f outputs/sdxl_turbo/qparams.msgpack ]; then
    run r4_sdxlt_ptq python scripts/ptq.py \
        --config outputs/sdxl_turbo/config.yaml --outdir outputs/sdxl_turbo
fi

# quality of the exact shipped serving path (deploy int8_sec + fused QKV
# + the attn2-only whole-block default): SSIM / pixel-MSE / latent SQNR
# vs the bf16 pipeline on the same seeds
run r4_eval_int8sec python scripts/evaluate.py \
    --base_path outputs/sdxl_turbo --backend int8 --fuse_qkv \
    --deploy_compute int8_sec --n_prompts 4 \
    --out outputs/sdxl_turbo/eval_int8_sec.yaml

# control at the same prompts: plain int8 deploy (round-2 quality line)
run r4_eval_int8 python scripts/evaluate.py \
    --base_path outputs/sdxl_turbo --backend int8 --n_prompts 4 \
    --out outputs/sdxl_turbo/eval_int8.yaml

echo "r4 stage-2 queue done" >&2
