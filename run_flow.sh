#!/usr/bin/env bash
# Full PTQ flow driver (counterpart of the reference's main.sh three-step
# flow + main_quant_infer.sh mixed-precision invocation).
#
# Usage: ./run_flow.sh [config] [outdir]
#   ./run_flow.sh configs/tiny.yaml outputs/tiny_flow     # CPU smoke
#   ./run_flow.sh configs/sdxl_turbo.yaml logs/sdxl_turbo # full model
set -euo pipefail
CONFIG=${1:-configs/tiny.yaml}
OUTDIR=${2:-outputs/flow}

# tiny configs are CPU smoke flows: keep them off the (slow-eager,
# contended) TPU tunnel — the scripts honor MIXDQ_PLATFORM via
# utils.platform.apply_platform_env
case "$CONFIG" in *tiny*) export MIXDQ_PLATFORM=${MIXDQ_PLATFORM:-cpu};; esac

# CI-style gate: `./run_flow.sh test` runs the fast test tier (<2-3 min;
# pure math/kernel/unit tests). Full suite (`pytest tests/`) adds the
# model-building e2e tests (~10 min on a fast box, 60+ on a degraded
# host) — run it before release, the fast tier on every change.
if [[ "${1:-}" == "test" ]]; then
    exec python -m pytest tests/ -m "not slow" -q
fi

echo "== 1/4 calibration data =="
python scripts/gen_calib_data.py --config "$CONFIG"

echo "== 2/4 PTQ =="
python scripts/ptq.py --config "$CONFIG" --outdir "$OUTDIR"

echo "== 3/4 mixed-precision search (weight) =="
python scripts/mixed_precision_search.py --base_path "$OUTDIR" \
    --which weight --target_bits 5.0 --quick --n_prompts 1

echo "== 4/4 quantized generation =="
python scripts/quant_txt2img.py --base_path "$OUTDIR" \
    --config_weight_mp "$OUTDIR/weight_mp_config.yaml" --n_images 2

echo "== eval =="
python scripts/evaluate.py --base_path "$OUTDIR" --n_prompts 2

echo "done: $OUTDIR"
