#!/usr/bin/env bash
# Round-5 follow-up queue: re-runs the two jobs whose first attempts
# found (and led to fixing) real bugs — the SD1.5 int8-VAE serving
# bench (conv planner now models Mosaic tile padding) and the quality
# matrix (evaluate.py now builds deploy entries lazily). Starts once
# the main r5 queue prints its done marker; the wait is BOUNDED (the r4
# pidfile spin was an ADVICE finding).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs

for i in $(seq 1 360); do  # <= 3h, 30s steps
  grep -q "r5 queue done" bench_logs/r5_queue.log 2>/dev/null && break
  sleep 30
done
if ! grep -q "r5 queue done" bench_logs/r5_queue.log 2>/dev/null; then
  echo "r5_queue2: main queue never finished within 3h; running anyway" \
    | tee -a bench_logs/r5_queue2.log
fi

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name: $* ==" >> bench_logs/r5_queue2.log
  timeout "$tmo" "$@" > "bench_logs/$name.json" 2> "bench_logs/$name.err"
  echo "== $name rc=$? ==" >> bench_logs/r5_queue2.log
}

run r5_serve_sd15_qvae 4800 \
    python scripts/serve_bench.py --base_path outputs/sd15 --steps 4 \
    --batch_size 4 --quantize_vae

run r5_eval_matrix 7200 \
    python scripts/evaluate.py --base_path outputs/sdxl_turbo \
    --matrix w8_int8,w8_sec,w4_sec,mp_sec \
    --config_weight_mp configs/mp/sdxl_turbo/reference_final/weight_5.02.yaml \
    --config_act_mp configs/mp/sdxl_turbo/reference_final/act_7.77.yaml \
    --act_protect configs/mp/sdxl_turbo/reference_final/act_protect_reference.yaml

echo "r5 queue2 done" >> bench_logs/r5_queue2.log
