#!/usr/bin/env bash
# Round-5 TPU measurement queue. Runs jobs STRICTLY SEQUENTIALLY in one
# shell (no pidfile wait games — the r4 stage-2 queue's leftover-pidfile
# spin was an ADVICE finding); each job gets its own log pair and a
# generous timeout (the host flaps 10-50x between speed classes).
#
# Usage: nohup bash scripts/r5_queue.sh > bench_logs/r5_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name: $* ==" | tee -a bench_logs/r5_queue.log
  timeout "$tmo" "$@" > "bench_logs/$name.json" 2> "bench_logs/$name.err"
  echo "== $name rc=$? ==" | tee -a bench_logs/r5_queue.log
}

# 0. The untracked calib/qparams artifacts (gitignored: multi-GB) are
#    wiped on workspace resets — regenerate what's missing before any
#    job that consumes them (the r4 queues had the same guard; its
#    absence here is what 1-shotted the first r5 queue attempt).
if [ ! -f outputs/sd15_lcm/calib.npz ]; then
  run r5_sd15_calib 4800 \
      python scripts/gen_calib_data.py --config outputs/sd15/config.yaml
fi
if [ ! -f outputs/sd15/qparams.msgpack ]; then
  run r5_sd15_ptq 4800 \
      python scripts/ptq.py --config outputs/sd15/config.yaml \
      --outdir outputs/sd15
fi
if [ ! -f outputs/sdxl_turbo/calib.npz ]; then
  run r5_sdxlt_calib 4800 \
      python scripts/gen_calib_data.py --config outputs/sdxl_turbo/config.yaml
fi
if [ ! -f outputs/sdxl_turbo/qparams.msgpack ]; then
  run r5_sdxlt_ptq 4800 \
      python scripts/ptq.py --config outputs/sdxl_turbo/config.yaml \
      --outdir outputs/sdxl_turbo
fi

# 1. SD1.5 int8+int8-VAE serving (VERDICT #2 'done' artifact, 3rd round
#    running; the strip-conv fix makes the VAE decoder compile)
run r5_serve_sd15_qvae 4800 \
    python scripts/serve_bench.py --base_path outputs/sd15 --steps 4 \
    --batch_size 4 --quantize_vae

# 2. SD1.5 plain serving control (same session -> comparable)
run r5_serve_sd15_plain 3600 \
    python scripts/serve_bench.py --base_path outputs/sd15 --steps 4 \
    --batch_size 4

# 3. quality matrix: one process, shared FP run (VERDICT #6; the r4
#    plain-int8 eval timed out recompiling FP per config)
run r5_eval_matrix 7200 \
    python scripts/evaluate.py --base_path outputs/sdxl_turbo \
    --matrix w8_int8,w8_sec,w4_sec,mp_sec \
    --config_weight_mp configs/mp/sdxl_turbo/reference_final/weight_5.02.yaml \
    --config_act_mp configs/mp/sdxl_turbo/reference_final/act_7.77.yaml \
    --act_protect configs/mp/sdxl_turbo/reference_final/act_protect_reference.yaml

# 4. B-sweep incl. the B=8 dip investigation (VERDICT #5)
run r5_bsweep 4800 \
    python scripts/batch_sweep.py --batches 1,2,4,8 --rounds 3

# 5. SDXL-Turbo 512px headline (margin check)
run r5_bench_final 3000 env MIXDQ_BENCH_ROUNDS=5 python bench.py

# 6. SD1.5 family bench
run r5_bench_sd15 3000 env MIXDQ_BENCH_FAMILY=sd15 \
    MIXDQ_BENCH_BACKEND=int8_fq_sec python bench.py

# 7. SDXL-1024 re-measure with the round-5 defaults (bf16 flash +
#    cross-KV bank); VERDICT #1's done-artifact
run r5_bench_sdxl1024b 3600 env MIXDQ_BENCH_FAMILY=sdxl \
    MIXDQ_BENCH_BACKEND=int8_fq_sec python bench.py

echo "r5 queue done" | tee -a bench_logs/r5_queue.log
