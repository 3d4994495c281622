#!/usr/bin/env bash
# Round-4 family re-measures (VERDICT r3 #8) — run AFTER the kernel
# freeze so SDXL-1024 / SD1.5 numbers include the round's kernel work.
set -u
cd /root/repo
L=bench_logs

run() {  # run <tag> <cmd...>
    local tag=$1; shift
    echo "== $tag: $* ==" >&2
    timeout 2400 "$@" > "$L/$tag.json" 2> "$L/$tag.err"
    echo "== $tag rc=$? ==" >&2
}

MIXDQ_BENCH_FAMILY=sdxl MIXDQ_BENCH_BACKEND=int8_fq_sec \
    run r4_bench_sdxl1024 python bench.py
MIXDQ_BENCH_FAMILY=sd15 MIXDQ_BENCH_BACKEND=int8_fq_sec \
    run r4_bench_sd15 python bench.py

echo "r4 family bench done" >&2
