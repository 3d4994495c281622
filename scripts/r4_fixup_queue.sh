#!/usr/bin/env bash
# Round-4 remediation queue: re-runs the jobs that crashed in the first
# r4_tpu_queue pass (a mid-edit import race while the whole-block kernel
# wiring landed, plus the setup_experiment same-file copy bug on the
# SD1.5 PTQ rerun). Sequential — single chip.
set -u
cd /root/repo
L=bench_logs

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
if ! grep -q "peak" "$L/r4_mem_mp502.json" 2>/dev/null \
        || [ "$(wc -l < "$L/r4_mem_mp502.json")" -lt 3 ]; then
    RF=configs/mp/sdxl_turbo/reference_final
    run r4_mem_mp502 python scripts/memory_compare.py --compute dequant \
        --pack_w4 --mp_w $RF/weight_5.02.yaml --mp_a $RF/act_7.77.yaml \
        --act_protect $RF/act_protect_reference.yaml --json
fi

# SD1.5 int8+int8-VAE serving (VERDICT #3)
if [ ! -f outputs/sd15/qparams.msgpack ]; then
    run r4_sd15_ptq python scripts/ptq.py --config outputs/sd15/config.yaml \
        --outdir outputs/sd15
fi
run r4_serve_sd15_qvae python scripts/serve_bench.py --base_path outputs/sd15 \
    --steps 4 --batch_size 4 --quantize_vae
run r4_serve_sd15_plain python scripts/serve_bench.py \
    --base_path outputs/sd15 --steps 4 --batch_size 4

echo "r4 fixup queue done" >&2
