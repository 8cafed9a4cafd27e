#!/bin/bash
# SWEEP_r05 driver: fp8/int8/bf16 KV x eviction length sweep on the real
# chip (BASELINE config #3), extended with the 64k/128k long-context rows
# (BASELINE config #5 stretch, VERDICT r4 #2) served via chunked prefill.
# Each dtype column is one sweep_fp8_evict.py invocation (subprocess per
# point inside); long rows run with --chunked-prefill.  Merge with
# tools/merge_sweep_r05.py.
set -x
cd "$(dirname "$0")/.."
STD="--bench-model llama-3.1-8b --quantization int4 --num-scheduler-steps 64"
for dt in auto int8 fp8; do
  timeout 5400 python benchmarks/sweep_fp8_evict.py $STD \
    --kv-dtype $dt --input-lens 1024 4096 16384 32768 \
    --json-out /tmp/sweep_r05_std_$dt.json
done
for dt in int8 fp8; do
  timeout 7200 python benchmarks/sweep_fp8_evict.py $STD \
    --kv-dtype $dt --input-lens 65536 131072 --chunked-prefill \
    --json-out /tmp/sweep_r05_long_$dt.json
done
