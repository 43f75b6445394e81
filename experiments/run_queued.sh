#!/bin/bash
# Run all queued on-chip measurements in priority order, each in its
# own subprocess with a timeout, appending to experiments/results/.
# Designed for a possibly-short tunnel-healthy window: the most
# important measurement runs first and every result is flushed to disk
# as soon as it exists.
set -u
cd "$(dirname "$0")/.."
mkdir -p experiments/results
STAMP=$(date -u +%Y%m%dT%H%M%SZ)
LOG=experiments/results/queued_$STAMP.log
echo "# queued on-chip measurements $STAMP" | tee "$LOG"

run() {
    local name=$1 tmo=$2; shift 2
    echo "== $name ==" | tee -a "$LOG"
    timeout "$tmo" "$@" >>"$LOG" 2>&1
    echo "== $name exit $? ==" | tee -a "$LOG"
}

# 1. Headline refresh (batched plane corrections + pre-transposed
#    w-tap scales landed since the last successful bench).
run bench 2400 python bench.py
# 2. Block-size sweep f32 (the latency-vs-marginal cost-model fit).
run exp_block_f32 2400 python experiments/exp_block.py
# 3. Block-size sweep bf16 fast mode.
run exp_block_bf16 2400 env EXP_FAST=1 python experiments/exp_block.py
# 4. Parity-split accumulator (add-chain-bound hypothesis).
run exp_parity 2400 python experiments/exp_parity.py
# 5. Stage splits for PERFORMANCE.md.
run bench_report 2400 env SKA_SDP_FUNC_TPU_BENCH_REPORT=1 python bench.py
# 6. Streaming-ingest (device-planned) throughput vs packed.
run exp_stream 2400 python experiments/exp_stream.py
run exp_stream_bf16 2400 env EXP_FAST=1 python experiments/exp_stream.py

echo "done: $LOG" | tee -a "$LOG"
