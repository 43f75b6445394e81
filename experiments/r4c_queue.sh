#!/bin/bash
# Round-4c on-chip queue: post-v2 streaming + headline refresh.
cd /root/repo
set -x
timeout 3600 python experiments/exp_headblock.py
timeout 3600 python experiments/exp_stream_split.py
timeout 3600 python experiments/exp_stream.py
SKA_SDP_FUNC_TPU_BENCH_REPORT=1 timeout 3600 python bench.py
timeout 3600 python bench.py
