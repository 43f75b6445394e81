#!/bin/bash
# Round-4 on-chip measurement queue (run via run_when_up.sh).
cd /root/repo
set -x
timeout 2400 python /tmp/tpu_parity.py
timeout 7200 python experiments/exp_fused.py
timeout 3600 python experiments/exp_stream_split.py
timeout 3600 python experiments/exp_stream.py
timeout 3600 python bench.py
