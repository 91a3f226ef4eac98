#!/bin/bash
# Round-5 TPU batch 2: fp8 bits A/B, engine sampling overhead (retry
# after a tunnel flake), bench rerun with the fixed ngram harness +
# floor bracket. ONE process at a time (CLAUDE.md).
cd /root/repo
set -x
date
timeout 3600 python experiments/fp8_kv_bits_ab.py > experiments/fp8_kv_bits_ab.log 2>&1
date
timeout 3600 python experiments/engine_sampling_overhead.py > experiments/engine_sampling_overhead.log 2>&1
date
timeout 7200 python bench.py --speculative ngram > experiments/bench_r5_full2.log 2>&1
date
echo ALL-DONE > experiments/tpu_round5_batch2.done
