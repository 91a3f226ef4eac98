#!/bin/bash
# Round-5 TPU batch 1 — ONE process at a time on the chip (CLAUDE.md:
# concurrent TPU processes wedge the tunnel). Sequenced, nohup-friendly.
cd /root/repo
set -x
date
timeout 2400 python experiments/fp8_cast_ab.py   > experiments/fp8_cast_ab.log 2>&1
date
timeout 3600 python experiments/engine_sampling_overhead.py > experiments/engine_sampling_overhead.log 2>&1
date
timeout 3600 python experiments/long_prefill_int4kv.py > experiments/long_prefill_int4kv.log 2>&1
date
timeout 7200 python bench.py --speculative ngram > experiments/bench_r5_full.log 2>&1
date
echo ALL-DONE > experiments/tpu_round5_batch1.done
