#!/bin/bash
cd /root/repo
set -x
date
timeout 3600 python experiments/engine_sampling_overhead.py > experiments/engine_sampling_overhead2.log 2>&1
date
echo ALL-DONE > experiments/tpu_round5_batch3.done
