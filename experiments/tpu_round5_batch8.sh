#!/bin/bash
cd /root/repo
set -x
date
timeout 5400 python experiments/engine_spec_throughput.py > experiments/engine_spec_throughput2.log 2>&1
date
echo ALL-DONE > experiments/tpu_round5_batch8.done
