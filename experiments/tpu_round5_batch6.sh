#!/bin/bash
cd /root/repo
set -x
date
timeout 5400 python experiments/batched_llama3_int4kv.py > experiments/batched_llama3_int4kv.log 2>&1
date
echo ALL-DONE > experiments/tpu_round5_batch6.done
