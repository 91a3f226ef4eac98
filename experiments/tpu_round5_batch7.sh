#!/bin/bash
cd /root/repo
set -x
date
timeout 5400 python experiments/paged_llama3_bigbatch.py > experiments/paged_llama3_bigbatch.log 2>&1
date
echo ALL-DONE > experiments/tpu_round5_batch7.done
