#!/bin/bash
cd /root/repo
set -x
date
timeout 3600 python experiments/paged_int4_asym_ab.py > experiments/paged_int4_asym_ab.log 2>&1
date
echo ALL-DONE > experiments/tpu_round5_batch4.done
