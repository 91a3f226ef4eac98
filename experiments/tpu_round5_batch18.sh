#!/bin/bash
cd /root/repo
set -x
date
timeout 90 python -c "import jax, jax.numpy as jnp; print((jnp.ones((256,256))@jnp.ones((256,256))).sum())" || exit 1
timeout 3600 python experiments/engine_throughput.py --paged > experiments/engine_throughput_paged_v2.log 2>&1
timeout 3600 python experiments/engine_throughput.py > experiments/engine_throughput_int8_v2.log 2>&1
date
echo ALL-DONE > experiments/tpu_round5_batch18.done
