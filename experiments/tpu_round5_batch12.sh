#!/bin/bash
cd /root/repo
set -x
while [ ! -f experiments/tpu_round5_bench_check.done ]; do sleep 60; done
date
timeout 90 python -c "import jax, jax.numpy as jnp; print((jnp.ones((256,256))@jnp.ones((256,256))).sum())" || exit 1
timeout 5400 python experiments/engine_spec_llama3.py > experiments/engine_spec_llama3.log 2>&1
date
echo ALL-DONE > experiments/tpu_round5_batch12.done
