#!/bin/bash
cd /root/repo
set -x
date
timeout 90 python -c "import jax, jax.numpy as jnp; print((jnp.ones((256,256))@jnp.ones((256,256))).sum())" || exit 1
timeout 4200 python experiments/engine_spec_chunk_sweep.py > experiments/engine_spec_chunk_sweep.log 2>&1
date
echo ALL-DONE > experiments/tpu_round5_batch20.done
