#!/bin/bash
# Fire the full on-chip s4 measurement battery (run under nohup).
cd /root/repo
echo "=== bench.py ==="
python bench.py 2>&1 | tail -4
echo "=== s4_m_sweep ==="
python experiments/s4_m_sweep.py 2>&1 | grep -viE '^WARNING|xla_bridge'
echo "=== batched llama3 s4 ==="
python experiments/batched_llama3_s4.py 2>&1 | grep -viE '^WARNING|xla_bridge'
echo "=== battery done ==="
echo "=== attn_b1_sweep ==="; python experiments/attn_b1_sweep.py 2>&1 | grep -viE "^WARNING|xla_bridge"
echo "=== profile decode ==="; python experiments/profile_decode_r2.py 2>&1 | tail -12
echo "=== batched llama3 int4-KV ==="; python experiments/batched_llama3_int4kv.py 2>&1 | grep -viE "^WARNING|xla_bridge"
