#!/bin/bash
# Poll the axon tunnel; when it answers, fire the s4 measurement battery.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel up after $i probes ($(date))" 
    bash experiments/run_s4_battery.sh
    exit 0
  fi
  sleep 90
done
echo "tunnel never recovered"
