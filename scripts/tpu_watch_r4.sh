#!/bin/bash
# Wait for the axon TPU tunnel to recover, then run the round-4 queue once.
# The probe runs in a bounded subprocess so a hung tunnel can't wedge us.
cd /root/repo
mkdir -p /tmp/r4q
n=0
while true; do
  n=$((n+1))
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones(3).sum()
x.block_until_ready()
print('alive', float(x))
" >> /tmp/r4q/watch.log 2>&1
  if [ $? -eq 0 ]; then
    echo "probe $n ok at $(date)" >> /tmp/r4q/watch.log
    break
  fi
  echo "probe $n dead at $(date)" >> /tmp/r4q/watch.log
  sleep 180
done
bash scripts/r4_queue.sh > /tmp/r4q/queue.log 2>&1
echo "queue finished at $(date)" >> /tmp/r4q/watch.log
