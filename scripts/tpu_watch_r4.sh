#!/bin/bash
# Wait for the axon TPU tunnel to recover, run the round-4 queue, verify
# completeness, and RE-ARM on partial success.  The queue
# (scripts/r4_queue.sh) is idempotent — a re-run after a mid-queue tunnel
# drop only executes the steps whose artifacts haven't landed
# (scripts/r4_artifacts_ok.py is the completeness oracle).
# The probe runs in a bounded subprocess so a hung tunnel can't wedge us.
cd /root/repo
mkdir -p /tmp/r4q
attempt=0
while true; do
  n=0
  while true; do
    n=$((n+1))
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones(3).sum()
x.block_until_ready()
print('alive', float(x))
" >> /tmp/r4q/watch.log 2>&1; then
      echo "probe $n ok at $(date)" >> /tmp/r4q/watch.log
      break
    fi
    echo "probe $n dead at $(date)" >> /tmp/r4q/watch.log
    sleep 180
  done
  attempt=$((attempt+1))
  echo "queue attempt $attempt starting at $(date)" >> /tmp/r4q/watch.log
  bash scripts/r4_queue.sh > /tmp/r4q/queue_a$attempt.log 2>&1
  python scripts/update_bench_docs.py >> /tmp/r4q/watch.log 2>&1
  if python scripts/r4_artifacts_ok.py >> /tmp/r4q/watch.log 2>&1; then
    echo "r4 capture COMPLETE at $(date)" >> /tmp/r4q/watch.log
    break
  fi
  if [ $attempt -ge 5 ]; then
    echo "giving up after $attempt attempts at $(date)" >> /tmp/r4q/watch.log
    break
  fi
  echo "queue attempt $attempt incomplete — re-arming" >> /tmp/r4q/watch.log
  sleep 60
done
