#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run the round-3 measurement
# sweep once and exit. Incremental results land in tools/r3_sweep_results.log.
cd /root/repo
for i in $(seq 1 60); do
  if timeout 240 python -c "import jax, jax.numpy as jnp; x = jnp.ones((256,256), jnp.bfloat16); print('live', float((x@x).sum()))" >> /tmp/r3_watch.log 2>&1; then
    echo "tunnel live at $(date), starting sweep" >> /tmp/r3_watch.log
    python tools/r3_tpu_sweep.py >> /tmp/r3_watch.log 2>&1
    echo "sweep done at $(date) exit=$?" >> /tmp/r3_watch.log
    exit 0
  fi
  echo "attempt $i down at $(date)" >> /tmp/r3_watch.log
  sleep 420
done
echo "gave up at $(date)" >> /tmp/r3_watch.log
exit 1
