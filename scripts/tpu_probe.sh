#!/bin/bash
# Probe the TPU relay until it responds; log each attempt.
for i in $(seq 1 200); do
  echo "=== attempt $i $(date +%H:%M:%S)" >> /tmp/tpu_probe.log
  timeout 280 python -u -c "
import jax, numpy as np, time
import jax.numpy as jnp
t0=time.time()
x = jnp.ones((256,256), jnp.bfloat16)
f = jax.jit(lambda a: a@a)
y = f(x)
print('devices:', jax.devices(), flush=True)
print('fetch:', np.asarray(y[:2,:2]).tolist(), flush=True)
print('TPU_OK elapsed', time.time()-t0, flush=True)
" >> /tmp/tpu_probe.log 2>&1
  if grep -q TPU_OK /tmp/tpu_probe.log; then
    echo "TPU_UP at $(date +%H:%M:%S)" >> /tmp/tpu_probe.log
    exit 0
  fi
  sleep 60
done
