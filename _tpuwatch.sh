#!/bin/bash
# Probe the TPU tunnel every 5 minutes; when a small matmul succeeds,
# smoke-test the Pallas sandwich kernel, then run the full bench both
# with and without the Pallas matvec path (A/B) and record the output.
LOG=/tmp/tpuwatch.log
echo "watch start $(date)" >> $LOG
for i in $(seq 1 40); do
  if timeout 120 python -u -c "
import jax, jax.numpy as jnp
print('probe ok:', float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))
" >> $LOG 2>&1; then
    echo "TUNNEL ALIVE $(date)" >> $LOG
    echo "--- pallas smoke ---" >> $LOG
    timeout 300 python -u -c "
import numpy as np, jax.numpy as jnp
from quimb_tpu.ops import pallas_kernels as pk
rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(5, 512, 512)), dtype='float32')
th = jnp.asarray(rng.normal(size=(512, 512)), dtype='float32')
b = jnp.asarray(rng.normal(size=(5, 512, 512)), dtype='float32')
got = np.asarray(pk.sandwich_matvec(a, th, b))
want = np.asarray(pk.sandwich_matvec_reference(a, th, b))
err = np.max(np.abs(got - want)) / np.max(np.abs(want))
print('pallas sandwich rel err:', err)
assert err < 1e-3
import time
import jax
for name, fn in [('pallas', lambda: pk.sandwich_matvec(a, th, b)),
                 ('einsum', lambda: pk.sandwich_matvec_reference(a, th, b))]:
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(50):
        r = fn()
    jax.block_until_ready(r)
    print(name, 'us/call:', (time.perf_counter() - t0) / 50 * 1e6)
" >> $LOG 2>&1
    rc=$?
    echo "pallas smoke rc=$rc $(date)" >> $LOG
    echo "--- bench without pallas ---" >> $LOG
    timeout 2400 python -u bench.py >> $LOG 2>&1
    echo "bench einsum done rc=$? $(date)" >> $LOG
    echo "--- bench with pallas ---" >> $LOG
    QUIMB_TPU_PALLAS=1 timeout 2400 python -u bench.py >> $LOG 2>&1
    echo "bench pallas done rc=$? $(date)" >> $LOG
    exit 0
  fi
  echo "probe failed round $i $(date)" >> $LOG
  sleep 300
done
echo "gave up $(date)" >> $LOG
