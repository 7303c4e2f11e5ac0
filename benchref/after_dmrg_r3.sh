#!/bin/bash
# Waits for the running dmrg128 re-measure (PID $1) to exit, then runs
# the fixed peps16 reference measurement on the freed single core.
while kill -0 "$1" 2>/dev/null; do sleep 60; done
export OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 MKL_NUM_THREADS=1
cd /root/repo
echo "[chain] peps16(retry) start $(date +%T)" >> benchref/remeasure_r3.status
nice -n 19 timeout 14400 python -u benchref/measure_reference_peps16.py \
  > benchref/ref_peps16.json 2> benchref/ref_peps16.log
echo "[chain] peps16(retry) rc=$? $(date +%T)" >> benchref/remeasure_r3.status
