#!/bin/bash
# Round-3 reference-side (CPU) measurement chain: the two missing
# driver configs, then the north-star DMRG baseline re-measure with
# per-sweep times (VERDICT r2 items 2 & 5). Serial: single-core host.
export OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 MKL_NUM_THREADS=1
cd /root/repo
echo "[chain] circuit53 start $(date +%T)" >> benchref/remeasure_r3.status
nice -n 19 timeout 14400 python -u benchref/measure_reference_circuit53.py \
  > benchref/ref_circuit53.json 2> benchref/ref_circuit53.log
echo "[chain] circuit53 rc=$? $(date +%T)" >> benchref/remeasure_r3.status
echo "[chain] peps16 start $(date +%T)" >> benchref/remeasure_r3.status
nice -n 19 timeout 14400 python -u benchref/measure_reference_peps16.py \
  > benchref/ref_peps16.json 2> benchref/ref_peps16.log
echo "[chain] peps16 rc=$? $(date +%T)" >> benchref/remeasure_r3.status
echo "[chain] dmrg128 start $(date +%T)" >> benchref/remeasure_r3.status
nice -n 19 python -u benchref/measure_reference.py 128 256 3 \
  > benchref/ref_dmrg128_r3.json 2> benchref/ref_dmrg128_r3.log
echo "[chain] dmrg128 rc=$? $(date +%T)" >> benchref/remeasure_r3.status
