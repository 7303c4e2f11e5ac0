#!/bin/bash
# Wait for the current TPU holder (peps16, pid $1) to exit, then
# re-measure circuit53 and exact20 with the ELL matvec + transfer
# retries in place.
cd /root/repo
L=benchref/tpu_configs_r3.log
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
sleep 10
run() {
  name=$1; shift
  echo "=== $name(r3c) start $(date +%T) ===" >> $L
  timeout 2700 python -u "$@" > benchref/tpu_$name.json.tmp 2>> $L
  rc=$?
  if [ $rc -eq 0 ] && [ -s benchref/tpu_$name.json.tmp ]; then
    mv benchref/tpu_$name.json.tmp benchref/tpu_$name.json
  fi
  echo "=== $name(r3c) rc=$rc $(date +%T) ===" >> $L
}
run circuit53 benchref/measure_tpu_circuit53.py
run exact20 benchref/measure_tpu_exact20.py
echo "=== chain3 done $(date +%T) ===" >> $L
