#!/bin/bash
cd /root/repo
L=benchref/tpu_configs_r3.log
run() {
  name=$1; shift
  echo "=== $name(r3b) start $(date +%T) ===" >> $L
  timeout 3000 python -u "$@" > benchref/tpu_$name.json.tmp 2>> $L
  rc=$?
  if [ $rc -eq 0 ] && [ -s benchref/tpu_$name.json.tmp ]; then
    mv benchref/tpu_$name.json.tmp benchref/tpu_$name.json
  fi
  echo "=== $name(r3b) rc=$rc $(date +%T) ===" >> $L
}
run circuit53 benchref/measure_tpu_circuit53.py
run exact20 benchref/measure_tpu_exact20.py
run peps16 benchref/measure_tpu_peps16.py
echo "=== chain2 done $(date +%T) ===" >> $L
