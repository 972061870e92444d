#!/bin/bash
# deliberate CPU load for the bench retime validation (VERDICT r18 #1):
# N busy-spinners for S seconds, then exit
N=${1:-12}; S=${2:-1150}
for i in $(seq 1 "$N"); do
  timeout "$S" bash -c 'while :; do :; done' &
done
echo "loadgen: $N spinners for $S s (pids started)"
