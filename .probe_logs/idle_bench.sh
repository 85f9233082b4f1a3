#!/bin/sh
# wait for a sustained-idle window (1-min load < 1.2 twice, 60s apart),
# then run the bench
cd /root/repo
while true; do
  L1=$(cut -d' ' -f1 /proc/loadavg)
  OK1=$(python3 -c "print(1 if float('$L1') < 1.2 else 0)")
  if [ "$OK1" = "1" ]; then
    sleep 60
    L2=$(cut -d' ' -f1 /proc/loadavg)
    OK2=$(python3 -c "print(1 if float('$L2') < 1.2 else 0)")
    if [ "$OK2" = "1" ]; then
      echo "idle window found (loads $L1 $L2), benching"
      python bench.py > /root/repo/.bench_r12_stdout.json 2> /root/repo/.bench_r12_stderr.log
      echo "bench exit $?"
      exit 0
    fi
  fi
  sleep 120
done
