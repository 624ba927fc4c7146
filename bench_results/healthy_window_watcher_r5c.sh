#!/bin/bash
# Round-5 continuation-session healthy-window watcher (run 11, final session).
#
# Protocol (BASELINE.md): bank one more scaling run ONLY in a genuinely
# healthy window — probe eff >= 0.88 AND near-full absolute throughput at
# BOTH parallelism levels (degraded phases show absolute collapse, which can
# fake a high ratio; a degraded lo side alone inflates it), CONFIRMED by a
# second probe 60 s later (one-off spikes don't open a window). Every probe
# sample is logged unfiltered. When a healthy window hits: bank one
# --scaling run (REPS=3, default segs=32 protocol) and one headline run,
# both PRE/POST ceiling-bracketed, then exit.
cd /root/repo || exit 1
LOG=bench_results/healthy_window_watch_r5c.txt
echo "=== watch started $(date -u +%Y-%m-%dT%H:%M:%SZ) ===" >> "$LOG"
GATE='
import sys, json
d = json.load(sys.stdin)
print(1 if d["eff_2_to_8"] >= 0.88 and d["2"] >= 11.5 and d["8"] >= 40 else 0)'
for i in $(seq 1 60); do
  P=$(python bench_results/ceiling_numpy_probe.py 2>/dev/null)
  echo "$(date -u +%H:%M:%S) $P" >> "$LOG"
  OK=$(echo "$P" | python -c "$GATE")
  if [ "$OK" = "1" ]; then
    sleep 60
    P2=$(python bench_results/ceiling_numpy_probe.py 2>/dev/null)
    echo "$(date -u +%H:%M:%S) CONFIRM $P2" >> "$LOG"
    OK=$(echo "$P2" | python -c "$GATE")
  fi
  if [ "$OK" = "1" ]; then
    echo "HEALTHY $(date -u +%H:%M:%S) — banking scaling + headline" >> "$LOG"
    { python bench_results/ceiling_numpy_probe.py 2>/dev/null | sed 's/^/PRE /'; \
      SPARK_GRAFT_SCALE_REPS=3 python bench.py --scaling 2>/tmp/err_scaling_r5_run11; \
      python bench_results/ceiling_numpy_probe.py 2>/dev/null | sed 's/^/POST /'; } \
      | tee bench_results/scaling_r5_run11.txt
    { python bench_results/ceiling_numpy_probe.py 2>/dev/null | sed 's/^/PRE /'; \
      python bench.py 2>/tmp/err_headline_r5_final2; \
      python bench_results/ceiling_numpy_probe.py 2>/dev/null | sed 's/^/POST /'; } \
      | tee bench_results/bench_headline_r5_final2.txt
    echo "DONE $(date -u +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
  sleep 480
done
echo "no healthy window in watch period $(date -u +%H:%M:%SZ)" >> "$LOG"
