#!/bin/bash
# Round-5 continuation watcher, revision g (run 13, final attempt bank).
#
# Same 1-min-loadavg < 4 guard as r5f. Gates loosened one notch — gate1
# eff >= 0.84, confirm >= 0.80 — because today's box flickers sub-minute:
# r5f saw gate1-passing probes (0.907 at healthy absolutes, 0.952) whose
# 45 s confirm reads were 0.675/0.83, so the stricter confirm never let a
# bank start all session. Each bank is PRE/POST bracketed and judged on
# its own brackets, which makes the slightly speculative trigger safe;
# every probe sample still lands unfiltered in the log.
cd /root/repo || exit 1
LOG=bench_results/healthy_window_watch_r5g.txt
echo "=== watch started $(date -u +%Y-%m-%dT%H:%M:%SZ) ===" >> "$LOG"
GATE1='
import sys, json
d = json.load(sys.stdin)
print(1 if d["eff_2_to_8"] >= 0.84 and d["2"] >= 11.5 and d["8"] >= 40 else 0)'
GATE2='
import sys, json
d = json.load(sys.stdin)
print(1 if d["eff_2_to_8"] >= 0.80 and d["2"] >= 11.0 and d["8"] >= 38 else 0)'
busy() {
  python -c "import os; print(1 if os.getloadavg()[0] >= 4.0 else 0)"
}
BANKED=0
for i in $(seq 1 22); do
  if [ "$(busy)" = "1" ]; then
    echo "$(date -u +%H:%M:%S) BUSY loadavg=$(cut -d' ' -f1 /proc/loadavg) — skip" >> "$LOG"
    sleep 240
    continue
  fi
  P=$(python bench_results/ceiling_numpy_probe.py 2>/dev/null)
  echo "$(date -u +%H:%M:%S) $P" >> "$LOG"
  OK=$(echo "$P" | python -c "$GATE1")
  if [ "$OK" = "1" ]; then
    sleep 45
    if [ "$(busy)" = "1" ]; then
      echo "$(date -u +%H:%M:%S) BUSY at confirm — skip" >> "$LOG"
      sleep 240
      continue
    fi
    P2=$(python bench_results/ceiling_numpy_probe.py 2>/dev/null)
    echo "$(date -u +%H:%M:%S) CONFIRM $P2" >> "$LOG"
    OK=$(echo "$P2" | python -c "$GATE2")
  fi
  if [ "$OK" = "1" ]; then
    BANKED=$((BANKED+1))
    OUT=bench_results/scaling_r5_run13_g${BANKED}.txt
    echo "HEALTHY $(date -u +%H:%M:%S) — banking scaling attempt $BANKED" >> "$LOG"
    { python bench_results/ceiling_numpy_probe.py 2>/dev/null | sed 's/^/PRE /'; \
      SPARK_GRAFT_SCALE_REPS=3 python bench.py --scaling 2>/tmp/err_scaling_r5_run13_g${BANKED}; \
      python bench_results/ceiling_numpy_probe.py 2>/dev/null | sed 's/^/POST /'; } \
      | tee "$OUT"
    EFF=$(grep -o '"build_efficiency": [0-9.]*' "$OUT" | grep -o '[0-9.]*$')
    echo "BANK $BANKED done $(date -u +%H:%M:%S) build_eff=$EFF" >> "$LOG"
    MET=$(python -c "print(1 if float('${EFF:-0}') >= 0.8 else 0)")
    if [ "$MET" = "1" ] || [ "$BANKED" -ge 2 ]; then
      echo "DONE $(date -u +%H:%M:%S) (met=$MET attempts=$BANKED)" >> "$LOG"
      exit 0
    fi
  fi
  sleep 240
done
echo "watch period over $(date -u +%H:%M:%SZ) (attempts=$BANKED)" >> "$LOG"
