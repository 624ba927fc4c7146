#!/bin/bash
# Round-5 continuation-session healthy-window watcher, revision f (run 13).
#
# Changes vs r5e (whose single bank, scaling_r5_run13_attempt1.txt, was
# contaminated: the session was running pytest suites on the same box during
# the 01:48-01:55 bank window — build_eff 0.671 under foreign load):
#   * LOAD GUARD: a probe/confirm/bank only proceeds when the box's 1-min
#     loadavg is < 4 (an idle box with resident Spark workers sits < 1;
#     a pytest or bench run pushes it > 8) — the watcher now refuses to
#     bank while this session works, instead of silently measuring the
#     contention;
#   * same two-probe confirm gate and 2-attempt budget as r5d/e.
# Every probe sample still lands unfiltered in the log.
cd /root/repo || exit 1
LOG=bench_results/healthy_window_watch_r5f.txt
echo "=== watch started $(date -u +%Y-%m-%dT%H:%M:%SZ) ===" >> "$LOG"
GATE1='
import sys, json
d = json.load(sys.stdin)
print(1 if d["eff_2_to_8"] >= 0.88 and d["2"] >= 11.5 and d["8"] >= 40 else 0)'
GATE2='
import sys, json
d = json.load(sys.stdin)
print(1 if d["eff_2_to_8"] >= 0.84 and d["2"] >= 11.0 and d["8"] >= 38 else 0)'
busy() {
  python -c "import os; print(1 if os.getloadavg()[0] >= 4.0 else 0)"
}
BANKED=0
for i in $(seq 1 80); do
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
    OUT=bench_results/scaling_r5_run13_clean${BANKED}.txt
    echo "HEALTHY $(date -u +%H:%M:%S) — banking scaling attempt $BANKED" >> "$LOG"
    { python bench_results/ceiling_numpy_probe.py 2>/dev/null | sed 's/^/PRE /'; \
      SPARK_GRAFT_SCALE_REPS=3 python bench.py --scaling 2>/tmp/err_scaling_r5_run13_clean${BANKED}; \
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
echo "no healthy window in watch period $(date -u +%H:%M:%SZ)" >> "$LOG"
