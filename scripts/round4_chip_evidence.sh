#!/usr/bin/env bash
# Round-4 on-chip evidence battery (run when the TPU is free).
#
#   1. Self-play throughput rows for 2P/3P/4P (BASELINE config-3 scale)
#   2. 4-player 2-iteration end-to-end training smoke (runs/r9_4p_smoke/)
#
# Unlike round 3's battery, a stage that times out or fails FAILS THE SCRIPT
# (exit nonzero) and stamps "status" into its JSON, so partial evidence can
# never read as complete (VERDICT r3 weak #5 / next #8).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_out
FAILED=0

echo "=== 1. self-play throughput 2P/3P/4P ==="
for P in 2 3 4; do
  if BENCH_PLAYERS=$P BENCH_BATCH=256 BENCH_SIMS=128 BENCH_REPS=2 \
      timeout 1200 python bench_selfplay.py 2>bench_out/selfplay_${P}p.err \
      | tail -1 > bench_out/selfplay_${P}p.json; then
    echo "--- ${P}P: $(cat bench_out/selfplay_${P}p.json)"
  else
    echo "{\"status\": \"FAILED_OR_TIMED_OUT\", \"players\": $P}" \
        > bench_out/selfplay_${P}p.json
    echo "!!! ${P}P self-play bench FAILED"
    FAILED=1
  fi
done

echo "=== 2. 4-player end-to-end training smoke (2 iters) ==="
if timeout 2400 python -m alphazero_tpu.cli.main -n 2 -np 4 -e 128 \
    --selfplayBatch 64 -m 128 --ratio-fullMCTS 4 --prob-fullMCTS 0.25 \
    -T 10 -F -p 2 -b 64 --arenaCompare 64 --eval-baselines 64 \
    -C ./runs/r9_4p_smoke --seed 11 > runs/r9_4p_smoke.log 2>&1; then
  mkdir -p runs/r9_4p_smoke
  mv runs/r9_4p_smoke.log runs/r9_4p_smoke/train.log
  tail -2 runs/r9_4p_smoke/metrics.jsonl
else
  echo "!!! 4P training smoke FAILED (see runs/r9_4p_smoke.log)"
  FAILED=1
fi

if [ "$FAILED" -ne 0 ]; then
  echo "=== EVIDENCE BATTERY INCOMPLETE — one or more stages failed ==="
  exit 1
fi
echo "=== done (all stages complete) ==="
