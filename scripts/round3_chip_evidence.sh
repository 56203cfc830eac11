#!/usr/bin/env bash
# Round-3 on-chip evidence battery (run when the TPU is free).
#
# Produces, in order:
#   1. BASELINE config-3 rows: 4096-env batched search + 2P/3P/4P self-play
#      throughput (bench_out/*.json)
#   2. Tree-reuse validation run (post bf16-install fix): S=128/B=256 reuse ON
#      — the exact runs/r4 corruption shape — must log ZERO invalid-visit
#      masking (runs/reuse_check/)
#   3. Short 3-player training run (runs/r7_3p/)
#
# Each stage is independently timeout-guarded; partial results are still
# written.  Total ~35-45 min on a v5e chip.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_out

echo "=== 1a. 4096-env batched search (BASELINE config 3 scale) ==="
BENCH_BATCH=4096 BENCH_SIMS=64 BENCH_REPS=2 timeout 600 python bench.py \
    2>/dev/null | tail -1 | tee bench_out/search_b4096.json

echo "=== 1b. self-play throughput 2P/3P/4P ==="
for P in 2 3; do
  BENCH_PLAYERS=$P BENCH_BATCH=256 BENCH_SIMS=128 BENCH_REPS=2 \
    timeout 900 python bench_selfplay.py 2>/dev/null | tail -1 \
    | tee bench_out/selfplay_${P}p.json
done

echo "=== 2. tree-reuse validation at the r4 corruption shape ==="
timeout 1200 python -m alphazero_tpu.cli.main -n 1 -e 512 --selfplayBatch 256 \
    -m 128 --ratio-fullMCTS 4 --prob-fullMCTS 0.25 -T 10 -F --tree-reuse \
    -p 1 -b 64 --arenaCompare 16 --eval-baselines 0 \
    -C ./runs/reuse_check --seed 3 > runs_reuse_check.log 2>&1
MASKED=$(grep -c "masking" runs_reuse_check.log || true)
mv runs_reuse_check.log runs/reuse_check/train.log 2>/dev/null || true
echo "{\"reuse_invalid_visit_warnings\": ${MASKED}}" \
    | tee bench_out/reuse_validation.json

echo "=== 3. short 3-player training run ==="
timeout 1500 python -m alphazero_tpu.cli.main -n 3 -np 3 -e 256 \
    --selfplayBatch 128 -m 128 --ratio-fullMCTS 4 --prob-fullMCTS 0.25 \
    -T 10 -F -p 2 -b 64 --arenaCompare 90 --eval-baselines 90 \
    -C ./runs/r7_3p --seed 5 > runs/r7_3p.log 2>&1 || true
mv runs/r7_3p.log runs/r7_3p/train.log 2>/dev/null || true
tail -3 runs/r7_3p/metrics.jsonl 2>/dev/null

echo "=== done ==="
