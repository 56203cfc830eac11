#!/usr/bin/env bash
# Round-4 chip queue once the 3P run completes:
#   1. round4_chip_evidence.sh  (2P/3P/4P self-play rows + 4P training smoke)
#   2. 3P final strength eval of runs/r8_3p/best.pt (256-sim, batched)
#   3. Glicko-2 tournament over the runs/r6 checkpoint series (rating book)
#   4. Tree-reuse self-play throughput row with the FIXED search
#   5. Headline bench (median-of-5 + in-session A/B + hardware pins)
# Stages fail loudly; partial results are stamped as failed.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_out
FAILED=0

echo "=== 1. 2P/3P/4P evidence battery ==="
bash scripts/round4_chip_evidence.sh || FAILED=1

echo "=== 2. 3P final eval (net vs 2 greedies / 2 randoms, all seats) ==="
CKPT=runs/r8_3p/best.pt SIMS=256 timeout 1800 python - <<'EOF' | tee bench_out/final_eval_3p.json || FAILED=1
import json, os
import jax
from alphazero_tpu.games.splendor import adapter as A, env as E
from alphazero_tpu.models import splendor_net as N
from alphazero_tpu.search import mcts as M
from alphazero_tpu.eval import arena as AR
from alphazero_tpu.utils import checkpoint as CKPT

ckpt_path, sims = os.environ["CKPT"], int(os.environ["SIMS"])
env_cfg = E.SplendorConfig(num_players=3)
net_cfg = A.net_config_for(env_cfg)
params, bs = N.init_params(net_cfg, jax.random.PRNGKey(0))
ck = CKPT.load_network(os.path.dirname(ckpt_path), os.path.basename(ckpt_path), params)
bundle = (jax.tree_util.tree_map(jax.numpy.asarray, ck["params"]),
          jax.tree_util.tree_map(jax.numpy.asarray, ck["batch_stats"]))
search = jax.jit(M.build_search(M.MCTSConfig(num_sims=sims), 3,
                 A.make_eval_fn(net_cfg),
                 A.make_search_step_fn(env_cfg), A.make_valid_fn(env_cfg)))
ar = AR.BatchArena(env_cfg, 84)
net = AR.make_search_agent(search, bundle)
out = {"ckpt": ckpt_path, "sims": sims, "fair_share": 1/3}
for name, opp in (("greedy", AR.make_greedy_agent(env_cfg)),
                  ("random", AR.make_random_agent(ar.valids))):
    w = l = d = 0
    for seat in range(3):
        agents = [net if p == seat else opp for p in range(3)]
        wins, dr = ar.play(agents, jax.random.PRNGKey(31 + seat)).tally(
            [0 if p == seat else 1 for p in range(3)])
        w += wins[0]; l += wins[1]; d += dr
    out[f"vs_{name}"] = {"wins": w, "losses": l, "draws": d,
                         "winrate": (w + 0.5 * d) / max(w + l + d, 1)}
print(json.dumps(out))
EOF

echo "=== 3. Glicko tournament over runs/r6 checkpoints ==="
rm -f bench_out/glicko_r6.json
timeout 3600 python -m alphazero_tpu.cli.pit --tournament runs/r6 --batched \
    -n 64 -m 128 --ratings bench_out/glicko_r6.json --seed 17 \
    2>&1 | tail -25 | tee bench_out/glicko_r6.log || FAILED=1

echo "=== 4. fixed-search tree-reuse self-play row ==="
BENCH_REUSE=1 BENCH_BATCH=256 BENCH_SIMS=128 BENCH_REPS=2 \
  timeout 2400 python bench_selfplay.py 2>/dev/null | tail -1 \
  | tee bench_out/selfplay_2p_reuse_fixed.json || FAILED=1

echo "=== 5. headline bench ==="
timeout 1200 python bench.py 2>/dev/null | tail -1 | tee bench_out/bench_r4.json || FAILED=1

if [ "$FAILED" -ne 0 ]; then
  echo "=== QUEUE INCOMPLETE — one or more stages failed ==="
  exit 1
fi
echo "=== post-3p queue done ==="
