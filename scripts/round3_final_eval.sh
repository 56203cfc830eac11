#!/usr/bin/env bash
# Final strength report for the round-3 headline run (BASELINE config 4):
#   1. runs/r6/best.pt vs greedy and random — 256 games each at full search
#      depth (512 sims), batched on the chip
#   2. runs/r6/best.pt vs AlphaBetaPlayer (depth 4) — sequential pit games
# Usage: scripts/round3_final_eval.sh [CKPT=runs/r6/best.pt] [SIMS=512]
set -u
cd "$(dirname "$0")/.."
CKPT="${1:-runs/r6/best.pt}"
SIMS="${2:-512}"
mkdir -p bench_out

echo "=== batched eval vs greedy/random (${SIMS} sims, 256 games each) ==="
CKPT="$CKPT" SIMS="$SIMS" timeout 1800 python - <<'EOF' | tee bench_out/final_eval_baselines.json
import json, os
import jax
import numpy as np
from alphazero_tpu.games.splendor import adapter as A, env as E
from alphazero_tpu.models import splendor_net as N
from alphazero_tpu.search import mcts as M
from alphazero_tpu.eval import arena as AR
from alphazero_tpu.utils import checkpoint as CKPT

ckpt_path, sims = os.environ["CKPT"], int(os.environ["SIMS"])
env_cfg = E.SplendorConfig(num_players=2)
net_cfg = A.net_config_for(env_cfg)
params, bs = N.init_params(net_cfg, jax.random.PRNGKey(0))
ck = CKPT.load_network(os.path.dirname(ckpt_path), os.path.basename(ckpt_path), params)
bundle = (jax.tree_util.tree_map(jax.numpy.asarray, ck["params"]),
          jax.tree_util.tree_map(jax.numpy.asarray, ck["batch_stats"]))
eval_fn = A.make_eval_fn(net_cfg)
search = jax.jit(M.build_search(M.MCTSConfig(num_sims=sims), 2, eval_fn,
                 A.make_search_step_fn(env_cfg), A.make_valid_fn(env_cfg)))
ar = AR.BatchArena(env_cfg, 128)
net = AR.make_search_agent(search, bundle)
out = {"ckpt": ckpt_path, "sims": sims}
for name, opp in (("greedy", AR.make_greedy_agent(env_cfg)),
                  ("random", AR.make_random_agent(ar.valids))):
    r1 = ar.play([net, opp], jax.random.PRNGKey(11))
    r2 = ar.play([opp, net], jax.random.PRNGKey(12))
    w1, d1 = r1.tally([0, 1]); w2, d2 = r2.tally([1, 0])
    w, l, d = int(w1[0] + w2[0]), int(w1[1] + w2[1]), int(d1 + d2)
    out[f"vs_{name}"] = {"wins": w, "losses": l, "draws": d,
                         "winrate": (w + 0.5 * d) / max(w + l + d, 1)}
print(json.dumps(out))
EOF

echo "=== pit vs alphabeta (reference config: depth 6, 10 s/move, NN leaves) ==="
# batched lockstep arena + CPU worker pool: the sequential host loop could
# not finish >=20 reference-config games (VERDICT r3 weak #5); this one
# does (see bench_out/final_eval_alphabeta_r4.json for the committed run)
if ! timeout 7200 python -m alphazero_tpu.cli.pit "$CKPT" alphabeta --batched \
    -n 20 -m "$SIMS" --ab-depth 6 --ab-deadline 10.0 --seed 9 \
    2>&1 | tail -3 | tee bench_out/final_eval_alphabeta.txt; then
  echo '{"status": "FAILED_OR_TIMED_OUT"}' > bench_out/final_eval_alphabeta.txt
  exit 1
fi
