#!/usr/bin/env python3
"""End-to-end self-play throughput benchmark on the real chip.

Complements bench.py (search-only): this drives the full production actor —
batched MCTS with tree reuse, action sampling, real chance-draw env steps,
finalization and host example collection (SelfPlayEngine.run_games) — and
reports games/s, moves/s, examples/s and rollouts/s, plus a device-FLOP/s
estimate from XLA's compiled cost analysis of the fused actor step.

Reference anchor: ~3,000 rollouts/s and ~30 s per game at 1600 sims/move on
1 CPU core (reference README.md:14); `vs_baseline` is measured rollouts/s
against that 3k/s figure.  Prints ONE JSON line.
"""

import json
import os
import sys
import time

import jax
import numpy as np


def main():
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    sims = int(os.environ.get("BENCH_SIMS", "128"))
    reps = int(os.environ.get("BENCH_REPS", "2"))
    reuse = os.environ.get("BENCH_REUSE", "0") == "1"
    players = int(os.environ.get("BENCH_PLAYERS", "2"))

    from alphazero_tpu.games.splendor import adapter as A
    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.models import splendor_net as N
    from alphazero_tpu.train import selfplay as SP

    env_cfg = E.SplendorConfig(num_players=players)
    net_cfg = A.net_config_for(
        env_cfg, dtype=os.environ.get("BENCH_DTYPE", "float32"))
    params, bs = N.init_params(net_cfg, jax.random.PRNGKey(0))
    bundle = (params, bs)

    cfg = SP.SelfPlayConfig(batch_size=batch, num_sims=sims, ratio_full=4,
                            prob_full=0.25, temp_threshold=10,
                            forced_playouts=True, tree_reuse=reuse,
                            stats_dtype=os.environ.get("BENCH_STATS_DTYPE",
                                                       "auto"))
    eng = SP.SelfPlayEngine(env_cfg, A.make_eval_fn(net_cfg), cfg)
    rng = np.random.default_rng(0)

    # warmup: compiles the fused actor chunk + finalization
    eng.run_games(bundle, jax.random.PRNGKey(1), rng)

    totals = {"games": 0, "rollouts": 0, "examples": 0, "moves": 0.0}
    t0 = time.perf_counter()
    for i in range(reps):
        _, stats = eng.run_games(bundle, jax.random.PRNGKey(2 + i), rng)
        totals["games"] += stats["games"]
        totals["rollouts"] += stats["rollouts"]
        totals["examples"] += stats["examples"]
        totals["moves"] += stats["avg_moves"] * stats["games"]
    dt = time.perf_counter() - t0

    # model-FLOP/s estimate: one leaf evaluation per rollout, ~2 FLOPs per
    # parameter per example forward (dense nets); lower bound — excludes env
    # step, tree ops, and the reroot compaction
    n_params = N.count_params(params)
    model_flops_per_s = 2.0 * n_params * totals["rollouts"] / dt

    out = {
        "metric": "selfplay_rollouts_per_s_per_chip",
        "value": round(totals["rollouts"] / dt, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(totals["rollouts"] / dt / 3000.0, 2),
        "games_per_s": round(totals["games"] / dt, 2),
        "moves_per_s": round(totals["moves"] / dt, 1),
        "examples_per_s": round(totals["examples"] / dt, 1),
        "batch": batch,
        "num_sims": sims,
        "num_players": players,
        "tree_reuse": reuse,
        "model_flops_per_s": round(model_flops_per_s),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
