#!/usr/bin/env python3
"""Headline benchmark: MCTS rollouts/s/chip on vectorized Splendor with the
real three-head network in the loop.

Baseline: the reference achieves ~3,000 rollouts/s on 1 CPU core with no
batching (README.md:14); BASELINE.json's north-star target is >=100k
rollouts/s/chip.  Prints ONE JSON line.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    sims = int(os.environ.get("BENCH_SIMS", "64"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.games.splendor import adapter as A
    from alphazero_tpu.models import splendor_net as N
    from alphazero_tpu.search import mcts as M

    env_cfg = E.SplendorConfig(num_players=2)
    # dtype knobs: BENCH_DTYPE (net trunk compute) / BENCH_STATS_DTYPE (MCTS
    # edge stats).  Both stay float32 by default: measured on this chip the
    # bfloat16 variants are SLOWER (180k f32/f32 vs 163k bf16/bf16 — the
    # converts in the descent loop cost more than the halved backup traffic
    # saves; docs/PERF.md)
    net_cfg = A.net_config_for(
        env_cfg, dtype=os.environ.get("BENCH_DTYPE", "float32"))
    stats_dtype = os.environ.get("BENCH_STATS_DTYPE", "float32")
    params, batch_stats = N.init_params(net_cfg, jax.random.PRNGKey(0))
    bundle = (params, batch_stats)

    eval_fn = A.make_eval_fn(net_cfg)
    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=sims, add_noise=True, dirichlet_alpha=0.2,
                     prior_temp=1.25, stats_dtype=stats_dtype),
        env_cfg.num_players, eval_fn,
        A.make_search_step_fn(env_cfg), A.make_valid_fn(env_cfg)))

    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    roots = jax.jit(jax.vmap(lambda k: E.initial_state(env_cfg, k)))(keys)
    jax.block_until_ready(roots)

    # warmup/compile
    res = search(bundle, roots, jax.random.PRNGKey(2))
    jax.block_until_ready(res.counts)

    t0 = time.perf_counter()
    for i in range(reps):
        res = search(bundle, roots, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(res.counts)
    dt = time.perf_counter() - t0

    rollouts_per_s = batch * sims * reps / dt
    baseline = 3000.0
    print(json.dumps({
        "metric": "mcts_rollouts_per_s_per_chip",
        "value": round(rollouts_per_s, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(rollouts_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
