#!/usr/bin/env python3
"""Headline benchmark: MCTS rollouts/s/chip on vectorized Splendor with the
real three-head network in the loop.

Baseline: the reference achieves ~3,000 rollouts/s on 1 CPU core with no
batching (README.md:14); BASELINE.json's north-star target is >=100k
rollouts/s/chip.  Prints ONE JSON line.

Variance-proofing (chip-day throughput drifts several percent between
sessions — docs/PERF.md): the line reports the MEDIAN and MIN of >=5 timed
reps, an in-session A/B against the legacy single-level descent
(``descent_unroll=1``, the configuration whose throughput matched rounds
1-3), and two pinned pure-hardware probes (MXU matmul TFLOP/s and an HBM
stream GB/s) so cross-day numbers can be normalized against the hardware
the run actually got."""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _time_reps(fn, reps):
    fn()                                        # warmup/compile
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return out


def _pin_probes(reps=3):
    """Fixed hardware measurements independent of the framework code.
    Loop bodies are data-dependent and non-collapsible (a plain ``v + 1``
    chain gets algebraically folded into one pass, inflating the figure)."""
    key = jax.random.PRNGKey(7)
    # MXU: 4096^3 bf16 matmuls, 8 serially dependent
    a = (jax.random.normal(key, (4096, 4096), jnp.float32) * 1e-2)\
        .astype(jnp.bfloat16)

    @jax.jit
    def mm(a):
        def body(_, x):
            y = jnp.dot(x, x, preferred_element_type=jnp.float32)
            return (y * (1.0 / jnp.maximum(jnp.abs(y).max(), 1e-6)))\
                .astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, 8, body, a)

    t = min(_time_reps(lambda: jax.block_until_ready(mm(a)), reps))
    tflops = 8 * 2 * 4096 ** 3 / t / 1e12

    # HBM: 16 serially dependent full passes over a 256 MiB buffer
    x = jax.random.normal(key, (64, 1024, 1024), jnp.float32)

    @jax.jit
    def stream(x):
        def body(i, v):
            return v * 1.0000001 + i.astype(jnp.float32)
        return jax.lax.fori_loop(0, 16, body, x)

    t = min(_time_reps(lambda: jax.block_until_ready(stream(x)), reps))
    gbps = 16 * 2 * x.size * 4 / t / 1e9       # read + write per pass
    return round(tflops, 1), round(gbps, 1)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    sims = int(os.environ.get("BENCH_SIMS", "64"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    unroll = int(os.environ.get("BENCH_UNROLL", "0"))   # 0 = config default
    skip_ab = os.environ.get("BENCH_SKIP_AB", "") == "1"

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

    def build(u):
        kw = {} if u == 0 else {"descent_unroll": u}
        return jax.jit(M.build_search(
            M.MCTSConfig(num_sims=sims, add_noise=True, dirichlet_alpha=0.2,
                         prior_temp=1.25, stats_dtype=stats_dtype, **kw),
            env_cfg.num_players, eval_fn,
            A.make_search_step_fn(env_cfg), A.make_valid_fn(env_cfg)))

    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    roots = jax.jit(jax.vmap(lambda k: E.initial_state(env_cfg, k)))(keys)
    jax.block_until_ready(roots)

    def run_search(search):
        # fixed key per rep keeps the measured workload identical
        jax.block_until_ready(
            search(bundle, roots, jax.random.PRNGKey(3)).counts)

    times = _time_reps(lambda: run_search(build(unroll)), reps)
    rps_med = batch * sims / _median(times)
    rps_max = batch * sims / min(times)

    out = {
        "metric": "mcts_rollouts_per_s_per_chip",
        "value": round(rps_med, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(rps_med / 3000.0, 2),
        "value_best": round(rps_max, 1),
        "reps": reps,
        "batch": batch,
        "sims": sims,
    }
    if not skip_ab:
        # same-session A/B: measure the OTHER descent-unroll setting so the
        # pair always compares two distinct programs (unroll=1 is the
        # rounds-1-3-equivalent legacy descent; unroll=2 the amortized one)
        from alphazero_tpu.search.mcts import MCTSConfig
        main_u = unroll or MCTSConfig().descent_unroll
        alt_u = 2 if main_u == 1 else 1
        t_alt = _time_reps(lambda: run_search(build(alt_u)), reps)
        alt_med = batch * sims / _median(t_alt)
        out[f"unroll{alt_u}_value"] = round(alt_med, 1)
        out["speedup_vs_alt"] = round(rps_med / alt_med, 3)
        tflops, gbps = _pin_probes()
        out["pin_matmul_tflops"] = tflops
        out["pin_hbm_gbps"] = gbps
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
