#!/usr/bin/env python3
"""Headline benchmark: MCTS rollouts/s/chip on vectorized Splendor with the
real three-head network in the loop.

Baseline: the reference achieves ~3,000 rollouts/s on 1 CPU core with no
batching (README.md:14); BASELINE.json's north-star target is >=100k
rollouts/s/chip.  Prints ONE JSON line.

Timing methodology (v2 — round 5):
- The axon TPU tunnel dispatches ASYNCHRONOUSLY and ``block_until_ready``
  returns before the computation runs (measured: a 1.1-TFLOP matmul chain
  "completes" in 0.1 ms), so every timed region forces a REAL sync by
  fetching a scalar reduction of the result to the host.  The tunnel
  round-trip time (RTT, ~25 ms) is measured separately and subtracted from
  each rep; both raw and corrected figures are reported.
- Hardware pins are measured FIRST and by MARGINAL SLOPE: the same jitted
  loop at two trip counts, throughput = extra work / extra time — immune to
  both RTT and dispatch overhead.  Healthy v5e ~= 190+ TFLOPs bf16 marginal
  (peak 197) and ~650 GB/s stream (spec 819).  If the pins fall below
  half-healthy the JSON is stamped ``"degraded": true`` so a bad chip-day
  can never be mistaken for a code regression (round-4 lesson: BENCH_r04
  was captured in a ~35x time-sliced degraded window, docs/PERF.md).
- Search objects are built ONCE and reused across reps (the round-4 bench
  rebuilt jax.jit(build(...)) inside the timed closure, so every rep paid
  retrace+compile — ADVICE.md r4, high severity).
- Two rows: the kernel headline (fresh-tree B=1024/S=64, noise on) and a
  production self-play row (B=256/S=128, PCR on — what training actually
  gets), so the official record tracks both axes.
"""

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


def _time_fetch(fn, reps):
    """Time ``fn`` (which must RETURN A JAX SCALAR) with a forced host fetch
    per rep — the only reliable sync under the async tunnel."""
    float(fn())                                  # warmup/compile
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        out.append(time.perf_counter() - t0)
    return out


def _tunnel_rtt(reps=15):
    """Round-trip time of dispatching a trivial op and fetching its scalar.
    This is pure tunnel+dispatch latency; subtracted from timed reps."""
    one = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    return min(_time_fetch(lambda: one(x), reps))


def _pin_probes(reps=3):
    """Marginal-slope hardware probes, independent of the framework code.
    Loop bodies are data-dependent and non-collapsible.  Slope method:
    run the same loop at two trip counts and divide extra work by extra
    time — RTT and fixed overhead cancel."""
    import functools
    key = jax.random.PRNGKey(7)

    a = (jax.random.normal(key, (4096, 4096), jnp.float32) * 1e-2)\
        .astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=1)
    def mm(a, n):
        def body(_, x):
            y = jnp.dot(x, x, preferred_element_type=jnp.float32)
            return (y * (1.0 / jnp.maximum(jnp.abs(y).max(), 1e-6)))\
                .astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, a).astype(jnp.float32).sum()

    lo, hi = 16, 64
    t_lo = min(_time_fetch(lambda: mm(a, lo), reps))
    t_hi = min(_time_fetch(lambda: mm(a, hi), reps))
    tflops = (hi - lo) * 2 * 4096 ** 3 / max(t_hi - t_lo, 1e-9) / 1e12

    x = jax.random.normal(key, (64, 1024, 1024), jnp.float32)   # 256 MiB

    @functools.partial(jax.jit, static_argnums=1)
    def stream(x, n):
        def body(i, v):
            return v * 1.0000001 + i.astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, x)[0, 0, :8].sum()

    lo, hi = 32, 128
    t_lo = min(_time_fetch(lambda: stream(x, lo), reps))
    t_hi = min(_time_fetch(lambda: stream(x, hi), reps))
    gbps = (hi - lo) * 2 * x.size * 4 / max(t_hi - t_lo, 1e-9) / 1e9
    return round(tflops, 1), round(gbps, 1)


# below half of healthy marginal-slope values (~195 TFLOPs / ~660 GB/s on
# this v5e) => the chip is time-sliced/degraded; stamp, don't trust
HEALTHY_TFLOPS_MIN = 100.0
HEALTHY_GBPS_MIN = 330.0


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    sims = int(os.environ.get("BENCH_SIMS", "64"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    unroll = int(os.environ.get("BENCH_UNROLL", "0"))   # 0 = config default
    skip_ab = os.environ.get("BENCH_SKIP_AB", "") == "1"
    skip_sp = os.environ.get("BENCH_SKIP_SELFPLAY", "") == "1"

    # pins FIRST: a degraded chip must be visible before any headline number
    tflops, gbps = _pin_probes()
    degraded = tflops < HEALTHY_TFLOPS_MIN or gbps < HEALTHY_GBPS_MIN
    rtt = _tunnel_rtt()

    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.games.splendor import adapter as A
    from alphazero_tpu.models import splendor_net as N
    from alphazero_tpu.search import mcts as M

    env_cfg = E.SplendorConfig(num_players=2)
    # dtype knobs: BENCH_DTYPE (net trunk compute) / BENCH_STATS_DTYPE (MCTS
    # edge stats).  Stats default to "auto" (bf16 on TPU for fresh trees
    # <= 256 capacity — measured 1.47x on v5e with the sign-packed
    # pointers, round 5); the trunk stays float32 (bf16 trunk measured
    # slower on this chip; docs/PERF.md).
    net_cfg = A.net_config_for(
        env_cfg, dtype=os.environ.get("BENCH_DTYPE", "float32"))
    stats_dtype = os.environ.get("BENCH_STATS_DTYPE", "auto")
    params, batch_stats = N.init_params(net_cfg, jax.random.PRNGKey(0))
    bundle = (params, batch_stats)
    eval_fn = A.make_eval_fn(net_cfg)

    def build(u):
        """Build ONE timed search program: the full search followed by a
        scalar counts reduction, so each rep syncs on a single fetched f32
        (fetching the [B,A] counts array would add tunnel transfer time)."""
        kw = {} if u == 0 else {"descent_unroll": u}
        search = M.build_search(
            M.MCTSConfig(num_sims=sims, add_noise=True, dirichlet_alpha=0.2,
                         prior_temp=1.25, stats_dtype=stats_dtype, **kw),
            env_cfg.num_players, eval_fn,
            A.make_search_step_fn(env_cfg), A.make_valid_fn(env_cfg))

        @jax.jit
        def timed(bundle, roots, key):
            return search(bundle, roots, key).counts.sum()
        return timed

    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    roots = jax.jit(jax.vmap(lambda k: E.initial_state(env_cfg, k)))(keys)
    float(roots.astype(jnp.float32).sum())       # force materialization

    key3 = jax.random.PRNGKey(3)                 # fixed key: identical work

    s_main = build(unroll)                       # built ONCE (ADVICE r4)
    times = _time_fetch(lambda: s_main(bundle, roots, key3), reps)
    corr = [max(t - rtt, 1e-9) for t in times]
    rps_med = batch * sims / _median(corr)
    rps_max = batch * sims / min(corr)

    out = {
        "metric": "mcts_rollouts_per_s_per_chip",
        "value": round(rps_med, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(rps_med / 3000.0, 2),
        "value_best": round(rps_max, 1),
        "value_raw_uncorrected": round(batch * sims / _median(times), 1),
        "reps": reps,
        "batch": batch,
        "sims": sims,
        "degraded": degraded,
        "stage_schedule": list(M._resolve_stage_schedule(
            M.MCTSConfig(num_sims=sims)) or ()),
        "pin_matmul_tflops": tflops,
        "pin_hbm_gbps": gbps,
        "pins_method": "marginal-slope-v2",
        "tunnel_rtt_ms": round(rtt * 1e3, 2),
        "sync": "host-fetch",
    }

    if not skip_ab:
        # same-session A/B: the OTHER descent-unroll setting, also built
        # once outside the timed region
        main_u = unroll or M.MCTSConfig().descent_unroll
        alt_u = 2 if main_u == 1 else 1
        s_alt = build(alt_u)
        t_alt = _time_fetch(lambda: s_alt(bundle, roots, key3), reps)
        alt_med = batch * sims / _median([max(t - rtt, 1e-9) for t in t_alt])
        out[f"unroll{alt_u}_value"] = round(alt_med, 1)
        out["speedup_vs_alt"] = round(rps_med / alt_med, 3)

    if not skip_sp:
        # production row: the full self-play actor at training shapes
        # (B=256, S=128, playout-cap randomization on).  run_games fetches
        # host examples, so its wall time is sync-safe by construction.
        import numpy as np
        from alphazero_tpu.train import selfplay as SP
        sp_cfg = SP.SelfPlayConfig(batch_size=256, num_sims=128, ratio_full=4,
                                   prob_full=0.25, temp_threshold=10,
                                   forced_playouts=True, tree_reuse=False,
                                   stats_dtype=stats_dtype)
        eng = SP.SelfPlayEngine(env_cfg, eval_fn, sp_cfg)
        rng = np.random.default_rng(0)
        eng.run_games(bundle, jax.random.PRNGKey(11), rng)      # warmup
        t0 = time.perf_counter()
        _, stats = eng.run_games(bundle, jax.random.PRNGKey(12), rng)
        dt = time.perf_counter() - t0
        out["selfplay"] = {
            "value": round(stats["rollouts"] / dt, 1),
            "unit": "rollouts/s",
            "games_per_s": round(stats["games"] / dt, 2),
            "examples_per_s": round(stats["examples"] / dt, 1),
            "batch": 256, "sims": 128, "pcr": True,
        }

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
