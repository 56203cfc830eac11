#!/usr/bin/env python3
"""A/B the staged tree-capacity schedule (MCTSConfig.stage_sims) on chip.

Same timing methodology as bench.py v2 (host-fetch sync, RTT-corrected,
pins first so a degraded window can't decide a default).  Emits one JSON
object with rollouts/s per schedule at the headline shape (B=1024/S=64)
and at the production self-play search shape (B=256/S=128).
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as BM                                     # noqa: E402

from alphazero_tpu.games.splendor import env as E      # noqa: E402
from alphazero_tpu.games.splendor import adapter as A  # noqa: E402
from alphazero_tpu.models import splendor_net as N     # noqa: E402
from alphazero_tpu.search import mcts as M             # noqa: E402


def main():
    reps = 5
    tflops, gbps = BM._pin_probes()
    rtt = BM._tunnel_rtt()
    out = {"pin_matmul_tflops": tflops, "pin_hbm_gbps": gbps,
           "tunnel_rtt_ms": round(rtt * 1e3, 2),
           "degraded": tflops < BM.HEALTHY_TFLOPS_MIN
           or gbps < BM.HEALTHY_GBPS_MIN, "rows": []}

    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg, dtype="float32")
    params, batch_stats = N.init_params(net_cfg, jax.random.PRNGKey(0))
    bundle = (params, batch_stats)
    eval_fn = A.make_eval_fn(net_cfg)
    step_fn = A.make_search_step_fn(env_cfg)
    valid_fn = A.make_valid_fn(env_cfg)

    for batch, sims, specs in (
            (1024, 64, ("off", "auto", "8,8,16,32", "32,32", "16,48")),
            (256, 128, ("off", "auto", "16,16,32,64", "32,32,64"))):
        keys = jax.random.split(jax.random.PRNGKey(1), batch)
        roots = jax.jit(jax.vmap(lambda k: E.initial_state(env_cfg, k)))(keys)
        float(roots.astype(jnp.float32).sum())
        key3 = jax.random.PRNGKey(3)
        for spec in specs:
            mcfg = M.MCTSConfig(num_sims=sims, add_noise=True,
                                dirichlet_alpha=0.2, prior_temp=1.25,
                                stage_sims=spec)
            search = M.build_search(mcfg, 2, eval_fn, step_fn, valid_fn)

            @jax.jit
            def timed(bundle, roots, key):
                return search(bundle, roots, key).counts.sum()

            t0 = time.perf_counter()
            first = BM._time_fetch(lambda: timed(bundle, roots, key3), reps)
            compile_s = time.perf_counter() - t0 - sum(first)
            corr = [max(t - rtt, 1e-9) for t in first]
            row = {"batch": batch, "sims": sims, "stage_sims": spec,
                   "schedule": list(M._resolve_stage_schedule(mcfg) or ()),
                   "rollouts_per_s": round(batch * sims / BM._median(corr), 1),
                   "best": round(batch * sims / min(corr), 1),
                   "compile_s": round(compile_s, 1)}
            out["rows"].append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
