#!/usr/bin/env python3
"""A/B the staged schedule on the PRODUCTION self-play actor (end-to-end
run_games at B=256/S=128/max_depth=64, PCR on) — the number training gets.
Same-session, same seeds, pins stamped; one JSON object to stdout."""

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")
import bench as BM                                     # noqa: E402

from alphazero_tpu.games.splendor import env as E      # noqa: E402
from alphazero_tpu.games.splendor import adapter as A  # noqa: E402
from alphazero_tpu.models import splendor_net as N     # noqa: E402
from alphazero_tpu.train import selfplay as SP         # noqa: E402


def main():
    tflops, gbps = BM._pin_probes()
    out = {"pin_matmul_tflops": tflops, "pin_hbm_gbps": gbps,
           "degraded": tflops < BM.HEALTHY_TFLOPS_MIN
           or gbps < BM.HEALTHY_GBPS_MIN, "rows": []}

    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg, dtype="float32")
    params, batch_stats = N.init_params(net_cfg, jax.random.PRNGKey(0))
    bundle = (params, batch_stats)
    eval_fn = A.make_eval_fn(net_cfg)

    for spec in ("off", "auto"):
        cfg = SP.SelfPlayConfig(batch_size=256, num_sims=128, ratio_full=4,
                                prob_full=0.25, temp_threshold=10,
                                forced_playouts=True, tree_reuse=False,
                                stage_sims=spec)
        eng = SP.SelfPlayEngine(env_cfg, eval_fn, cfg)
        rng = np.random.default_rng(0)
        eng.run_games(bundle, jax.random.PRNGKey(11), rng)       # warmup
        vals = []
        for k in (12, 13):
            rng2 = np.random.default_rng(0)
            t0 = time.perf_counter()
            _, stats = eng.run_games(bundle, jax.random.PRNGKey(k), rng2)
            dt = time.perf_counter() - t0
            vals.append(round(stats["rollouts"] / dt, 1))
        row = {"stage_sims": spec, "rollouts_per_s": vals,
               "batch": 256, "sims": 128, "max_depth": 64, "pcr": True}
        out["rows"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
