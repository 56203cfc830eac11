#!/usr/bin/env python3
"""Minimal repro/bisect harness for the class-2 tree-reuse corruption
(docs/PERF.md): run N self-play batches at the runs/r4 corruption shape
(S=128, B=256, reuse ON, partitioned full/fast searches) and count
invalid-visit maskings — root visit mass on actions invalid for the stored
root state, i.e. "counts for a different state".

Variants (env REPRO_MODE):
  baseline     reuse ON, donation ON, no barrier      (expect warnings)
  nodonate     reuse ON, donation OFF                 (aliasing hypothesis A)
  barrier      reuse ON, donation ON, barrier after reroot (hypothesis B)
  both         donation OFF + barrier
  fullonly     reuse ON, prob_full=1.0 (no partition merge gathers)
  off          reuse OFF (control; must be 0)

Prints one JSON line: {"mode":..., "warnings": K, "bad_visits": V,
"examples": E, "batches": N}.
"""

import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


class _Counter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.records = 0
        self.visits = 0

    def emit(self, record):
        if "masking" in record.getMessage():
            self.records += 1
            self.visits += int(record.args[0]) if record.args else 0


def main():
    mode = os.environ.get("REPRO_MODE", "baseline")
    batches = int(os.environ.get("REPRO_BATCHES", "2"))
    sims = int(os.environ.get("REPRO_SIMS", "128"))
    batch = int(os.environ.get("REPRO_BATCH", "256"))

    from alphazero_tpu.games.splendor import adapter as A
    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.models import splendor_net as N
    from alphazero_tpu.train import selfplay as SP

    reuse = mode != "off"
    cfg = SP.SelfPlayConfig(
        batch_size=batch, num_sims=sims, ratio_full=4,
        prob_full=1.0 if mode == "fullonly" else 0.25,
        temp_threshold=10, forced_playouts=True, tree_reuse=reuse,
        donate_chunk=mode not in ("nodonate", "both"),
        reuse_barrier=mode in ("barrier", "both"),
        debug_outputs=bool(os.environ.get("AZTPU_DEBUG_BAD")))

    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    params, bs = N.init_params(net_cfg, jax.random.PRNGKey(0))
    engine = SP.SelfPlayEngine(env_cfg, A.make_eval_fn(net_cfg), cfg)

    counter = _Counter()
    logging.getLogger("alphazero_tpu.train.selfplay").addHandler(counter)
    logging.getLogger("alphazero_tpu.train.selfplay").setLevel(logging.WARNING)

    rng = np.random.default_rng(3)
    examples = 0
    for i in range(batches):
        it, stats = engine.run_games((params, bs), jax.random.PRNGKey(100 + i),
                                     rng)
        examples += stats["examples"]
        print(f"# batch {i}: {stats['examples']} examples, "
              f"{counter.records} warnings so far", file=sys.stderr)

    print(json.dumps({"mode": mode, "warnings": counter.records,
                      "bad_visits": counter.visits, "examples": examples,
                      "batches": batches, "sims": sims, "batch": batch}))


if __name__ == "__main__":
    main()
