#!/usr/bin/env python3
"""Head-to-head vs the reference author's strongest artifact (VERDICT r4 #6).

genbu.pt is kuboyoo's "provisional strongest" 2-player checkpoint
(/root/reference/analyze.py:40, 暫定最強), the default brain of the
reference's review/live-assist tools.  Import it through
compat/torch_import (forward parity locked by tests/test_torch_import.py)
and pit it against this repo's trained best at EQUAL sims through the
batched arena, both seat orders.

Usage: python scripts/genbu_pit.py <our_ckpt_dir> [out.json]
Env: PIT_SIMS (128), PIT_B (64  games per seat order), PIT_NN_VERSION (1)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

GENBU = "/root/reference/genbu.pt"


def main():
    ours_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/r6"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "bench_out/genbu_pit.json"
    sims = int(os.environ.get("PIT_SIMS", "128"))
    B = int(os.environ.get("PIT_B", "64"))

    from alphazero_tpu.games.splendor import env as E, adapter as A
    from alphazero_tpu.models import splendor_net as N
    from alphazero_tpu.search import mcts as M
    from alphazero_tpu.eval import arena as AR
    from alphazero_tpu.compat import torch_import as TI
    from alphazero_tpu.utils import checkpoint as CKPT

    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    g_params, g_stats, _meta = TI.load_as_bundle(GENBU, net_cfg)
    genbu_bundle = (g_params, g_stats)

    p0, _ = N.init_params(net_cfg, jax.random.PRNGKey(0))
    ck = CKPT.load_network(ours_dir, "best.pt", p0)
    ours_bundle = (jax.tree_util.tree_map(jnp.asarray, ck["params"]),
                   jax.tree_util.tree_map(jnp.asarray, ck["batch_stats"]))

    eval_fn = A.make_eval_fn(net_cfg)
    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=sims), 2, eval_fn,
        A.make_search_step_fn(env_cfg), A.make_valid_fn(env_cfg)))
    ours = AR.make_search_agent(search, ours_bundle)
    genbu = AR.make_search_agent(search, genbu_bundle)
    arena = AR.BatchArena(env_cfg, B)

    w = l = d = 0
    t0 = time.perf_counter()
    for seat, key in ((0, jax.random.PRNGKey(21)), (1, jax.random.PRNGKey(22))):
        agents = [ours, genbu] if seat == 0 else [genbu, ours]
        groups = [0, 1] if seat == 0 else [1, 0]
        wins, dr = arena.play(agents, key).tally(groups)
        w += wins[0]; l += wins[1]; d += dr
        print(json.dumps({"seat_order": seat, "cum": [w, l, d]}), flush=True)
    out = {"ours": ours_dir, "opponent": "reference genbu.pt",
           "sims": sims, "games": w + l + d,
           "ours_wins": w, "genbu_wins": l, "draws": d,
           "winrate": round((w + 0.5 * d) / max(w + l + d, 1), 4),
           "stderr": round(float(np.sqrt(max(w * l, 1)) /
                                 max(w + l, 1) ** 1.5), 4),
           "seconds": round(time.perf_counter() - t0, 1)}
    print(json.dumps(out))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
