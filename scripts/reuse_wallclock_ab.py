#!/usr/bin/env python3
"""Equal-wall-clock strength A/B for cross-move tree reuse (VERDICT r4 #4).

The reference keeps its MCTS tree across moves unconditionally
(MCTS.py:27-36); here reuse ships off-by-default on a cost argument that
was never strength-tested.  This script settles it on hardware:

  stage 1: measure the per-move cost of reuse-ON at S_ON sims vs fresh
           search at the same sims (arena wall-clock, same checkpoint);
  stage 2: pit reuse-ON at S_ON against fresh-OFF at S_EQ — the sims that
           cost the same wall-clock per move (S_EQ = S_ON * t_ON/t_OFF,
           from stage 1) — over >= 2x128 seat-balanced games.

Usage: python scripts/reuse_wallclock_ab.py <ckpt_dir> [out.json]
Env: AB_SON (128), AB_GAMES_B (128), AB_KEEP (0 -> num_sims)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/r6"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "bench_out/reuse_wallclock_ab.json"
    S_ON = int(os.environ.get("AB_SON", "128"))
    B = int(os.environ.get("AB_GAMES_B", "128"))
    KEEP = int(os.environ.get("AB_KEEP", "0"))

    from alphazero_tpu.games.splendor import env as E, adapter as A
    from alphazero_tpu.models import splendor_net as N
    from alphazero_tpu.search import mcts as M
    from alphazero_tpu.eval import arena as AR
    from alphazero_tpu.utils import checkpoint as CKPT

    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    p0, _ = N.init_params(net_cfg, jax.random.PRNGKey(0))
    ck = CKPT.load_network(ckpt_dir, "best.pt", p0)
    bundle = (jax.tree_util.tree_map(jnp.asarray, ck["params"]),
              jax.tree_util.tree_map(jnp.asarray, ck["batch_stats"]))
    eval_fn = A.make_eval_fn(net_cfg)
    step_fn = A.make_search_step_fn(env_cfg)
    valid_fn = A.make_valid_fn(env_cfg)

    def fresh(sims):
        return jax.jit(M.build_search(M.MCTSConfig(num_sims=sims), 2,
                                      eval_fn, step_fn, valid_fn))

    def reusing():
        return M.build_reusing_search(
            M.MCTSConfig(num_sims=S_ON), 2, eval_fn, step_fn, valid_fn,
            keep_cap=KEEP)

    arena = AR.BatchArena(env_cfg, B)

    def timed_match(a0, a1, key, reset=()):
        for a in reset:
            a.reset()
        t0 = time.perf_counter()
        res = arena.play([a0, a1], key)
        dt = time.perf_counter() - t0
        return res, dt

    out = {"ckpt": ckpt_dir, "S_ON": S_ON, "games_per_side": 2 * B,
           "keep_cap": KEEP or S_ON}

    # ---- stage 1: per-move cost, reuse-ON vs fresh at the SAME sims
    on_agent = AR.ReusingAgent(reusing(), bundle)
    off_same = AR.make_search_agent(fresh(S_ON), bundle)
    r_w, t_on = timed_match(on_agent, off_same, jax.random.PRNGKey(1),
                            reset=(on_agent,))
    # fresh-vs-fresh control at the same sims on the same boards
    r_c, t_off = timed_match(off_same, AR.make_search_agent(fresh(S_ON),
                                                            bundle),
                             jax.random.PRNGKey(1))
    # both matches run ~the same move count; reuse agent plays half the
    # moves, so per-move overhead factor = 2*(t_on - t_off/2)/t_off
    cost_factor = max(2.0 * (t_on - t_off / 2.0) / max(t_off, 1e-9), 0.1)
    out["stage1"] = {"t_match_on_vs_off": round(t_on, 1),
                     "t_match_off_vs_off": round(t_off, 1),
                     "moves_on": r_w.moves, "moves_off": r_c.moves,
                     "reuse_cost_factor_per_move": round(cost_factor, 2)}
    S_EQ = max(int(round(S_ON * cost_factor)), S_ON)
    out["S_EQ"] = S_EQ
    print(json.dumps(out), flush=True)

    # ---- stage 2: equal-wall-clock strength, both seat orders
    off_eq = AR.make_search_agent(fresh(S_EQ), bundle)
    w = l = d = 0
    t_stage2 = 0.0
    for seat, key in ((0, jax.random.PRNGKey(2)), (1, jax.random.PRNGKey(3))):
        agents = ([on_agent, off_eq] if seat == 0 else [off_eq, on_agent])
        groups = [0, 1] if seat == 0 else [1, 0]
        res, dt = timed_match(agents[0], agents[1], key, reset=(on_agent,))
        wins, dr = res.tally(groups)
        w += wins[0]; l += wins[1]; d += dr
        t_stage2 += dt
    out["stage2"] = {
        "reuse_on_wins": w, "fresh_eq_wins": l, "draws": d,
        "winrate_reuse": round((w + 0.5 * d) / max(w + l + d, 1), 4),
        "stderr": round(float(np.sqrt(max(w * l, 1)) /
                              max(w + l, 1) ** 1.5), 4),
        "seconds": round(t_stage2, 1)}
    print(json.dumps(out), flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
