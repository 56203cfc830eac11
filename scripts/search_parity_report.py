#!/usr/bin/env python3
"""Search-parity report vs the reference MCTS: larger run behind
tests/test_search_parity_reference.py, writing docs/search_parity.md.

Usage: python scripts/search_parity_report.py [--sims 200] [--positions 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the ambient sitecustomize pins the TPU tunnel regardless of JAX_PLATFORMS;
# this report is CPU-only so it never contends with a training run
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def run(eval_name, eval_fn, bundle, positions, sims):
    import jax
    import jax.numpy as jnp
    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.games.splendor import adapter as A
    from alphazero_tpu.search import mcts as M
    from oracle.splendor_oracle import OracleBoard
    from tests import reference_mcts_harness as H

    cfg = E.SplendorConfig(num_players=2)
    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=sims), 2, eval_fn,
        A.make_search_step_fn(cfg), A.make_valid_fn(cfg)))
    batch = jnp.asarray(np.stack(positions))
    t0 = time.time()
    res = search(bundle, batch, jax.random.PRNGKey(0))
    ours = np.asarray(res.raw_counts, np.int64)
    our_q = np.asarray(res.q, np.float64)
    t_ours = time.time() - t0

    ref_mod = H.load_reference_mcts()
    rows = []
    t0 = time.time()
    for i, pos in enumerate(positions):
        counts, q = H.reference_visit_counts(
            ref_mod, OracleBoard(2), eval_fn, bundle, pos, sims)
        pi_r = counts / max(counts.sum(), 1)
        pi_o = ours[i] / max(ours[i].sum(), 1)
        kl = float(np.sum(np.where(pi_r > 0,
                                   pi_r * np.log((pi_r + 1e-12)
                                                 / (pi_o + 1e-12)), 0)))
        rows.append({
            "l1": float(np.abs(pi_o - pi_r).sum()),
            "kl_ref_ours": kl,
            "same_best": int(ours[i].argmax() == counts.argmax()),
            "exact": int((ours[i] == counts).all()),
            "dq": float(abs(our_q[i, 0] - q[0])),
        })
    t_ref = time.time() - t0
    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    agg["n"] = len(rows)
    agg["t_ours_s"] = t_ours
    agg["t_ref_s"] = t_ref
    print(eval_name, agg)
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sims", type=int, default=200)
    ap.add_argument("--positions", type=int, default=50)
    ap.add_argument("--out", default="docs/search_parity.md")
    args = ap.parse_args()

    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.games.splendor import adapter as A
    from tests import reference_mcts_harness as H

    cfg = E.SplendorConfig(num_players=2)
    positions = H.random_positions(args.positions + 10, moves=10, seed=11)
    positions = positions[:args.positions]

    results = {}
    results["uniform"] = run("uniform", A.make_uniform_eval_fn(cfg), None,
                             positions, args.sims)
    try:
        from alphazero_tpu.compat import torch_import as TI
        net_cfg = A.net_config_for(cfg)
        p, s, _ = TI.load_as_bundle("/root/reference/genbu.pt", net_cfg)
        results["genbu"] = run("genbu", A.make_eval_fn(net_cfg), (p, s),
                               positions, args.sims)
    except Exception as e:  # torch absent etc.
        print("genbu run skipped:", e)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Search parity vs reference MCTS\n\n")
        f.write(f"{len(positions)} random oracle positions, "
                f"{args.sims} sims/search, noise off, full search, "
                "same frozen evaluator on both sides "
                "(reference run in-place with numba stubbed; see "
                "tests/reference_mcts_harness.py).  The reference gets "
                "sims+1 calls because its first sim only expands the root "
                "(MCTS.py:124-148).\n\n")
        f.write("| evaluator | exact-counts | same argmax | mean L1(pi) | "
                "mean KL(ref||ours) | mean |dQ| |\n|---|---|---|---|---|---|\n")
        for name, a in results.items():
            f.write(f"| {name} | {a['exact']:.2f} | {a['same_best']:.2f} | "
                    f"{a['l1']:.4f} | {a['kl_ref_ours']:.4f} | "
                    f"{a['dq']:.4f} |\n")
        f.write("\nDivergences are float32-vs-float64 UCB tie-break order "
                "only; the search formulas (PUCT, FPU, Qs/Qsa updates, "
                "terminal caching, seat-roll backup) are verified identical "
                "by tests/test_search_parity_reference.py.\n")
        for name, a in results.items():
            f.write(f"\nTiming ({name}): ours {a['t_ours_s']:.2f}s for the "
                    f"whole batch (jitted, incl. compile), reference "
                    f"{a['t_ref_s']:.2f}s sequential.\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
