#!/usr/bin/env python3
"""Forensics for a class-2 corrupt self-play wave captured via
AZTPU_DEBUG_BAD (train/selfplay.py).  For every corrupt example (root visit
mass on actions invalid for its stored board) this tests the competing
hypotheses:

  H1 row misalignment: the count row belongs to a DIFFERENT board of the
     batch — detected when the visit support fits some other board's valid
     mask but not its own
  H2 stale state: counts fit no live board at all (e.g. a pre-move state of
     the same game)
  H3 host-mask divergence: the dumped valid mask disagrees with
     valid_moves(board) recomputed here — would indicate the mask, not the
     counts, is wrong

Usage: python scripts/analyze_badwave.py bench_out/badwave.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_out/badwave.npz"
    z = np.load(path)
    # full-chunk arrays [T, B, ...]; t = wave of the first corrupt example
    boards_all, counts_all, valids_all = (z["boards"], z["counts"],
                                          z["valids"])
    alive_all, full_all, idx, t = z["alive"], z["full"], z["idx"], int(z["t"])
    T, B = boards_all.shape[:2]
    boards, counts, valids = boards_all[t], counts_all[t], valids_all[t]
    print(f"wave t={t}/{T}: B={B}, full-search examples={len(idx)}")

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from alphazero_tpu.games.splendor import env as E
    cfg = E.SplendorConfig(num_players=2)
    vmoves = jax.jit(jax.vmap(lambda s: E.valid_moves(cfg, s, 0)))
    tv_all = np.asarray([vmoves(jnp.asarray(boards_all[k]))
                         for k in range(t + 1)])       # [t+1, B, A]
    true_valids = tv_all[t]

    n_bad = n_h1 = n_h2 = n_h3 = n_prev = 0
    for i in idx:
        sup = counts[i] > 0
        bad = sup & ~valids[i]
        if not bad.any():
            continue
        n_bad += 1
        if (valids[i] != true_valids[i]).any():
            n_h3 += 1
            if n_h3 <= 3:
                d = np.flatnonzero(valids[i] != true_valids[i])
                print(f"  [H3] ex {i}: dumped mask != recomputed mask at "
                      f"actions {d[:10]}")
            continue
        # same board, EARLIER waves: canonical frames recur every 2 plies in
        # 2P, so compare against t-2, t-4, ... (the mover's own past states)
        prev_fit = [k for k in range(t - 1, -1, -1)
                    if not (sup & ~tv_all[k][i]).any()]
        fits = [j for j in range(B) if j != i
                and not (sup & ~true_valids[j]).any()]
        if prev_fit:
            n_prev += 1
            if n_prev <= 6:
                print(f"  [PREV] ex {i}: support fits its OWN earlier "
                      f"state(s) at wave(s) {prev_fit[:4]} "
                      f"(bad actions {np.flatnonzero(bad)[:8]}, "
                      f"bad visits {int((counts[i] * ~valids[i]).sum())})")
        elif fits:
            n_h1 += 1
            if n_h1 <= 6:
                print(f"  [H1] ex {i}: support fits OTHER live boards "
                      f"{fits[:6]} (bad actions {np.flatnonzero(bad)[:8]})")
        else:
            n_h2 += 1
            if n_h2 <= 6:
                print(f"  [H2] ex {i}: support fits NO live board and none "
                      f"of its own earlier states "
                      f"(bad actions {np.flatnonzero(bad)[:8]})")

    print(f"\ncorrupt examples (first corrupt wave only): {n_bad}")
    print(f"  PREV fits its own earlier state (stale reused root): {n_prev}")
    print(f"  H1 fits another live board (row misalignment):       {n_h1}")
    print(f"  H2 fits nothing seen (foreign state):                {n_h2}")
    print(f"  H3 dumped mask wrong vs recomputed (host-side bug):  {n_h3}")


if __name__ == "__main__":
    main()
