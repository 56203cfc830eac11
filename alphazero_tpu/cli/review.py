"""Review a recorded position: NN value + top MCTS move probabilities
(reference review.py:11-68).

    python -m alphazero_tpu.cli.review ./records/game_0.pkl --turn 12 \
        --checkpoint ./temp/best.pt -m 1600
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def review_position(game, bundle, board, num_sims=1600, top_k=5):
    import jax
    import jax.numpy as jnp
    from ..games.splendor import adapter as A
    from ..models import splendor_net as N
    from ..search import mcts as M
    from ..games.splendor import strings as S

    net_cfg = A.net_config_for(game.cfg)
    valids = game.getValidMoves(board, 0)
    probs, v, _ = N.apply_inference(
        net_cfg, bundle[0], bundle[1],
        jnp.asarray(board, jnp.float32)[None], jnp.asarray(valids)[None])
    print(f"NN value (per seat): {np.asarray(v)[0].round(3).tolist()}")

    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=num_sims), game.cfg.num_players,
        A.make_eval_fn(net_cfg), A.make_search_step_fn(game.cfg),
        A.make_valid_fn(game.cfg)))
    res = search(bundle, jnp.asarray(board)[None], jax.random.PRNGKey(0))
    counts = np.asarray(res.raw_counts)[0]
    pi = counts / max(counts.sum(), 1)
    order = np.argsort(-pi)[:top_k]
    print(f"MCTS root Q: {np.asarray(res.q)[0].round(3).tolist()}")
    for a in order:
        if pi[a] > 0:
            print(f"  {pi[a]:6.1%}  [{a:3d}] {S.move_to_str(int(a))}")
    return pi, np.asarray(res.q)[0]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("record", help="pickled game record (list of boards)")
    p.add_argument("--turn", type=int, default=-1)
    p.add_argument("--checkpoint", "-c", required=True)
    p.add_argument("--numMCTSSims", "-m", type=int, default=1600)
    p.add_argument("--numPlayers", "-np", type=int, default=2)
    args = p.parse_args(argv)

    import os
    import jax
    import jax.numpy as jnp
    from ..games.game_api import SplendorGame
    from ..utils import checkpoint as CKPT

    with open(args.record, "rb") as f:
        boards = pickle.load(f)
    board = np.asarray(boards[args.turn])
    game = SplendorGame(args.numPlayers)
    game.printBoard(board)

    ckpt = CKPT.load_checkpoint(os.path.dirname(args.checkpoint) or ".",
                                os.path.basename(args.checkpoint))
    bundle = (jax.tree_util.tree_map(jnp.asarray, ckpt["params"]),
              jax.tree_util.tree_map(jnp.asarray, ckpt["batch_stats"]))
    review_position(game, bundle, board, args.numMCTSSims)


if __name__ == "__main__":
    main()
