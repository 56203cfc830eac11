"""Process-pool AlphaBeta agent for the batched arena.

The reference pits its NN+MCTS player against ``AlphaBetaPlayer`` at depth 6
with a 10 s per-move wall-clock deadline (SplendorPlayers.py:15-16,252-283)
— a host-CPU tree search that cannot be vectorized onto the TPU.  Running it
inside the lockstep :class:`~alphazero_tpu.eval.arena.BatchArena` would
serialize B deadline-bound searches per wave, so this module farms the
boards of each wave out to a persistent pool of worker processes.  Each
worker pins JAX to the host CPU platform (the ambient axon/TPU tunnel costs
1-25 ms PER dispatch, which would starve the alpha-beta of its node budget)
and owns a warm jitted engine, so its 10 s deadline buys a comparable node
budget to the reference's numba engine driving the same Python search."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

_G: dict = {}


def _init_worker(num_players: int, depth: int, deadline_s: float,
                 value_ckpt: str | None = None):
    # Must run before any JAX device use in the child: pin the platform to
    # CPU both ways (the axon sitecustomize force-registers the TPU plugin
    # and ignores the env var alone — same dance as tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ..games.game_api import SplendorGame
    from . import players as P
    game = SplendorGame(num_players)
    _G["game"] = game
    value_fn = None
    if value_ckpt:
        # reference AlphaBetaPlayer evaluates leaves with the NN value head
        # (valueFuncNN, SplendorPlayers.py:177-181; pit.py:71-72 passes the
        # NN player's own net in) — load the same checkpoint in each worker
        import jax.numpy as jnp
        from ..games.splendor import adapter as A
        from ..games.splendor import env as E
        from ..models import splendor_net as N
        from ..utils import checkpoint as C
        env_cfg = E.SplendorConfig(num_players=num_players)
        net_cfg = A.net_config_for(env_cfg)
        params, _ = N.init_params(net_cfg, jax.random.PRNGKey(0))
        ck = C.load_network(os.path.dirname(value_ckpt) or ".",
                           os.path.basename(value_ckpt), params)
        bundle = (jax.tree_util.tree_map(jnp.asarray, ck["params"]),
                  jax.tree_util.tree_map(jnp.asarray, ck["batch_stats"]))
        eval_fn = A.make_eval_fn(net_cfg)
        valid_fn = A.make_valid_fn(env_cfg)

        @jax.jit
        def _v(state):
            valid = valid_fn(state)
            _, v = eval_fn(bundle, state[None].astype(jnp.float32),
                           valid[None])
            return v[0, 0]

        value_fn = lambda board: float(_v(jnp.asarray(board)))  # noqa: E731
        value_fn(game.getInitBoard())          # warm the jit
    _G["player"] = P.AlphaBetaPlayer(game, depth=depth, deadline_s=deadline_s,
                                     value_fn=value_fn)
    # warm the jitted engine entry points so the first real move's deadline
    # is not spent compiling
    b = game.getInitBoard()
    game.getValidMoves(b, 0)
    game.getNextState(b, 0, int(np.flatnonzero(game.getValidMoves(b, 0))[0]),
                      deterministic=True)
    game.getGameEnded(b)
    game.getScore(b, 0)


def _play_one(board: np.ndarray) -> int:
    game = _G["game"]
    if game.getGameEnded(board).any():
        # lockstep arenas keep stepping finished games; answer instantly
        # with any legal move instead of burning the deadline
        return int(np.flatnonzero(game.getValidMoves(board, 0))[0])
    return int(_G["player"].play(board))


class AlphaBetaPool:
    """Persistent worker pool exposing the batched-arena Agent protocol:
    ``agent(canonical_states [B,R,7], key) -> actions [B]``."""

    def __init__(self, num_players: int, depth: int = 6,
                 deadline_s: float = 10.0, workers: int | None = None,
                 value_ckpt: str | None = None):
        import multiprocessing as mp
        self.workers = workers or max(os.cpu_count() or 2, 1)
        ctx = mp.get_context("spawn")
        self.pool = ctx.Pool(self.workers, initializer=_init_worker,
                             initargs=(num_players, depth, deadline_s,
                                       value_ckpt))

    def agent(self, canon, key):
        boards = np.asarray(canon)
        actions = self.pool.map(_play_one,
                                [boards[i] for i in range(len(boards))],
                                chunksize=1)
        return jnp.asarray(actions, jnp.int32)

    def close(self):
        self.pool.terminate()
        self.pool.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
