"""Host-side Game API: the reference's 13-method interface (Game.py:1-162)
over numpy states, backed by the jitted functional env.

This is the convenience layer for CLIs, human play and single-board tools;
the training/search hot path uses the functional env directly."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .splendor import env as E
from .splendor import strings as S
from .splendor import symmetry as SYM
from .splendor import tables as T


class SplendorGame:
    """Reference parity: SplendorGame.py:11-86."""

    def __init__(self, num_players: int = 2, token_limit: int = 10,
                 enable_reserve: bool = True, enable_giveback: bool = True,
                 seed: int = 0):
        self.cfg = E.SplendorConfig(
            num_players=num_players, token_limit=token_limit,
            enable_reserve=enable_reserve, enable_giveback=enable_giveback)
        self.num_players = num_players
        self._key = jax.random.PRNGKey(seed)
        self._np_rng = np.random.default_rng(seed)

    # --------------------------------------------------------------- helpers
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------ API
    def getInitBoard(self) -> np.ndarray:
        return np.asarray(E.initial_state_jit(self.cfg, self._next_key()))

    def getBoardSize(self):
        return self.cfg.observation_shape

    def getActionSize(self) -> int:
        return self.cfg.num_actions

    def getMaxScoreDiff(self) -> int:
        return 15

    def getNextState(self, board, player, action, deterministic=False):
        u = jnp.asarray(self._np_rng.random(2), jnp.float32)
        s2, nxt = E.step_jit(self.cfg, jnp.asarray(board), action, player, u,
                             deterministic)
        return np.asarray(s2), int(nxt)

    def getValidMoves(self, board, player) -> np.ndarray:
        return np.asarray(E.valid_moves_jit(self.cfg, jnp.asarray(board), player))

    def getGameEnded(self, board, next_player=0) -> np.ndarray:
        return np.asarray(E.check_end_game_jit(self.cfg, jnp.asarray(board)))

    def getScore(self, board, player) -> int:
        return int(E.get_score(self.cfg, jnp.asarray(board), player))

    def getRound(self, board) -> int:
        return int(E.get_round(self.cfg, jnp.asarray(board)))

    def getCanonicalForm(self, board, player) -> np.ndarray:
        if player == 0:
            return np.asarray(board)
        return np.asarray(E.swap_players_jit(self.cfg, jnp.asarray(board), player))

    def getSymmetries(self, board, pi, valid_actions):
        """Reference returns an explicit expansion (SplendorLogicNumba.py:
        349-395); we return 8 random-symmetry draws of the same group."""
        fn = SYM.batched_random_symmetry(self.cfg)
        n = 8
        boards = jnp.tile(jnp.asarray(board)[None], (n, 1, 1))
        pis = jnp.tile(jnp.asarray(pi, jnp.float32)[None], (n, 1))
        vas = jnp.tile(jnp.asarray(valid_actions, bool)[None], (n, 1))
        b, p, v = fn(self._next_key(), boards, pis, vas)
        return list(zip(np.asarray(b), np.asarray(p), np.asarray(v)))

    def stringRepresentation(self, board) -> bytes:
        return np.asarray(board).tobytes()

    def getNumberOfPlayers(self) -> int:
        return self.num_players

    def moveToString(self, move, current_player=0) -> str:
        return S.move_to_str(int(move))

    def printBoard(self, board) -> None:
        from .splendor import render
        render.print_board(self.cfg, np.asarray(board))

    # reference extras (SplendorGame.py:82-86)
    def disableReserve(self):
        self.cfg = E.SplendorConfig(**{**self.cfg.__dict__, "enable_reserve": False})

    def enableReserve(self):
        self.cfg = E.SplendorConfig(**{**self.cfg.__dict__, "enable_reserve": True})
