"""Run the REFERENCE MCTS (/root/reference/MCTS.py) in-place against the repo
oracle as its Game, for search-parity validation (SURVEY §7 stage 3).

Nothing from the reference is copied: its module is imported from the
read-only snapshot with numba stubbed out (the reference's kernels are plain
Python under an identity ``@njit``).  The Game/NNet shims below adapt the
repo's numpy oracle and JAX evaluator to the reference's interfaces
(Game.py:1-162, NeuralNet.py:1-50)."""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np

REF_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.exists(os.path.join(REF_DIR, "MCTS.py"))


def load_reference_mcts():
    """Import /root/reference/MCTS.py with numba stubbed to identity."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]

            def deco(f):
                return f
            return deco

        numba.njit = njit
        sys.modules["numba"] = numba
    spec = importlib.util.spec_from_file_location(
        "reference_mcts", os.path.join(REF_DIR, "MCTS.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class BoardShim:
    """The reference's numba kernel drives Board directly
    (MCTS.py:222-237): copy_state / make_move / swap_players / get_state."""

    def __init__(self, oracle):
        self.o = oracle

    def copy_state(self, state, copy=True):
        self.o.state = np.array(state, dtype=np.int8)

    def make_move(self, a, p, deterministic=True):
        return self.o.make_move(int(a), int(p), deterministic)

    def swap_players(self, k):
        self.o.swap_players(int(k))

    def get_state(self):
        return self.o.state.copy()


class GameShim:
    """Reference Game API over the repo oracle (Game.py methods used by
    MCTS.py:61-136)."""

    def __init__(self, oracle):
        self.board = BoardShim(oracle)
        self.num_players = oracle.n

    def getActionSize(self):
        return 409

    def stringRepresentation(self, board):
        return board.tobytes()

    def getValidMoves(self, board, player):
        self.board.copy_state(board)
        return self.board.o.valid_moves(player).astype(np.uint8)

    def getGameEnded(self, board, player):
        self.board.copy_state(board)
        return self.board.o.check_end_game().astype(np.float64)

    def getRound(self, board):
        return int(np.uint8(board[0, 6]))


class NNetShim:
    """predict(board, valids) -> (pi float64[409], v float64[P]) over the
    repo's jitted evaluator (reference GenericNNetWrapper.predict:141-168)."""

    def __init__(self, eval_fn, bundle):
        import jax
        import jax.numpy as jnp

        def run(s, v):
            p, val = eval_fn(bundle, s.astype(jnp.float32)[None], v[None])
            return p[0], val[0]

        self._run = jax.jit(run)
        self._jnp = jnp

    def predict(self, board, valids):
        p, v = self._run(self._jnp.asarray(board),
                         self._jnp.asarray(valids, bool))
        return (np.asarray(p, np.float64).copy(),
                np.asarray(v, np.float64).copy())


class RefArgs:
    """The dotdict the reference MCTS reads (main.py flag names)."""

    def __init__(self, num_sims, cpuct=1.0, fpu=0.0, prob_fullMCTS=1.0,
                 ratio_fullMCTS=1, forced_playouts=False,
                 temperature=(1.25, 0.8), dirichletAlpha=0.0,
                 no_mem_optim=True):
        self.numMCTSSims = num_sims
        self.cpuct = cpuct
        self.fpu = fpu
        self.prob_fullMCTS = prob_fullMCTS
        self.ratio_fullMCTS = ratio_fullMCTS
        self.forced_playouts = forced_playouts
        self.temperature = list(temperature)
        self.dirichletAlpha = dirichletAlpha
        self.no_mem_optim = no_mem_optim


def reference_visit_counts(ref_mod, oracle, eval_fn, bundle, position,
                           num_sims, cpuct=1.0, fpu=0.0):
    """Run the reference search on one canonical position and return
    (Nsa counts [409], q vector).

    ``num_sims + 1`` reference sims are issued because the reference's first
    sim only expands the root (MCTS.py:124-148), so its root edge visits sum
    to nb_sims - 1; the repo search seeds the root during init and spends
    every sim on an edge."""
    game = GameShim(oracle)
    nnet = NNetShim(eval_fn, bundle)
    args = RefArgs(num_sims + 1, cpuct=cpuct, fpu=fpu)
    mcts = ref_mod.MCTS(game, nnet, args, dirichlet_noise=False)
    probs, q, _ = mcts.getActionProb(position, temp=1, force_full_search=True)
    s = game.stringRepresentation(position)
    counts = np.array(mcts.nodes_data[s][5], np.int64)   # Nsa
    return counts, np.array(q, np.float64)


def random_positions(num, num_players=2, moves=8, seed=0):
    """Canonical positions reached by uniform-random play through the repo
    oracle (independent of the JAX env)."""
    from oracle.splendor_oracle import OracleBoard

    rng = np.random.default_rng(seed)
    out = []
    for g in range(num):
        b = OracleBoard(num_players)
        u24 = rng.random(24, np.float32)
        nobles = rng.choice(10, size=b.num_nobles, replace=False)
        b.init_with(u24, nobles)
        p = 0
        for _ in range(int(rng.integers(1, moves + 1))):
            v = b.valid_moves(p)
            a = int(rng.choice(np.flatnonzero(v)))
            p = b.make_move(a, p, False, float(rng.random()),
                            float(rng.random()))
            if b.check_end_game().any():
                break
        if b.check_end_game().any():
            continue
        b.swap_players(p)        # canonicalize: mover -> seat 0
        out.append(b.state.copy())
    return out
