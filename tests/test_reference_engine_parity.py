"""BASELINE config 1: trajectory parity vs the LITERAL reference engine.

Fixed-seed random games drive the JAX env and the actual
``SplendorLogicNumba.Board`` (loaded in place, numba stubbed, WIP repairs
documented in reference_engine_harness.py) with the same injected uniforms.
Every step asserts bit-for-bit state equality, identical valid-move masks,
and identical end-game returns, for 2/3/4 players and deterministic
(chance-collapsed) mode — the literal-oracle gate SURVEY §7 stage 1
prescribed on top of the independent-oracle suite (test_env_parity.py)."""

import numpy as np
import pytest

from alphazero_tpu.games.splendor import env as E
from tests import reference_engine_harness as H

pytestmark = pytest.mark.skipif(not H.reference_available(),
                                reason="reference snapshot not mounted")


@pytest.fixture(scope="module")
def ref_mod():
    return H.load_reference_engine()


def _play_vs_reference(ref_mod, num_players, seed, max_steps=400,
                       deterministic=False):
    rng = np.random.default_rng(seed)
    cfg = E.SplendorConfig(num_players=num_players)
    u24 = rng.random(24)
    nobles = rng.choice(10, size=cfg.num_nobles, replace=False)

    state = np.asarray(E.init_with_uniforms(cfg, u24.astype(np.float32),
                                            nobles))
    board = H.make_reference_board(ref_mod, num_players, nobles, u24)
    np.testing.assert_array_equal(state, board.get_state(),
                                  err_msg="init state mismatch")

    player = 0
    for step_i in range(max_steps):
        vj = np.asarray(E.valid_moves_jit(cfg, state, player))
        vr = np.asarray(board.valid_moves(player), bool)
        np.testing.assert_array_equal(
            vj, vr, err_msg=f"valid mismatch step {step_i}\n"
                            f"jax={np.flatnonzero(vj)}\n"
                            f"ref={np.flatnonzero(vr)}")

        action = rng.choice(np.flatnonzero(vr))
        u = rng.random(2)
        ref_mod._uniform_fifo.clear()
        ref_mod._uniform_fifo.extend(u)
        nxt_r = board.make_move(int(action), int(player), deterministic)
        ref_mod._uniform_fifo.clear()

        state2, nxt = E.step_jit(cfg, state, int(action), player,
                                 u.astype(np.float32), deterministic)
        state2 = np.asarray(state2)
        np.testing.assert_array_equal(
            state2, board.get_state(),
            err_msg=f"state mismatch after action {action} step {step_i}")
        assert int(nxt) == int(nxt_r)

        ej = np.asarray(E.check_end_game_jit(cfg, state2))
        er = np.asarray(board.check_end_game(), np.float32)
        np.testing.assert_allclose(ej, er, atol=1e-6,
                                   err_msg=f"end mismatch step {step_i}")

        state, player = state2, int(nxt)
        if ej.any():
            return step_i + 1
    return max_steps


@pytest.mark.parametrize("seed", range(4))
def test_literal_reference_parity_2p(ref_mod, seed):
    assert _play_vs_reference(ref_mod, 2, seed) > 10


@pytest.mark.parametrize("seed", range(2))
def test_literal_reference_parity_3p(ref_mod, seed):
    _play_vs_reference(ref_mod, 3, 300 + seed)


@pytest.mark.filterwarnings(
    # long 4P random games wrap the reference's own int8 round counter
    # (make_move :288) — the env/oracle emulate exactly this wrap
    "ignore:overflow encountered in scalar add:RuntimeWarning")
@pytest.mark.parametrize("seed", range(2))
def test_literal_reference_parity_4p(ref_mod, seed):
    _play_vs_reference(ref_mod, 4, 400 + seed)


def test_literal_reference_parity_deterministic(ref_mod):
    _play_vs_reference(ref_mod, 2, 77, max_steps=60, deterministic=True)


def test_reference_scores_and_round_match(ref_mod):
    """Spot-check the auxiliary accessors against the env on a played-out
    position (get_score / get_round, SplendorLogicNumba.py:217-220,396)."""
    rng = np.random.default_rng(5)
    cfg = E.SplendorConfig(num_players=2)
    u24 = rng.random(24)
    nobles = rng.choice(10, size=cfg.num_nobles, replace=False)
    state = np.asarray(E.init_with_uniforms(cfg, u24.astype(np.float32),
                                            nobles))
    board = H.make_reference_board(ref_mod, 2, nobles, u24)
    player = 0
    for _ in range(40):
        vr = np.asarray(board.valid_moves(player), bool)
        action = rng.choice(np.flatnonzero(vr))
        u = rng.random(2)
        ref_mod._uniform_fifo.extend(u)
        nxt = board.make_move(int(action), int(player), False)
        ref_mod._uniform_fifo.clear()
        state = np.asarray(E.step_jit(cfg, state, int(action), player,
                                      u.astype(np.float32), False)[0])
        player = int(nxt)
    scores = np.asarray(E.all_scores(cfg, state))
    for p in range(2):
        assert int(scores[p]) == int(board.get_score(p))
    assert int(np.asarray(E.get_round(cfg, state))) == int(board.get_round())
