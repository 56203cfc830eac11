"""Random-game parity: JAX env vs the independent numpy oracle.

Both consume the same injected uniforms, so every state transition (including
hidden-deck chance draws) must match bit-for-bit — the BASELINE config-1 gate
("exact state/return parity under fixed seed")."""

import numpy as np
import pytest

from alphazero_tpu.games.splendor import env as E
from oracle.splendor_oracle import OracleBoard


def _play_parity_game(num_players, seed, max_steps=400, deterministic=False,
                      token_limit=10):
    rng = np.random.default_rng(seed)
    cfg = E.SplendorConfig(num_players=num_players, token_limit=token_limit)
    u24 = rng.random(24).astype(np.float32)
    nobles = rng.choice(10, size=cfg.num_nobles, replace=False)

    state = np.asarray(E.init_with_uniforms(cfg, u24, nobles))
    ob = OracleBoard(num_players, token_limit=token_limit)
    ob.init_with(u24, nobles)
    np.testing.assert_array_equal(state, ob.state, err_msg="init mismatch")

    player = 0
    for step_i in range(max_steps):
        vj = np.asarray(E.valid_moves_jit(cfg, state, player))
        vo = ob.valid_moves(player)
        np.testing.assert_array_equal(
            vj, vo, err_msg=f"valid mismatch at step {step_i}\n"
                            f"jax={np.flatnonzero(vj)}\noracle={np.flatnonzero(vo)}")
        assert vj.any(), "no valid action (pass must be a fallback)"

        action = rng.choice(np.flatnonzero(vo))
        u = rng.random(2).astype(np.float32)
        state2, nxt = E.step_jit(cfg, state, action, player, u, deterministic)
        nxt_o = ob.make_move(action, player, deterministic, u[0], u[1])
        state2 = np.asarray(state2)
        np.testing.assert_array_equal(
            state2, ob.state,
            err_msg=f"state mismatch after action {action} at step {step_i}")
        assert int(nxt) == nxt_o

        ej = np.asarray(E.check_end_game_jit(cfg, state2))
        eo = ob.check_end_game()
        np.testing.assert_allclose(ej, eo, err_msg=f"end mismatch step {step_i}")

        state, player = state2, int(nxt)
        if ej.any():
            return step_i + 1
    return max_steps


@pytest.mark.parametrize("seed", range(6))
def test_random_game_parity_2p(seed):
    steps = _play_parity_game(2, seed)
    assert steps > 10


@pytest.mark.parametrize("seed", range(3))
def test_random_game_parity_3p(seed):
    _play_parity_game(3, 100 + seed)


@pytest.mark.parametrize("seed", range(2))
def test_random_game_parity_4p(seed):
    _play_parity_game(4, 200 + seed)


def test_random_game_parity_deterministic_mode():
    # deterministic=True collapses chance: slots empty out, still must agree
    _play_parity_game(2, 42, max_steps=60, deterministic=True)


def test_handicap_token_limit_parity():
    _play_parity_game(2, 7, token_limit=8)


def test_swap_players_parity():
    rng = np.random.default_rng(3)
    for n in (2, 3, 4):
        cfg = E.SplendorConfig(num_players=n)
        u24 = rng.random(24).astype(np.float32)
        nobles = rng.choice(10, size=cfg.num_nobles, replace=False)
        state = np.asarray(E.init_with_uniforms(cfg, u24, nobles))
        ob = OracleBoard(n)
        ob.init_with(u24, nobles)
        # play a few random moves so player areas differ
        player = 0
        for _ in range(8):
            v = ob.valid_moves(player)
            a = rng.choice(np.flatnonzero(v))
            u = rng.random(2).astype(np.float32)
            state, nxt = E.step_jit(cfg, state, a, player, u, False)
            ob.make_move(a, player, False, u[0], u[1])
            state = np.asarray(state)
            player = int(nxt)
        for k in range(n):
            sj = np.asarray(E.swap_players_jit(cfg, state, k))
            ob2 = OracleBoard(n)
            ob2.state = ob.state.copy()
            ob2.swap_players(k)
            np.testing.assert_array_equal(sj, ob2.state, err_msg=f"n={n} k={k}")
