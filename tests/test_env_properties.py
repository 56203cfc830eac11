"""Property / invariant tests for the JAX Splendor env (conservation laws,
mask soundness, batching)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.games.splendor import tables as T


def _random_rollout(cfg, seed, steps=120, deterministic=False):
    rng = np.random.default_rng(seed)
    u24 = rng.random(24).astype(np.float32)
    nobles = rng.choice(10, size=cfg.num_nobles, replace=False)
    state = E.init_with_uniforms(cfg, u24, nobles)
    player = 0
    trace = [np.asarray(state)]
    for _ in range(steps):
        v = np.asarray(E.valid_moves_jit(cfg, state, player))
        if not v.any():
            break
        a = rng.choice(np.flatnonzero(v))
        u = rng.random(2).astype(np.float32)
        state, player = E.step_jit(cfg, state, a, player, u, deterministic)
        player = int(player)
        trace.append(np.asarray(state))
        if np.asarray(E.check_end_game_jit(cfg, state)).any():
            break
    return trace


@pytest.mark.parametrize("n", [2, 3, 4])
def test_gem_conservation(n):
    cfg = E.SplendorConfig(num_players=n)
    for seed in range(3):
        for st in _random_rollout(cfg, seed):
            bank = st[0, :6].astype(np.int64)
            pg = st[cfg.row_pgems:cfg.row_pgems + n, :6].astype(np.int64)
            total = bank + pg.sum(0)
            assert (total[:5] == cfg.num_gems_in_play).all(), total
            assert total[5] == 5
            assert (bank >= 0).all()
            assert (pg >= 0).all()


@pytest.mark.parametrize("n", [2, 3])
def test_card_conservation(n):
    """All 90 cards are accounted for: decks + visible + reserved + bought."""
    cfg = E.SplendorConfig(num_players=n)
    for st in _random_rollout(cfg, 11, steps=200):
        decks = st[cfg.row_decks:cfg.row_decks + 6:2, :5].astype(np.int64).sum()
        visible = (st[1:25:2, :5].astype(np.int64).sum(1) > 0).sum() + \
                  (st[2:25:2, :5].astype(np.int64).sum(1) > 0).sum()
        # visible counts each non-empty slot twice (cost row may be all-zero
        # for free cards? no Splendor card is free) -> use gain rows only
        visible = (st[2:25:2, :5].astype(np.int64).sum(1) > 0).sum()
        rsv = st[cfg.row_prsv:cfg.row_prsv + 6 * n]
        reserved = (rsv[1::2, :5].astype(np.int64).sum(1) > 0).sum()
        bought = st[cfg.row_pcards:cfg.row_pcards + n, :5].astype(np.int64).sum()
        assert decks + visible + reserved + bought == 90


def test_token_limit_never_exceeded():
    cfg = E.SplendorConfig(num_players=2)
    for seed in range(4):
        for st in _random_rollout(cfg, 40 + seed):
            pg = st[cfg.row_pgems:cfg.row_pgems + 2, :6].astype(np.int64)
            # reserve gold-take may reach limit+? reference allows reserve to
            # exceed only via gold when tokens < limit gate blocks at == limit
            assert (pg.sum(1) <= cfg.token_limit + 1).all()


def test_pass_only_when_nothing_else():
    cfg = E.SplendorConfig(num_players=2)
    st = E.initial_state_jit(cfg, jax.random.PRNGKey(0))
    v = np.asarray(E.valid_moves_jit(cfg, st, 0))
    assert v[:408].any() and not v[408]


def test_initial_state_structure():
    cfg = E.SplendorConfig(num_players=2)
    st = np.asarray(E.initial_state_jit(cfg, jax.random.PRNGKey(1)))
    assert st.shape == (56, 7)
    assert (st[0, :5] == 4).all() and st[0, 5] == 5
    # 12 visible cards present
    assert ((st[2:25:2, :5].sum(1) > 0)).all()
    # deck counts: 8*5-4, 6*5-4, 4*5-4 remaining
    decks = st[25:31:2, :5].astype(np.int64).sum(1)
    np.testing.assert_array_equal(decks, [36, 26, 16])
    # 3 nobles with 3 points each
    nobles = st[31:34]
    assert (nobles[:, 6] == 3).all()


def test_vmapped_batch_step():
    cfg = E.SplendorConfig(num_players=2)
    B = 32
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(lambda k: E.initial_state(cfg, k)))(keys)
    assert states.shape == (B, 56, 7)
    valids = jax.jit(jax.vmap(lambda s: E.valid_moves(cfg, s, 0)))(states)
    assert valids.shape == (B, 409)
    # pick first valid action per board, step all
    actions = jnp.argmax(valids, axis=1)
    u = jax.random.uniform(jax.random.PRNGKey(1), (B, 2))
    step_b = jax.jit(jax.vmap(
        lambda s, a, uu: E.step(cfg, s, a, 0, uu, False)))
    states2, nxt = step_b(states, actions, u)
    assert states2.shape == (B, 56, 7)
    assert (np.asarray(nxt) == 1).all()
    # round counter advanced everywhere
    assert (np.asarray(states2)[:, 0, 6] == 1).all()


def test_deterministic_mode_no_refill():
    """Play take-gem moves until a buy is affordable, then check that a
    deterministic-mode buy leaves the board slot empty (no chance refill)."""
    cfg = E.SplendorConfig(num_players=2)
    st = E.initial_state_jit(cfg, jax.random.PRNGKey(2))
    player = 0
    for _ in range(40):
        v = np.asarray(E.valid_moves_jit(cfg, st, player))
        buys = np.flatnonzero(v[:12])
        if len(buys):
            a = int(buys[0])
            st2, _ = E.step_jit(cfg, st, a, player, jnp.zeros(2), True)
            st2 = np.asarray(st2)
            assert st2[1 + 2 * a:3 + 2 * a].sum() == 0  # slot left empty
            return
        takes = np.flatnonzero(v[30:60]) + 30
        a = int(takes[0]) if len(takes) else int(np.flatnonzero(v)[0])
        st, nxt = E.step_jit(cfg, st, jnp.int32(a), player, jnp.zeros(2),
                             True)
        player = int(np.asarray(nxt))
    pytest.fail("no buy became affordable within 40 moves")
