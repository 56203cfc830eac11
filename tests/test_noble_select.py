"""Noble-select feature (actions 405-407, enable_noble_select=True).

Completes the reference's unfinished `_valid_select_noble`
(SplendorLogicNumba.py:682-683): >=2 simultaneously eligible nobles give the
mover a pending choice turn instead of auto-awarding all of them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.games.splendor import tables as T

CFG = E.SplendorConfig(num_players=2, enable_noble_select=True)
CFG_OFF = E.SplendorConfig(num_players=2)


def _two_noble_state(cfg):
    """Player 0 already meets nobles 0 and 1 (not 2) and can buy card 0."""
    uniforms = jnp.linspace(0.05, 0.95, 24)
    state = E.init_with_uniforms(cfg, uniforms, jnp.array([0, 1, 2]))
    s = np.asarray(state).copy()
    n0 = np.asarray(T.ALL_NOBLES[0][:5], np.int64)
    n1 = np.asarray(T.ALL_NOBLES[1][:5], np.int64)
    s[cfg.row_pcards, :5] = np.maximum(n0, n1)        # meets nobles 0+1
    cost = s[1, :5].astype(np.int64)                  # visible card 0 cost
    s[cfg.row_pgems, :5] = cost
    return jnp.asarray(s, jnp.int8)


def test_pending_choice_and_selection():
    state = _two_noble_state(CFG)
    buy = 0
    assert bool(E.valid_moves(CFG, state, 0)[buy])
    s1, nxt = E.step(CFG, state, buy, 0, jnp.zeros(2), True)

    # mover keeps the turn; both nobles flagged, none awarded yet
    assert int(nxt) == 0
    flags = np.asarray(s1)[CFG.row_nobles:CFG.row_nobles + 3, 5]
    np.testing.assert_array_equal(flags, [1, 1, 0])
    pnobles = np.asarray(s1)[CFG.row_pnobles:CFG.row_pnobles + 3]
    assert pnobles.sum() == 0
    # the round counter did not tick for the pending half-move
    assert int(np.asarray(s1)[0, 6]) == int(np.asarray(state)[0, 6])

    # only the two select actions are legal
    v = np.asarray(E.valid_moves(CFG, s1, 0))
    assert v[T.A_NOBLE] and v[T.A_NOBLE + 1]
    assert v.sum() == 2 and not v[T.A_PASS]

    # select the SECOND eligible noble (slot 1)
    s2, nxt2 = E.step(CFG, s1, T.A_NOBLE + 1, 0, jnp.zeros(2), True)
    assert int(nxt2) == 1
    a = np.asarray(s2)
    np.testing.assert_array_equal(
        a[CFG.row_pnobles + 1, :5], np.asarray(T.ALL_NOBLES[1][:5]))
    assert a[CFG.row_pnobles + 1, 6] == 3                 # noble points
    assert a[CFG.row_nobles + 1].sum() == 0               # taken off board
    assert a[CFG.row_nobles, :5].sum() > 0                # noble 0 remains
    assert a[CFG.row_nobles:CFG.row_nobles + 3, 5].sum() == 0   # flags clear
    assert int(E.get_score(CFG, s2, 0)) >= 3

    # the remaining eligible noble auto-awards on player 0's next gain
    sc = np.asarray(s2).copy()
    cost = sc[1, :5].astype(np.int64)
    sc[CFG.row_pgems, :5] = np.maximum(cost, 0)
    s3, _ = E.step(CFG, jnp.asarray(sc, jnp.int8), 0, 0, jnp.zeros(2), True)
    a3 = np.asarray(s3)
    np.testing.assert_array_equal(
        a3[CFG.row_pnobles, :5], np.asarray(T.ALL_NOBLES[0][:5]))


def test_single_noble_still_auto_awards():
    state = _two_noble_state(CFG)
    s = np.asarray(state).copy()
    s[CFG.row_pcards, :5] = np.asarray(T.ALL_NOBLES[0][:5])   # noble 0 only
    s1, nxt = E.step(CFG, jnp.asarray(s, jnp.int8), 0, 0, jnp.zeros(2), True)
    a = np.asarray(s1)
    assert int(nxt) == 1
    np.testing.assert_array_equal(a[CFG.row_pnobles, :5],
                                  np.asarray(T.ALL_NOBLES[0][:5]))
    assert a[CFG.row_nobles:CFG.row_nobles + 3, 5].sum() == 0


def test_flag_off_awards_all_at_once():
    state = _two_noble_state(CFG_OFF)
    s1, nxt = E.step(CFG_OFF, state, 0, 0, jnp.zeros(2), True)
    a = np.asarray(s1)
    assert int(nxt) == 1
    np.testing.assert_array_equal(a[CFG_OFF.row_pnobles, :5],
                                  np.asarray(T.ALL_NOBLES[0][:5]))
    np.testing.assert_array_equal(a[CFG_OFF.row_pnobles + 1, :5],
                                  np.asarray(T.ALL_NOBLES[1][:5]))


def test_search_backup_through_kept_turn():
    """Value backup must follow per-node seat rotation, not tree depth.

    Root: player 0 can buy card 0, which triggers a PENDING noble choice —
    the buy edge leads to a child where the same player moves again.  With a
    score-diff evaluator the buy is clearly good for the mover; a depth-based
    seat roll (one seat per edge) would flip its backed-up value and the
    search would avoid it."""
    from alphazero_tpu.games.splendor import adapter as A_
    from alphazero_tpu.search import mcts as M

    def eval_fn(params, states_f32, valids):
        probs = valids.astype(jnp.float32)
        probs = probs / jnp.maximum(probs.sum(-1, keepdims=True), 1e-9)

        def val(s):
            si = s.astype(jnp.int8)
            d = (E.get_score(CFG, si, 0) - E.get_score(CFG, si, 1)) / 15.0
            v0 = jnp.clip(d.astype(jnp.float32), -1.0, 1.0)
            return jnp.stack([v0, -v0])

        return probs, jax.vmap(val)(states_f32)

    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=48), 2, eval_fn,
        A_.make_search_step_fn(CFG), A_.make_valid_fn(CFG)))
    root = _two_noble_state(CFG)
    res = search(None, root[None], jax.random.PRNGKey(0))
    counts = np.asarray(res.raw_counts)[0]
    assert counts.sum() == 48
    # a buy dominates (any buy triggers the pending-noble kept turn; a
    # depth-rolled backup would make every buy look losing and the search
    # would sit on zero-value gem moves instead)
    assert int(counts.argmax()) < 12, counts.nonzero()
    assert float(np.asarray(res.q)[0, 0]) > 0.05


def test_noble_select_under_jit_and_search():
    """The flagged env still jits and a small search runs over it."""
    from alphazero_tpu.games.splendor import adapter as A_
    from alphazero_tpu.search import mcts as M

    eval_fn = A_.make_uniform_eval_fn(CFG)
    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=8), 2, eval_fn,
        A_.make_search_step_fn(CFG), A_.make_valid_fn(CFG)))
    roots = jax.vmap(lambda k: E.initial_state(CFG, k))(
        jax.random.split(jax.random.PRNGKey(0), 4))
    res = search(None, roots, jax.random.PRNGKey(1))
    counts = np.asarray(res.raw_counts)
    assert counts.sum() > 0
