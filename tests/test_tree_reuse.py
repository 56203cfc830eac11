"""Cross-move tree reuse: reroot compaction invariants and carried-search
behavior (reference MCTS.py:27-36,79-85 keeps its dict tree across moves)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.games.splendor import adapter as A
from alphazero_tpu.search import mcts as M


@pytest.fixture(scope="module")
def setup():
    cfg = E.SplendorConfig(num_players=2)
    eval_fn = A.make_uniform_eval_fn(cfg)
    step_fn = A.make_search_step_fn(cfg)
    valid_fn = A.make_valid_fn(cfg)
    rs = M.build_reusing_search(M.MCTSConfig(num_sims=40), 2,
                                eval_fn, step_fn, valid_fn)
    return cfg, step_fn, rs


def _roots(cfg, B, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    return jax.jit(jax.vmap(lambda k: E.initial_state(cfg, k)))(keys)


def test_reroot_carries_subtree(setup):
    cfg, step_fn, rs = setup
    B = 3
    roots = _roots(cfg, B)
    tree, n0 = jax.jit(rs.init_tree)(roots)
    res, tree, n1 = jax.jit(rs.run)(None, tree, n0, jax.random.PRNGKey(1))
    assert (np.asarray(n1) == 41).all()

    actions = jnp.argmax(res.raw_counts, axis=-1).astype(jnp.int32)
    # deterministic in-tree step => reuse must validate
    next_states = jax.vmap(lambda s, a: step_fn(s, a)[0])(roots, actions)
    old_stats = np.asarray(tree.stats)
    A = old_stats.shape[-1] - 2               # packed layout: node cols A, A+1
    c_star = np.abs(np.take_along_axis(old_stats[:, 0, 1, :A],
                                       np.asarray(actions)[:, None], 1)[:, 0])\
        .astype(int)                           # abs drops the sign-packed flag
    assert (c_star > 0).all()

    tree2, n2 = jax.jit(rs.reroot)(tree, actions, next_states)
    n2 = np.asarray(n2)
    assert (n2 >= 1).all()
    # the most-visited root edge's child must carry a real subtree
    assert (n2 > 1).all()

    st2 = np.asarray(tree2.states)
    np.testing.assert_array_equal(st2[:, 0], np.asarray(next_states))
    stats2 = np.asarray(tree2.stats)
    par2 = np.asarray(tree2.parent)
    for b in range(B):
        c = c_star[b]
        # new root keeps the played child's node scalars and edge stats
        # (node cols: Ns at [_EN, A], value sum at [_EW, A])
        assert stats2[b, 0, 2, A] == old_stats[b, c, 2, A]
        assert stats2[b, 0, 3, A] == old_stats[b, c, 3, A]
        en_old = old_stats[b, c, 2, :A]
        # edge visit rows are carried verbatim
        np.testing.assert_array_equal(stats2[b, 0, 2, :A], en_old)
        # structural invariants over the compacted prefix
        k = n2[b]
        assert par2[b, 0] == 0
        for j in range(1, k):
            assert 0 <= par2[b, j] < j          # ancestors precede children
        child2 = np.floor(stats2[b, :k, 1, :A]).astype(int)
        live_children = child2[child2 > 0]
        assert (live_children < k).all()
        # each installed child points back at its parent
        for m in range(k):
            for a_, ch in enumerate(child2[m]):
                if ch > 0:
                    assert par2[b, ch] == m
        # rows beyond the kept prefix are blank (prior lane -1 on the
        # action columns, node columns zeroed)
        assert (stats2[b, k:, 0, :A] == -1.0).all()
        assert (stats2[b, k:, :, A:] == 0).all()


def test_search_from_carried_tree_accumulates(setup):
    cfg, step_fn, rs = setup
    B = 2
    roots = _roots(cfg, B, seed=5)
    tree, n0 = jax.jit(rs.init_tree)(roots)
    res, tree, n1 = jax.jit(rs.run)(None, tree, n0, jax.random.PRNGKey(1))
    actions = jnp.argmax(res.raw_counts, axis=-1).astype(jnp.int32)
    next_states = jax.vmap(lambda s, a: step_fn(s, a)[0])(roots, actions)
    tree2, n2 = jax.jit(rs.reroot)(tree, actions, next_states)

    A = np.asarray(tree2.stats).shape[-1] - 2
    carried = np.asarray(tree2.stats)[:, 0, 2, A]      # root Ns (node col)
    res2, tree3, n3 = jax.jit(rs.run)(None, tree2, n2, jax.random.PRNGKey(2))
    counts = np.asarray(res2.raw_counts)
    # counts include carried visits (reference keeps Nsa across moves)
    np.testing.assert_array_equal(counts.sum(1), carried + 40)
    assert (np.asarray(n3) == np.asarray(n2) + 40).all()
    q = np.asarray(res2.q)
    np.testing.assert_allclose(q[:, 0], -q[:, 1], atol=1e-6)


def test_reroot_invalidates_on_state_mismatch(setup):
    cfg, step_fn, rs = setup
    B = 2
    roots = _roots(cfg, B, seed=9)
    tree, n0 = jax.jit(rs.init_tree)(roots)
    res, tree, n1 = jax.jit(rs.run)(None, tree, n0, jax.random.PRNGKey(1))
    actions = jnp.argmax(res.raw_counts, axis=-1).astype(jnp.int32)
    # a different real next state (chance draw diverged) must void reuse
    other = _roots(cfg, B, seed=10)
    tree2, n2 = jax.jit(rs.reroot)(tree, actions, other)
    assert (np.asarray(n2) == 1).all()
    np.testing.assert_array_equal(np.asarray(tree2.states)[:, 0],
                                  np.asarray(other))
    stats2 = np.asarray(tree2.stats)
    A = stats2.shape[-1] - 2
    assert (stats2[:, 0, :, A:] == 0).all()            # node scalars cleared
    # a fresh search from the voided tree behaves like a cold search
    res2, _, _ = jax.jit(rs.run)(None, tree2, n2, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(res2.raw_counts).sum(1), 40)


def test_selfplay_engine_with_reuse_produces_clean_targets():
    """Engine-level reuse path (tree carried through the fused chunk,
    full/fast partition, reroot between moves): games complete and every
    stored policy target sits on valid actions of its stored state."""
    from alphazero_tpu.train import selfplay as SP

    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg, width=64)
    from alphazero_tpu.models import splendor_net as N
    params, bs = N.init_params(net_cfg, jax.random.PRNGKey(0))
    cfg = SP.SelfPlayConfig(batch_size=8, num_sims=16, ratio_full=4,
                            prob_full=0.5, temp_threshold=6,
                            forced_playouts=True, tree_reuse=True)
    eng = SP.SelfPlayEngine(env_cfg, A.make_eval_fn(net_cfg), cfg)
    it, stats = eng.run_games((params, bs), jax.random.PRNGKey(1),
                              np.random.default_rng(0))
    assert stats["games"] == 8 and stats["examples"] > 100
    pi = np.asarray(it.pi, np.float32)
    valids = np.asarray(it.valids)
    assert float((pi * ~valids).sum()) < 1e-4
    assert np.allclose(pi.sum(1), 1.0, atol=1e-2)


def test_reusing_arena_agent_plays_full_games(setup):
    """ReusingAgent in the BatchArena: one tree follows the whole game
    (rerooted on every move incl. the opponent's), games complete, and the
    carried tree actually hits (n > 1 on at least one board after the
    opening exchange) — the batched analog of the reference pit player's
    persistent MCTS (MCTS.py:27-36)."""
    from alphazero_tpu.eval import arena as AR

    cfg, step_fn, rs = setup
    arena = AR.BatchArena(cfg, 3)
    reuse_agent = AR.ReusingAgent(rs, None)
    fresh_search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=40), 2,
        A.make_uniform_eval_fn(cfg), step_fn, A.make_valid_fn(cfg)))
    fresh_agent = AR.make_search_agent(fresh_search, None)
    res = arena.play([reuse_agent, fresh_agent], jax.random.PRNGKey(5))
    assert res.outcomes.shape == (3, 2)
    assert (np.abs(res.outcomes).sum(1) > 0).all()     # every game decided
    # the agent's tree survived the game and carried nodes at least once
    assert reuse_agent.tree is not None
    assert int(np.asarray(reuse_agent.n).max()) >= 1
