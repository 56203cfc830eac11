"""Batched MCTS behavior tests (uniform-prior evaluator -> no net needed)."""

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
    return cfg, eval_fn, step_fn, valid_fn


def _roots(cfg, B, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    return jax.jit(jax.vmap(lambda k: E.initial_state(cfg, k)))(keys)


def test_counts_sum_and_validity(setup):
    cfg, eval_fn, step_fn, valid_fn = setup
    mcfg = M.MCTSConfig(num_sims=40)
    search = jax.jit(M.build_search(mcfg, 2, eval_fn, step_fn, valid_fn))
    B = 4
    roots = _roots(cfg, B)
    res = search(None, roots, jax.random.PRNGKey(1))
    counts = np.asarray(res.raw_counts)
    valids = np.asarray(jax.vmap(valid_fn)(roots))
    assert counts.shape == (B, 409)
    # every sim backs up exactly one root edge visit
    np.testing.assert_array_equal(counts.sum(1), 40)
    assert (counts[~valids] == 0).all()
    # q in [-1, 1], antisymmetric for 2 players
    q = np.asarray(res.q)
    assert (np.abs(q) <= 1.0 + 1e-6).all()
    np.testing.assert_allclose(q[:, 0], -q[:, 1], atol=1e-6)


def test_mcts_finds_winning_buy(setup):
    """Build a state where player 0 can buy a card reaching 15 points:
    search with a know-nothing evaluator must still prefer that buy."""
    cfg, eval_fn, step_fn, valid_fn = setup
    rng = np.random.default_rng(0)
    u24 = rng.random(24).astype(np.float32)
    nobles = rng.choice(10, size=3, replace=False)
    st = np.array(E.init_with_uniforms(cfg, u24, nobles))
    # give player 0: 14 card-points and enough card discounts to buy anything
    st[cfg.row_pcards + 0, 6] = 14
    st[cfg.row_pcards + 0, :5] = 7
    # clear board nobles so the discount pile doesn't auto-win via nobles
    st[cfg.row_nobles:cfg.row_nobles + cfg.num_nobles] = 0
    # round counter: player 0 to move, end checked when round % 2 == 0
    st[0, 6] = 10

    valids = np.asarray(E.valid_moves_jit(cfg, jnp.asarray(st), 0))
    buys = np.flatnonzero(valids[:12])
    # pick buys of cards that have >= 1 point
    pts = st[2:26:2, 6]
    winning = [a for a in buys if pts[a] >= 1]
    assert winning, "fixture must offer a winning buy"

    mcfg = M.MCTSConfig(num_sims=200)
    search = jax.jit(M.build_search(mcfg, 2, eval_fn, step_fn, valid_fn))
    res = search(None, jnp.asarray(st)[None], jax.random.PRNGKey(0))
    best = int(np.asarray(res.raw_counts)[0].argmax())
    assert best in winning, (best, winning)
    # root q should be clearly positive for the player to move
    assert float(np.asarray(res.q)[0, 0]) > 0.3


def test_dirichlet_noise_changes_distribution(setup):
    cfg, eval_fn, step_fn, valid_fn = setup
    roots = _roots(cfg, 2, seed=3)
    s_plain = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=30), 2, eval_fn, step_fn, valid_fn))
    s_noise = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=30, add_noise=True, dirichlet_alpha=0.2,
                     prior_temp=1.25), 2, eval_fn, step_fn, valid_fn))
    r1 = s_plain(None, roots, jax.random.PRNGKey(0))
    r2 = s_noise(None, roots, jax.random.PRNGKey(0))
    assert not np.array_equal(np.asarray(r1.root_prior),
                              np.asarray(r2.root_prior))


def test_forced_playouts_pruning(setup):
    cfg, eval_fn, step_fn, valid_fn = setup
    roots = _roots(cfg, 2, seed=4)
    s_forced = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=60, forced_playouts=True), 2,
        eval_fn, step_fn, valid_fn))
    res = s_forced(None, roots, jax.random.PRNGKey(0))
    counts = np.asarray(res.counts)
    raw = np.asarray(res.raw_counts)
    # pruned counts are never larger and keep the argmax
    assert (counts <= raw + 1e-6).all()
    for b in range(2):
        assert counts[b].argmax() == raw[b].argmax()
    assert (counts.sum(1) > 0).all()


def test_depth_cap_preserves_invariants(setup):
    """max_depth caps the lockstep descent; every sim still backs up exactly
    one root-edge visit and Q stays antisymmetric."""
    cfg, eval_fn, step_fn, valid_fn = setup
    roots = _roots(cfg, 3, seed=7)
    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=40, max_depth=4), 2,
        eval_fn, step_fn, valid_fn))
    res = search(None, roots, jax.random.PRNGKey(1))
    counts = np.asarray(res.raw_counts)
    np.testing.assert_array_equal(counts.sum(1), 40)
    valids = np.asarray(jax.vmap(valid_fn)(roots))
    assert (counts[~valids] == 0).all()
    q = np.asarray(res.q)
    np.testing.assert_allclose(q[:, 0], -q[:, 1], atol=1e-6)


def test_terminal_backup(setup):
    """From a state 1 move away from a win, repeated visits of the terminal
    child keep backing up +1 for the mover."""
    cfg, eval_fn, step_fn, valid_fn = setup
    rng = np.random.default_rng(1)
    u24 = rng.random(24).astype(np.float32)
    st = np.array(E.init_with_uniforms(cfg, u24, rng.choice(10, 3, False)))
    st[cfg.row_pcards + 0, 6] = 15      # player 0 already at 15
    st[0, 6] = 11                        # player 1 to move; round becomes even
    # canonicalize for seat 1 (player 1 is 'player 0' in canonical frame)
    stc = np.asarray(E.swap_players_jit(cfg, jnp.asarray(st), 1))
    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=50), 2, eval_fn, step_fn, valid_fn))
    res = search(None, jnp.asarray(stc)[None], jax.random.PRNGKey(0))
    # opponent (absolute player 0) wins regardless -> q for mover ~ -1
    assert float(np.asarray(res.q)[0, 0]) < -0.9


def test_descent_unroll_is_exact(setup):
    """descent_unroll is a pure loop restructure: results must be
    bit-identical to the single-level descent at every unroll factor,
    including with a depth cap (where the unrolled scratch columns must
    not clobber the deepest real path record)."""
    cfg, eval_fn, step_fn, valid_fn = setup
    roots = _roots(cfg, 6, seed=4)
    for extra in ({}, {"max_depth": 4}, {"forced_playouts": True}):
        base = jax.jit(M.build_search(
            M.MCTSConfig(num_sims=24, descent_unroll=1, **extra),
            2, eval_fn, step_fn, valid_fn))
        res1 = base(None, roots, jax.random.PRNGKey(7))
        for u in (2, 3):
            s_u = jax.jit(M.build_search(
                M.MCTSConfig(num_sims=24, descent_unroll=u, **extra),
                2, eval_fn, step_fn, valid_fn))
            res_u = s_u(None, roots, jax.random.PRNGKey(7))
            np.testing.assert_array_equal(np.asarray(res1.raw_counts),
                                          np.asarray(res_u.raw_counts))
            np.testing.assert_allclose(np.asarray(res1.q),
                                       np.asarray(res_u.q), atol=1e-6)


def test_edge_visits_only_on_valid_actions_all_nodes(setup):
    """Whole-tree invariant behind the (fixed) class-2 TPU corruption: every
    expanded node's edge-visit support must lie within the valid-move mask
    of its own stored state.  The 4-D backup einsum violated this on
    XLA:TPU (phantom visits on rows the path never touched) — the per-lane
    formulation is exact; scripts/reuse_repro.py re-checks on hardware."""
    cfg, eval_fn, step_fn, valid_fn = setup
    mcfg = M.MCTSConfig(num_sims=48, forced_playouts=True, add_noise=True,
                        dirichlet_alpha=0.2, prior_temp=1.25, max_depth=32)
    rs = M.build_reusing_search(mcfg, 2, eval_fn, step_fn, valid_fn,
                                keep_cap=48)
    roots = _roots(cfg, 4, seed=11)

    @jax.jit
    def run_once(roots, key):
        tree, n = rs.init_tree(roots)
        res, tree, n = rs.run(None, tree, n, key)
        return tree

    tree = run_once(roots, jax.random.PRNGKey(3))
    stats = np.asarray(tree.stats)
    states = np.asarray(tree.states)
    vm_all = np.asarray(jax.jit(jax.vmap(jax.vmap(valid_fn)))(
        jnp.asarray(states)))
    A = 409
    for b in range(stats.shape[0]):
        en = stats[b, :, 2, :A]
        pv = stats[b, :, 0, :A]
        for m in np.flatnonzero((pv >= 0).any(1)):
            bad = (en[m] > 0) & ~vm_all[b, m]
            assert not bad.any(), (
                f"board {b} node {m}: edge visits on invalid actions "
                f"{np.flatnonzero(bad)[:8]}")
