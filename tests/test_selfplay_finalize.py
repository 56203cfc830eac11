"""Unit tests for self-play example finalization (reference Coach.py:89-100):
winner / score-diff vectors rolled into each example's mover frame and the
per-player surprise vector."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from alphazero_tpu.train import selfplay as SP  # noqa: E402


def test_finalize_rolls_two_player():
    # 3 games; stored examples from seat pl=1's perspective for games 0 and 2
    results = np.array([[1.0, -1.0], [0.0, 0.0], [-1.0, 1.0]], np.float32)
    scores = np.array([[16, 9], [10, 10], [7, 15]], np.float32)
    E_, R, A, P = 2, 4, 5, 2
    boards = np.zeros((E_, R, 7), np.int8)
    pi = np.full((E_, A), 1.0 / A, np.float16)
    valids = np.ones((E_, A), bool)
    q = np.array([[0.5, -0.5], [-0.25, 0.25]], np.float32)
    collected = [(boards, pi, valids, q, 1, np.array([0, 2]))]

    it = SP.finalize_examples(collected, results, scores)
    assert it is not None and len(it) == 2
    # game 0, mover seat 1: absolute result (1,-1) -> mover frame (-1, 1)
    np.testing.assert_array_equal(it.winner[0], [-1.0, 1.0])
    # game 2, mover seat 1: absolute result (-1,1) -> mover frame (1, -1)
    np.testing.assert_array_equal(it.winner[1], [1.0, -1.0])
    # scdiff: game 0 mover=seat1 score 9: (16-9, 9-9) rolled -> (0, 7)
    np.testing.assert_array_equal(it.scdiff[0], [0, 7])
    # game 2 mover=seat1 score 15: (7-15, 0) rolled -> (0, -8)
    np.testing.assert_array_equal(it.scdiff[1], [0, -8])
    # surprise = |q - winner| per player
    np.testing.assert_allclose(np.asarray(it.surprise[0], np.float32),
                               [1.5, 1.5], atol=1e-3)
    np.testing.assert_allclose(np.asarray(it.surprise[1], np.float32),
                               [1.25, 1.25], atol=1e-3)


def test_finalize_rolls_three_player():
    results = np.array([[-1.0, 1.0, -1.0]], np.float32)
    scores = np.array([[9, 16, 11]], np.float32)
    E_, R, A = 1, 4, 5
    boards = np.zeros((E_, R, 7), np.int8)
    pi = np.full((E_, A), 0.2, np.float16)
    valids = np.ones((E_, A), bool)
    q = np.array([[0.2, -0.1, -0.1]], np.float32)
    collected = [(boards, pi, valids, q, 2, np.array([0]))]

    it = SP.finalize_examples(collected, results, scores)
    # mover seat 2: roll(result, -2) = (result[2], result[0], result[1])
    np.testing.assert_array_equal(it.winner[0], [-1.0, -1.0, 1.0])
    # scdiff rel seat2 (score 11): (9-11, 16-11, 0) rolled -2 -> (0, -2, 5)
    np.testing.assert_array_equal(it.scdiff[0], [0, -2, 5])


def test_finalize_empty():
    assert SP.finalize_examples([], np.zeros((1, 2)), np.zeros((1, 2))) is None


def test_run_games_invariants():
    """End-to-end tiny self-play: every stored example's winner vector must
    be a seat-roll of its game's result, scdiff lane 0 (mover vs self) must
    be 0, and surprise must be the per-player |q - winner|."""
    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.games.splendor import adapter as A
    from alphazero_tpu.models import splendor_net as N

    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    params, bs = N.init_params(net_cfg, jax.random.PRNGKey(0))
    eval_fn = A.make_eval_fn(net_cfg)
    cfg = SP.SelfPlayConfig(batch_size=4, num_sims=8, ratio_full=4,
                            prob_full=0.5, chunk_moves=8, max_moves=24)
    eng = SP.SelfPlayEngine(env_cfg, eval_fn, cfg)
    it, stats = eng.run_games((params, bs), jax.random.PRNGKey(1),
                              np.random.default_rng(0))
    assert stats["games"] == 4
    assert it is not None and len(it) > 0
    assert it.surprise.shape == (len(it), 2)
    assert (it.scdiff[:, 0] == 0).all()
    # winner rows are valid outcome vectors: entries in {-1, 0, 1} and the
    # vector is either all-zero (unfinished/draw path) or sums to 2-P form
    assert np.isin(np.asarray(it.winner, np.float32), [-1.0, 0.0, 1.0]).all()
