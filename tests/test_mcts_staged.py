"""Staged tree-capacity schedule (MCTSConfig.stage_sims) exactness locks.

The staged search runs the same sim loop in capacity-growing stages; every
test here demands EXACT equality with the single-stage search — the
schedule is a pure execution-layout change (see mcts.py build_search doc).
"""

import dataclasses

import numpy as np
import jax
import pytest

from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.games.splendor import adapter as A
from alphazero_tpu.search import mcts as M


@pytest.fixture(scope="module")
def setup():
    cfg = E.SplendorConfig(num_players=2)
    return (cfg, A.make_uniform_eval_fn(cfg), A.make_search_step_fn(cfg),
            A.make_valid_fn(cfg))


def _roots(cfg, B, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    return jax.jit(jax.vmap(lambda k: E.initial_state(cfg, k)))(keys)


def _run(setup, mcfg, B=6, seed=3):
    cfg, eval_fn, step_fn, valid_fn = setup
    search = jax.jit(M.build_search(mcfg, 2, eval_fn, step_fn, valid_fn))
    return search(None, _roots(cfg, B), jax.random.PRNGKey(seed))


def _assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a.raw_counts),
                                  np.asarray(b.raw_counts))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    np.testing.assert_array_equal(np.asarray(a.q), np.asarray(b.q))
    np.testing.assert_array_equal(np.asarray(a.root_value),
                                  np.asarray(b.root_value))
    np.testing.assert_array_equal(np.asarray(a.root_prior),
                                  np.asarray(b.root_prior))


@pytest.mark.parametrize("spec", ["16,16,32", "auto", "8,8,16,32"])
def test_staged_exactness_plain(setup, spec):
    base = M.MCTSConfig(num_sims=64, stage_sims="off")
    staged = dataclasses.replace(base, stage_sims=spec)
    _assert_same(_run(setup, staged), _run(setup, base))


def test_staged_exactness_noise_forced(setup):
    """Dirichlet noise must be applied exactly once (stage 1) and forced
    playouts must see the GLOBAL sim index across stage boundaries."""
    base = M.MCTSConfig(num_sims=96, stage_sims="off", add_noise=True,
                        dirichlet_alpha=0.2, dirichlet_frac=0.25,
                        forced_playouts=True, fpu=0.3)
    staged = dataclasses.replace(base, stage_sims="16,16,32,32")
    _assert_same(_run(setup, staged), _run(setup, base))


def test_auto_schedule_shape():
    assert M._resolve_stage_schedule(M.MCTSConfig(num_sims=64)) == (16, 16, 32)
    assert M._resolve_stage_schedule(
        M.MCTSConfig(num_sims=128)) == (16, 16, 32, 64)
    # below 64 sims auto stays single-stage, as does an explicit off
    assert M._resolve_stage_schedule(M.MCTSConfig(num_sims=48)) is None
    assert M._resolve_stage_schedule(
        M.MCTSConfig(num_sims=64, stage_sims="off")) is None
    with pytest.raises(ValueError):
        M._resolve_stage_schedule(M.MCTSConfig(num_sims=64, stage_sims="16,16"))


def test_staged_respects_unroll(setup):
    base = M.MCTSConfig(num_sims=64, stage_sims="off", descent_unroll=2)
    staged = dataclasses.replace(base, stage_sims="auto")
    _assert_same(_run(setup, staged), _run(setup, base))


def test_staged_with_depth_cap(setup):
    """Depth-cap composition: a stage's path buffer is min(M_i-1, cap); the
    cap can never bind before the stage's natural depth bound (a tree with
    n nodes has descents of at most n edges), so staged+capped must equal
    unstaged+capped exactly — the production self-play configuration
    (S=128, max_depth=64) relies on this."""
    base = M.MCTSConfig(num_sims=96, stage_sims="off", max_depth=24,
                        fpu=0.0)
    staged = dataclasses.replace(base, stage_sims="16,16,32,32")
    _assert_same(_run(setup, staged), _run(setup, base))
