"""Search-quality parity of the reduced-precision fast paths vs float32.

Two independently switchable reductions (both bench defaults, bench.py):
- NetConfig.dtype="bfloat16"      — trunk compute dtype (heads stay f32)
- MCTSConfig.stats_dtype="bfloat16" — MCTS edge-stats storage dtype

Counts and child ids are integers <= 256 so they are EXACT in bfloat16 (a
hard error guards larger trees, search/mcts.py); only Q values and priors
round.  These tests pin that the search's *decisions* survive the rounding:
visit-count distributions stay close and the argmax move agrees on nearly
every board, and root Q stays within bf16 tolerance of the f32 search."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.games.splendor import adapter as A
from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.models import splendor_net as N
from alphazero_tpu.search import mcts as M

B, SIMS = 48, 48


def _search_results(net_dtype: str, stats_dtype: str, trained_steps: int = 0):
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg, dtype=net_dtype)
    params, bs = N.init_params(net_cfg, jax.random.PRNGKey(0))
    eval_fn = A.make_eval_fn(net_cfg)
    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=SIMS, stats_dtype=stats_dtype),
        env_cfg.num_players, eval_fn,
        A.make_search_step_fn(env_cfg), A.make_valid_fn(env_cfg)))
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    roots = jax.jit(jax.vmap(lambda k: E.initial_state(env_cfg, k)))(keys)
    return search((params, bs), roots, jax.random.PRNGKey(2))


@pytest.fixture(scope="module")
def f32_result():
    return _search_results("float32", "float32")


def _assert_close_search(res, ref, argmax_agree=0.9, q_p95=0.02, q_max=0.15):
    counts = np.asarray(res.counts, np.float64)
    ref_counts = np.asarray(ref.counts, np.float64)
    pi = counts / counts.sum(1, keepdims=True)
    ref_pi = ref_counts / ref_counts.sum(1, keepdims=True)
    # visit distributions: small L1 drift allowed (rounding can flip a
    # near-tie PUCT pick on a few sims)
    l1 = np.abs(pi - ref_pi).sum(1)
    assert np.median(l1) < 0.25, f"median L1 {np.median(l1)}"
    # the selected move agrees on nearly every board
    agree = (pi.argmax(1) == ref_pi.argmax(1)).mean()
    assert agree >= argmax_agree, f"argmax agreement {agree}"
    # root Q within bf16 rounding of the f32 search (bulk tight; a lone
    # board where rounding flipped one deep-descent pick may drift more)
    dq = np.abs(np.asarray(res.q, np.float64) - np.asarray(ref.q, np.float64))
    assert np.percentile(dq, 95) < q_p95, f"p95 |dQ| {np.percentile(dq, 95)}"
    assert dq.max() < q_max, f"max |dQ| {dq.max()}"
    # exactness invariant: counts are integers and sum to num_sims' visits
    assert np.allclose(counts, np.round(counts))


def test_bf16_stats_matches_f32(f32_result):
    res = _search_results("float32", "bfloat16")
    _assert_close_search(res, f32_result)


def test_bf16_net_matches_f32(f32_result):
    res = _search_results("bfloat16", "float32")
    # bf16 trunk shifts priors more than bf16 stats shifts Q: allow a
    # slightly lower agreement floor
    _assert_close_search(res, f32_result, argmax_agree=0.8)


def test_bf16_full_fast_path(f32_result):
    res = _search_results("bfloat16", "bfloat16")
    # both roundings compound in Q (the value head's bf16 trunk dominates);
    # the visit counts / move choice still agree
    _assert_close_search(res, f32_result, argmax_agree=0.8,
                         q_p95=0.03, q_max=0.2)


def test_bf16_stats_guard_rejects_large_trees():
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    with pytest.raises(ValueError, match="bfloat16"):
        M.build_search(
            M.MCTSConfig(num_sims=400, stats_dtype="bfloat16"),
            2, A.make_eval_fn(net_cfg),
            A.make_search_step_fn(env_cfg), A.make_valid_fn(env_cfg))


def test_auto_stats_dtype_resolves_f32_on_cpu_and_guards_reuse():
    """'auto' must fall back to float32 off-TPU (counts tests rely on it),
    and explicit bfloat16 must be rejected for reuse trees of ANY size:
    a carried root's Ns grows past bf16's exact-integer range (256), where
    +1 increments silently vanish."""
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    # auto on CPU -> builds fine (resolves f32; bf16 would need TPU)
    M.build_search(M.MCTSConfig(num_sims=300, stats_dtype="auto"), 2,
                   A.make_eval_fn(net_cfg), A.make_search_step_fn(env_cfg),
                   A.make_valid_fn(env_cfg))
    with pytest.raises(ValueError, match="bfloat16"):
        M.build_reusing_search(
            M.MCTSConfig(num_sims=16, stats_dtype="bfloat16"), 2,
            A.make_eval_fn(net_cfg), A.make_search_step_fn(env_cfg),
            A.make_valid_fn(env_cfg), keep_cap=16)
