"""Search-quality parity vs the REFERENCE MCTS (MCTS.py:45-237) on fixed
positions with a frozen evaluator (SURVEY §7 stage 3; BASELINE config 2).

The reference module runs in-place from /root/reference with numba stubbed
(see reference_mcts_harness).  Both searches get the SAME evaluator, the
same position set, noise off, full search — so visit counts and root Q are
directly comparable.  docs/search_parity.md records a larger run with the
imported genbu.pt network."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from alphazero_tpu.games.splendor import env as E  # noqa: E402
from alphazero_tpu.games.splendor import adapter as A  # noqa: E402
from alphazero_tpu.search import mcts as M  # noqa: E402
from oracle.splendor_oracle import OracleBoard  # noqa: E402

from . import reference_mcts_harness as H  # noqa: E402

pytestmark = pytest.mark.skipif(not H.reference_available(),
                                reason="reference snapshot not available")

SIMS = 48
N_POSITIONS = 6


def _agreement(eval_fn, bundle, positions):
    cfg = E.SplendorConfig(num_players=2)
    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=SIMS), 2, eval_fn,
        A.make_search_step_fn(cfg), A.make_valid_fn(cfg)))
    batch = jnp.asarray(np.stack(positions))
    res = search(bundle, batch, jax.random.PRNGKey(0))
    ours = np.asarray(res.raw_counts, np.int64)
    our_q = np.asarray(res.q, np.float64)

    ref_mod = H.load_reference_mcts()
    stats = []
    for i, pos in enumerate(positions):
        counts, q = H.reference_visit_counts(
            ref_mod, OracleBoard(2), eval_fn, bundle, pos, SIMS)
        assert counts.sum() == SIMS == ours[i].sum()
        l1 = np.abs(ours[i] / SIMS - counts / SIMS).sum()
        same_best = int(ours[i].argmax() == counts.argmax())
        stats.append((l1, same_best, abs(our_q[i, 0] - q[0])))
    return np.array(stats)


def test_uniform_eval_parity():
    """Know-nothing evaluator: maximum tie density, stresses UCB/FPU
    tie-breaking order."""
    cfg = E.SplendorConfig(num_players=2)
    eval_fn = A.make_uniform_eval_fn(cfg)
    positions = H.random_positions(N_POSITIONS, moves=6, seed=3)
    assert len(positions) >= 4
    stats = _agreement(eval_fn, None, positions)
    l1, same_best, dq = stats[:, 0], stats[:, 1], stats[:, 2]
    assert same_best.mean() >= 0.75, stats
    assert l1.mean() <= 0.25, stats
    assert dq.mean() <= 0.1, stats


def test_real_net_parity():
    """Imported genbu.pt as the frozen net on both sides (reference's
    strongest 2-player checkpoint)."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from alphazero_tpu.compat import torch_import as TI

    cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(cfg)
    params, stats_, _ = TI.load_as_bundle("/root/reference/genbu.pt", net_cfg)
    bundle = (params, stats_)
    eval_fn = A.make_eval_fn(net_cfg)
    positions = H.random_positions(N_POSITIONS, moves=6, seed=7)
    assert len(positions) >= 4
    stats = _agreement(eval_fn, bundle, positions)
    l1, same_best, dq = stats[:, 0], stats[:, 1], stats[:, 2]
    assert same_best.mean() >= 0.75, stats
    assert l1.mean() <= 0.25, stats
    assert dq.mean() <= 0.1, stats
