"""Pallas fused-backup kernel vs a numpy reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.ops.fused_backup import fused_backup


def _reference(stats, path_p, path_a, w, child_p, child_a, child_v, pv, slot):
    B, M, _, A = stats.shape
    ref = stats.copy()
    for b in range(B):
        for s in range(path_p.shape[1]):
            if path_p[b, s] < M:
                ref[b, path_p[b, s], 2, path_a[b, s]] += w[b, s, 0]
                ref[b, path_p[b, s], 3, path_a[b, s]] += w[b, s, 1]
        if child_v[b] != 0:
            ref[b, child_p[b], 1, child_a[b]] += child_v[b]
        ref[b, slot, 0, :] += pv[b]
    return ref


def test_fused_backup_matches_reference():
    rng = np.random.default_rng(0)
    B, M, A, S1, TB = 16, 9, 57, 5, 8
    stats = rng.normal(size=(B, M, 4, A)).astype(np.float32)
    path_p = rng.integers(0, M + 1, size=(B, S1)).astype(np.int32)
    path_a = rng.integers(0, A, size=(B, S1)).astype(np.int32)
    w = rng.normal(size=(B, S1, 2)).astype(np.float32)
    child_p = rng.integers(0, M, size=(B,)).astype(np.int32)
    child_a = rng.integers(0, A, size=(B,)).astype(np.int32)
    child_v = (rng.integers(0, 2, size=(B,))
               * rng.integers(1, M, size=(B,))).astype(np.float32)
    pv = rng.normal(size=(B, A)).astype(np.float32)
    slot = 3

    out = np.asarray(fused_backup(
        jnp.asarray(stats), jnp.asarray(path_p), jnp.asarray(path_a),
        jnp.asarray(w), jnp.asarray(child_p), jnp.asarray(child_a),
        jnp.asarray(child_v), jnp.asarray(pv), slot, tile_b=TB,
        interpret=True))
    ref = _reference(stats, path_p, path_a, w, child_p, child_a, child_v,
                     pv, slot)
    # bf16 MXU rounding on the path weights
    np.testing.assert_allclose(out, ref, atol=1e-2)


def test_mcts_pallas_backup_flag_is_retired():
    """The integration flag targets the pre-packed split layout and now
    raises with a pointer to the kept kernel reference (see
    MCTSConfig.pallas_backup); the op itself stays tested above."""
    import pytest

    from alphazero_tpu.games.splendor import adapter as A_
    from alphazero_tpu.games.splendor import env as E
    from alphazero_tpu.search import mcts as M

    env_cfg = E.SplendorConfig(num_players=2)
    with pytest.raises(NotImplementedError, match="Pallas"):
        M.build_search(
            M.MCTSConfig(num_sims=12, pallas_backup=True), 2,
            A_.make_uniform_eval_fn(env_cfg),
            A_.make_search_step_fn(env_cfg), A_.make_valid_fn(env_cfg))
