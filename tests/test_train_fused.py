"""Fused train-chunk path: K scanned minibatch updates in one dispatch must
match the sequential per-minibatch step, and optimizer state must survive a
checkpoint roundtrip (crash-restart resume keeps the Adam moments)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.games.splendor import adapter as A
from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.train import trainer as TR
from alphazero_tpu.utils import checkpoint as CKPT
from tests.test_train_loop_qol import _tiny_replay


def _stacked_batches(replay, k, b, rng):
    batch_np = replay.sample(k * b, rng)
    return {name: jnp.asarray(v.reshape((k, b) + v.shape[1:]))
            for name, v in batch_np.items()}


def test_train_chunk_matches_sequential_steps():
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    cfg = TR.TrainConfig(batch_size=8, epochs=1)
    K = 4

    state_a = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    state_b = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    replay = _tiny_replay(env_cfg)
    batches = _stacked_batches(replay, K, cfg.batch_size,
                               np.random.default_rng(0))
    lrs = jnp.asarray([1e-3, 8e-4, 6e-4, 4e-4], jnp.float32)
    key = jax.random.PRNGKey(7)

    chunk = TR.make_train_chunk(env_cfg, net_cfg, cfg)
    state_a, m_chunk = chunk(state_a, batches, lrs, jnp.float32(10.0), key)

    step = TR.make_train_step(env_cfg, net_cfg, cfg)
    keys = jax.random.split(key, K)
    ms = []
    for i in range(K):
        batch = {k: v[i] for k, v in batches.items()}
        state_b, m = step(state_b, batch, lrs[i], jnp.float32(10.0), keys[i])
        ms.append(m)

    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert int(state_a.step) == int(state_b.step) == K
    # chunk metrics are the mean over the K steps
    want = np.mean([float(m["loss"]) for m in ms])
    np.testing.assert_allclose(float(m_chunk["loss"]), want, rtol=1e-5)


def test_fit_fused_runs_and_reports_validation():
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    cfg = TR.TrainConfig(batch_size=8, epochs=2, val_split=0.25)
    state = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    chunk = TR.make_train_chunk(env_cfg, net_cfg, cfg)
    eval_step = TR.make_eval_step(env_cfg, net_cfg, cfg)
    replay = _tiny_replay(env_cfg)
    state, metrics = TR.fit(
        state, None, replay, cfg, np.random.default_rng(0),
        jax.random.PRNGKey(1), eval_step_fn=eval_step,
        train_chunk_fn=chunk, chunk_steps=3)
    assert np.isfinite(metrics["loss"])
    assert "val_loss" in metrics and np.isfinite(metrics["val_loss"])
    assert int(state.step) > 0


def test_opt_state_checkpoint_roundtrip(tmp_path):
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    cfg = TR.TrainConfig(batch_size=8, epochs=1)
    state = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    replay = _tiny_replay(env_cfg)
    step = TR.make_train_step(env_cfg, net_cfg, cfg)
    batch = {k: jnp.asarray(v)
             for k, v in replay.sample(8, np.random.default_rng(0)).items()}
    state, _ = step(state, batch, jnp.float32(1e-3), jnp.float32(10.0),
                    jax.random.PRNGKey(1))

    CKPT.save_checkpoint(str(tmp_path), "temp.pt", params=state.params,
                         batch_stats=state.batch_stats,
                         opt_state=state.opt_state)
    ckpt = CKPT.load_checkpoint(str(tmp_path), "temp.pt")
    assert ckpt["opt_state"] is not None
    for a, b in zip(jax.tree_util.tree_leaves(ckpt["opt_state"]),
                    jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Adam moments are non-trivial after a step (mu picked up the gradient)
    mus = jax.tree_util.tree_leaves(ckpt["opt_state"].mu)
    assert any(np.abs(np.asarray(m)).max() > 0 for m in mus)


def test_reset_opt_state_clears_nonfinite_moments():
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    state = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    poisoned = state._replace(opt_state=jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, jnp.nan) if jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.floating) else x, state.opt_state))
    fresh = TR.reset_opt_state(poisoned)
    for leaf in jax.tree_util.tree_leaves(fresh.opt_state):
        assert np.isfinite(np.asarray(leaf)).all()
