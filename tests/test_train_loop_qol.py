"""Train-loop QoL parity: validation split, intermediary checkpoints, and the
robust checkpoint-load fallback chain (reference GenericNNetWrapper.py:108-137
and :215-260), plus the engine judge used to settle move-capped games."""

import dataclasses

import jax
import numpy as np
import pytest

from alphazero_tpu.games.splendor import adapter as A
from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.models import splendor_net as N
from alphazero_tpu.train import trainer as TR
from alphazero_tpu.train.replay import Iteration, ReplayBuffer
from alphazero_tpu.utils import checkpoint as CKPT


def _tiny_replay(env_cfg, n=64, seed=0):
    rng = np.random.default_rng(seed)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    states = np.asarray(jax.vmap(
        lambda k: E.initial_state(env_cfg, k))(keys))
    valids = np.asarray(jax.vmap(
        lambda s: E.valid_moves(env_cfg, s, 0))(
            jax.numpy.asarray(states)))
    pi = valids.astype(np.float16)
    pi /= np.maximum(pi.sum(-1, keepdims=True), 1)
    p = env_cfg.num_players
    winner = np.tile(np.array([1.0, -1.0][:p] + [0.0] * max(p - 2, 0),
                              np.float16), (n, 1))
    buf = ReplayBuffer(history=2)
    buf.add_iteration(Iteration(
        boards=states.astype(np.int8), pi=pi, winner=winner,
        scdiff=rng.integers(-3, 3, (n, p)).astype(np.int8),
        valids=valids, surprise=np.abs(
            rng.normal(size=(n, p))).astype(np.float16)))
    return buf


def test_fit_with_validation_split_and_epoch_hook():
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    cfg = TR.TrainConfig(batch_size=8, epochs=2, val_split=0.25)
    state = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    step = TR.make_train_step(env_cfg, net_cfg, cfg)
    eval_step = TR.make_eval_step(env_cfg, net_cfg, cfg)
    replay = _tiny_replay(env_cfg)
    epochs_seen = []

    state, metrics = TR.fit(
        state, step, replay, cfg, np.random.default_rng(0),
        jax.random.PRNGKey(1), eval_step_fn=eval_step,
        on_epoch_end=lambda e, st, m: epochs_seen.append((e, m)))

    assert np.isfinite(metrics["loss"])
    assert "val_loss" in metrics and np.isfinite(metrics["val_loss"])
    assert [e for e, _ in epochs_seen] == [0, 1]
    # the epoch hook sees validation metrics too
    assert "val_loss" in epochs_seen[0][1]


def test_fit_surprise_weight_respects_holdout():
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    cfg = TR.TrainConfig(batch_size=8, epochs=1, val_split=0.25)
    state = TR.init_train_state(net_cfg, jax.random.PRNGKey(0))
    step = TR.make_train_step(env_cfg, net_cfg, cfg)
    eval_step = TR.make_eval_step(env_cfg, net_cfg, cfg)
    replay = _tiny_replay(env_cfg)
    state, metrics = TR.fit(
        state, step, replay, cfg, np.random.default_rng(0),
        jax.random.PRNGKey(1), surprise_weight=True,
        eval_step_fn=eval_step)
    assert np.isfinite(metrics["loss"]) and "val_loss" in metrics


def _save_net(tmp_path, net_cfg, name, seed=0, meta=None):
    params, bs = N.init_params(net_cfg, jax.random.PRNGKey(seed))
    CKPT.save_checkpoint(str(tmp_path), name, params=params,
                         batch_stats=bs, meta=meta or {})
    return params


def test_load_network_strict_and_partial(tmp_path):
    env_cfg = E.SplendorConfig(num_players=2)
    small = A.net_config_for(env_cfg)
    _save_net(tmp_path, small, "temp.pt", seed=1)

    tgt, _ = N.init_params(small, jax.random.PRNGKey(2))
    ckpt = CKPT.load_network(str(tmp_path), "temp.pt", tgt)
    assert ckpt["load_mode"] == "strict"
    assert ckpt["load_source"] == "temp.pt"

    # grown architecture -> shape-sliced partial transfer
    big = dataclasses.replace(small, width=small.width * 2)
    tgt_big, _ = N.init_params(big, jax.random.PRNGKey(3))
    ckpt2 = CKPT.load_network(str(tmp_path), "temp.pt", tgt_big)
    assert ckpt2["load_mode"] == "partial"
    for a, b in zip(jax.tree_util.tree_leaves(ckpt2["params"]),
                    jax.tree_util.tree_leaves(tgt_big)):
        assert np.shape(a) == np.shape(b)


def test_load_network_fallback_chain(tmp_path):
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    tgt, _ = N.init_params(net_cfg, jax.random.PRNGKey(0))

    # missing requested file -> best.pt fallback
    _save_net(tmp_path, net_cfg, "best.pt", seed=4)
    ckpt = CKPT.load_network(str(tmp_path), "nonexistent.pt", tgt)
    assert ckpt["load_source"] == "best.pt"

    # corrupt requested file -> newest checkpoint_N.pt after best is gone
    (tmp_path / "best.pt").unlink()
    (tmp_path / "temp.pt").write_bytes(b"corrupt")
    _save_net(tmp_path, net_cfg, "checkpoint_2.pt", seed=5)
    _save_net(tmp_path, net_cfg, "checkpoint_10.pt", seed=6)
    ckpt = CKPT.load_network(str(tmp_path), "temp.pt", tgt)
    assert ckpt["load_source"] == "checkpoint_10.pt"

    # nothing loadable -> clear error
    for f in ("temp.pt", "checkpoint_2.pt", "checkpoint_10.pt"):
        (tmp_path / f).unlink()
    with pytest.raises(FileNotFoundError):
        CKPT.load_network(str(tmp_path), "temp.pt", tgt)


def test_load_network_strict_resume_refuses_substitutes(tmp_path):
    """fallback=False (user-requested resume): a typoed filename must raise,
    never silently load a sibling checkpoint."""
    env_cfg = E.SplendorConfig(num_players=2)
    net_cfg = A.net_config_for(env_cfg)
    tgt, _ = N.init_params(net_cfg, jax.random.PRNGKey(0))
    _save_net(tmp_path, net_cfg, "best.pt", seed=4)
    with pytest.raises(FileNotFoundError):
        CKPT.load_network(str(tmp_path), "typo.pt", tgt, fallback=False)
    # the requested file itself still loads strictly
    ckpt = CKPT.load_network(str(tmp_path), "best.pt", tgt, fallback=False)
    assert ckpt["load_source"] == "best.pt"


def test_judge_settles_nonterminal_states():
    """E.judge returns a winner vector even off a turn boundary / pre-terminal
    (the move-cap fallback both arenas rely on)."""
    cfg = E.SplendorConfig(num_players=2)
    st = E.initial_state_jit(cfg, jax.random.PRNGKey(0))
    # mid-game, nobody at score_win: check_end_game says "running"...
    assert not np.asarray(E.check_end_game_jit(cfg, st)).any()
    # ...but the judge still produces a settled outcome vector
    out = np.asarray(jax.jit(lambda s: E.judge(cfg, s))(st))
    assert out.shape == (2,)
    assert out.any()
    assert set(np.sign(out)) <= {-1.0, 0.0, 1.0}
    # equal scores, equal cards at the start -> shared-win tiebreak (0.01)
    assert np.allclose(out, 0.01)
