"""Offline tooling: examples merge/binarize CLI (reference Coach.py:211-263)
and the standalone supervised trainer (GenericNNetWrapper.py:352-419)."""

import jax
import numpy as np

from alphazero_tpu.cli import examples_tool, train_offline
from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.train.replay import Iteration, ReplayBuffer
from alphazero_tpu.utils import checkpoint as CKPT


def _make_examples(path, n=48, seed=0):
    env_cfg = E.SplendorConfig(num_players=2)
    rng = np.random.default_rng(seed)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    states = np.asarray(jax.vmap(
        lambda k: E.initial_state(env_cfg, k))(keys)).astype(np.int8)
    valids = np.asarray(jax.vmap(
        lambda s: E.valid_moves(env_cfg, s, 0))(jax.numpy.asarray(states)))
    pi = valids.astype(np.float16)
    pi /= pi.sum(-1, keepdims=True)
    buf = ReplayBuffer(history=99)
    half = n // 2
    for sl in (slice(0, half), slice(half, n)):
        buf.add_iteration(Iteration(
            boards=states[sl], pi=pi[sl],
            winner=np.tile(np.array([1, -1], np.float16), (half, 1)),
            scdiff=rng.integers(-3, 3, (half, 2)).astype(np.int8),
            valids=valids[sl],
            surprise=np.ones((half, 2), np.float16)))
    buf.save(str(path))
    return buf


def test_examples_tool_merge_binarize_split(tmp_path, capsys):
    a, b = tmp_path / "a.examples", tmp_path / "b.examples"
    _make_examples(a, seed=0)
    _make_examples(b, seed=1)
    rc = examples_tool.main([str(a), str(b), "-o", str(tmp_path / "m"),
                             "--binarize", "--test-stride", "4"])
    assert rc == 0

    train = ReplayBuffer.load(str(tmp_path / "m_training.examples"),
                              history=99)
    test = ReplayBuffer.load(str(tmp_path / "m_testing.examples"),
                             history=99)
    # 2 iterations per file in; the LAST iteration of EACH file is carved
    # (strided) into the testing file and excluded from training (reference
    # Coach.py:226 per-file new_input[:-1] / new_input[-1:][::8])
    assert len(train.iterations) == 2
    assert len(test.iterations) == 2
    assert len(test) == 2 * (24 // 4)
    # binarized: every policy row is a one-hot
    for buf in (train, test):
        for it in buf.iterations:
            pi = np.asarray(it.pi, np.float32)
            assert np.allclose(pi.sum(1), 1.0)
            assert ((pi > 0).sum(1) == 1).all()
            # the hot entry is always a valid action
            assert it.valids[np.arange(len(pi)), pi.argmax(1)].all()


def test_binarize_keeps_zero_policy_rows_empty():
    """An all-zero pi row has no argmax; binarize must not invent a one-hot
    on action 0 (which may be invalid) for it."""
    env_cfg = E.SplendorConfig(num_players=2)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states = np.asarray(jax.vmap(
        lambda k: E.initial_state(env_cfg, k))(keys)).astype(np.int8)
    valids = np.asarray(jax.vmap(
        lambda s: E.valid_moves(env_cfg, s, 0))(jax.numpy.asarray(states)))
    pi = valids.astype(np.float16)
    pi /= pi.sum(-1, keepdims=True)
    pi[1] = 0                                     # poisoned row
    it = Iteration(boards=states, pi=pi,
                   winner=np.tile(np.array([1, -1], np.float16), (4, 1)),
                   scdiff=np.zeros((4, 2), np.int8), valids=valids,
                   surprise=np.ones((4, 2), np.float16))
    out = examples_tool.binarize(it)
    pi_out = np.asarray(out.pi, np.float32)
    assert pi_out[1].sum() == 0
    assert ((pi_out[[0, 2, 3]] > 0).sum(1) == 1).all()


def test_train_offline_cli(tmp_path):
    ex = tmp_path / "train.examples"
    _make_examples(ex, seed=2)
    rc = train_offline.main([
        "-T", str(ex), "-o", str(tmp_path / "out"),
        "-p", "1", "-b", "16", "--seed", "3"])
    assert rc == 0
    ckpt = CKPT.load_checkpoint(str(tmp_path / "out"), "last.pt")
    assert "params" in ckpt and np.isfinite(ckpt["meta"]["loss"])
    # the default 5% validation split produced val metrics
    assert "val_loss" in ckpt["meta"]
