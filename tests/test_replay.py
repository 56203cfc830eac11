"""Replay buffer: compressed save/load roundtrip (native core + fallback)
and surprise-weighted sampling over per-player vectors."""

import numpy as np

from alphazero_tpu.train.replay import Iteration, ReplayBuffer


def _iteration(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return Iteration(
        boards=rng.integers(0, 5, (n, 56, 7)).astype(np.int8),
        pi=rng.random((n, 409)).astype(np.float16),
        winner=rng.choice([-1.0, 1.0], (n, 2)).astype(np.float16),
        scdiff=rng.integers(-5, 5, (n, 2)).astype(np.int8),
        valids=rng.random((n, 409)) > 0.5,
        surprise=rng.random((n, 2)).astype(np.float16),
    )


def test_compressed_roundtrip(tmp_path):
    buf = ReplayBuffer(history=3)
    buf.add_iteration(_iteration(seed=0))
    buf.add_iteration(_iteration(seed=1))
    p = tmp_path / "replay.pkl"
    buf.save(str(p))
    # compressed-on-disk: real boards are sparse int8, must beat raw size
    raw = sum(a.nbytes for it in buf.iterations for a in it.__dict__.values())
    assert p.stat().st_size < raw

    b2 = ReplayBuffer.load(str(p), history=3)
    assert len(b2) == len(buf)
    for it_a, it_b in zip(buf.iterations, b2.iterations):
        for name in it_a.__dict__:
            np.testing.assert_array_equal(getattr(it_a, name),
                                          getattr(it_b, name))


def test_surprise_weighted_sampling_prefers_high_surprise():
    """Tag the two populations through scdiff lane 1 so sampled rows are
    identifiable, then check high-surprise rows dominate the draw."""
    buf = ReplayBuffer()
    it = _iteration(n=512, seed=2)
    it.surprise[:256] = 0.001
    it.scdiff[:256, 1] = 0
    it.surprise[256:] = 2.0
    it.scdiff[256:, 1] = 1
    buf.add_iteration(it)
    rng = np.random.default_rng(3)
    high = total = 0
    for _ in range(10):
        batch = buf.sample(64, rng, surprise_weight=True)
        high += int((batch["scdiff"][:, 1] == 1).sum())
        total += 64
    # weights: high ~ (2/512.5 + 1/512) vs low ~ (~0 + 1/512) => ~3:1
    assert high / total > 0.6, high / total


def test_history_trim():
    buf = ReplayBuffer(history=2)
    for i in range(4):
        buf.add_iteration(_iteration(n=8, seed=i))
    assert len(buf.iterations) == 2
    assert len(buf) == 16
