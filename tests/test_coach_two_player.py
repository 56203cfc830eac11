"""2-player end-to-end Coach iteration (reference default configuration,
Coach.py:102-162): self-play -> replay -> train -> fused arena gate, plus
checkpoint artifacts and resume."""

import os

import numpy as np

from alphazero_tpu.train.coach import Coach, CoachConfig


def test_two_player_learn_iteration(tmp_path):
    cfg = CoachConfig(num_players=2, num_iters=1, games_per_iter=4,
                      selfplay_batch=4, num_sims=8, ratio_full=2,
                      prob_full=0.5, arena_games=4, gate_num_sims=6,
                      epochs=1, batch_size=8,
                      checkpoint_dir=str(tmp_path), seed=1)
    coach = Coach(cfg)
    seen = {}

    def cb(it, sp, metrics, gate, accept):
        seen["sp"], seen["metrics"], seen["gate"] = sp, metrics, gate
        seen["accept"] = accept

    coach.learn(on_iteration=cb)
    assert seen["sp"]["examples"] > 0
    assert np.isfinite(seen["metrics"]["loss"])
    nw, ow, dr = seen["gate"]
    assert nw + ow + dr == 4

    # checkpoint artifacts exist: temp always; best iff accepted
    assert os.path.exists(tmp_path / "temp.pt")
    assert os.path.exists(tmp_path / "checkpoint.examples")
    assert os.path.exists(tmp_path / "best.pt") == seen["accept"]

    # resume restores replay examples and weights without error
    coach2 = Coach(cfg)
    coach2.load_checkpoint(str(tmp_path), "temp.pt")
    assert len(coach2.replay) == seen["sp"]["examples"]
