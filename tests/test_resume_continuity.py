"""Resume continuity across run segments (VERDICT r3 item 4): a restarted
run must continue the SAME monotone iteration numbering in one metrics.jsonl,
version superseded settings instead of overwriting them, and de-correlate the
resumed segment's randomness (reference resume parity: Coach.py:175-208 +
main.py:62-80 settings diff)."""

import json
import os

from alphazero_tpu.train.coach import Coach, CoachConfig, completed_iterations
from alphazero_tpu.utils import checkpoint as CKPT


def _cfg(tmp_path, num_iters):
    return CoachConfig(num_players=2, num_iters=num_iters, games_per_iter=4,
                       selfplay_batch=4, num_sims=8, ratio_full=2,
                       prob_full=0.5, arena_games=4, gate_num_sims=6,
                       epochs=1, batch_size=8,
                       checkpoint_dir=str(tmp_path), seed=1)


def _iters(tmp_path):
    with open(os.path.join(tmp_path, "metrics.jsonl")) as f:
        return [json.loads(l)["iter"] for l in f if l.strip()]


def test_restart_continues_monotone_numbering(tmp_path):
    # segment 1: 2 of 4 iterations, then "crash"
    coach = Coach(_cfg(tmp_path, num_iters=2))
    coach.learn()
    assert _iters(tmp_path) == [1, 2]
    assert completed_iterations(str(tmp_path)) == 2

    # segment 2 (the restart path cli.main wires up): same dir, TOTAL budget
    # raised to 4, continuation point inferred from metrics.jsonl
    coach2 = Coach(_cfg(tmp_path, num_iters=4))
    coach2.load_checkpoint(str(tmp_path), "temp.pt")
    start = completed_iterations(str(tmp_path)) + 1
    assert start == 3
    coach2.learn(start_iter=start)

    # ONE metrics file, continuous numbering — no counter reset
    assert _iters(tmp_path) == [1, 2, 3, 4]

    # superseded settings are versioned, current settings reflect the resume
    assert os.path.exists(tmp_path / "settings_v1.json")
    with open(tmp_path / "settings.json") as f:
        assert json.load(f)["num_iters"] == 4
    with open(tmp_path / "settings_v1.json") as f:
        assert json.load(f)["num_iters"] == 2

    # a fully-complete run is a no-op (the supervisor's exit condition)
    coach3 = Coach(_cfg(tmp_path, num_iters=4))
    coach3.learn(start_iter=completed_iterations(str(tmp_path)) + 1)
    assert _iters(tmp_path) == [1, 2, 3, 4]


def test_identical_settings_resave_writes_no_version(tmp_path):
    CKPT.save_settings(str(tmp_path), {"a": 1})
    CKPT.save_settings(str(tmp_path), {"a": 1})
    assert not os.path.exists(tmp_path / "settings_v1.json")
    CKPT.save_settings(str(tmp_path), {"a": 2})
    CKPT.save_settings(str(tmp_path), {"a": 3})
    assert os.path.exists(tmp_path / "settings_v1.json")
    assert os.path.exists(tmp_path / "settings_v2.json")


def test_completed_iterations_uses_max_iter(tmp_path):
    # robust to a partially-written trailing line and non-monotone history
    with open(tmp_path / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"iter": 1}) + "\n")
        f.write(json.dumps({"iter": 2}) + "\n")
        f.write("{bad json\n")
    assert completed_iterations(str(tmp_path)) == 2
    assert completed_iterations(str(tmp_path / "missing")) == 0
