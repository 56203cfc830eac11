"""Batched pit CLI (--batched): lockstep arena path used for the
reference-config alphabeta evaluation (cli/pit.py:play_batched)."""

import json

from alphazero_tpu.cli import pit


def test_play_batched_random_vs_greedy(capsys):
    out = pit.main(["greedy", "random", "--batched", "-n", "4",
                    "--numPlayers", "2", "--seed", "3"])
    assert out["games"] == 4
    assert out["wins"] + out["losses"] + out["draws"] == 4
    # greedy should not lose to random overall
    assert out["winrate"] >= 0.5
    # the result line is machine-readable JSON
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["players"] == ["greedy", "random"]


def test_play_batched_three_player_seat_rotation():
    # N-player: agent A rotates through all 3 seats, num_games//3 per seat
    out = pit.main(["greedy", "random", "--batched", "-n", "6",
                    "--numPlayers", "3", "--seed", "4"])
    assert out["games"] == 6
    assert out["winrate"] >= 0.5
