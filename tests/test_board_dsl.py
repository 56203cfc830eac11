"""Board-entry DSL tests (games/splendor/board_dsl.py)."""

import numpy as np
import pytest

from alphazero_tpu.games.splendor import board_dsl as D
from alphazero_tpu.games.splendor import env as E
from alphazero_tpu.games.splendor import tables as T


def test_card_codes_match_reference_tables():
    """The generated code map must agree with the reference's hand-written
    cost_map (controlable_play.py:42-199) — spot-check every published
    (cost-string -> index) pair, which is color-independent."""
    ref = {
        0: {"3": 0, "21": 1, "22": 2, "221": 3, "311": 4, "1111": 5,
            "2111": 6, "4": 7},
        1: {"322": 0, "332": 1, "5": 2, "53": 3, "421": 4, "6": 5},
        2: {"5333": 0, "7": 1, "633": 2, "73": 3},
    }
    for (code, (tier, color, idx)) in D.CODE_TO_CARD.items():
        assert ref[tier][code[1:]] == idx, (code, tier, idx)
    # all 90 cards covered
    assert len(D.CODE_TO_CARD) == 5 * (8 + 6 + 4)


def test_noble_codes():
    assert D.lookup_noble("RG") == 0
    assert D.lookup_noble("GR") == 0          # order-insensitive
    assert D.lookup_noble("KRW") == 5
    assert len({D.lookup_noble(c) for c in
                ["RG", "KR", "BG", "KW", "BW", "KRW", "GBW", "KRG", "GBR",
                 "KBW"]}) == 10


def _demo_spec():
    return {
        "Tier1": ["B3", "R21", "K22", "W4"],
        "Tier2": ["G322", "B5", "R53", "K6"],
        "Tier3": ["W5333", "G7", "B73", "R633"],
        "Bank": [4, 4, 3, 4, 4, 5],
        "Nobles": ["RG", "KW", "BW"],
        "Gems": [[1, 0, 2, 0, 0, 1], [0, 1, 0, 2, 0, 0]],
        "Cards": [[1, 0, 0, 0, 0], [0, 0, 1, 1, 0]],
        "Reserve": [["G21"], []],
        "PlayersCards": [["B1111", "R4"], ["K3", "W21", "G221"]],
        "PlayersNobles": [[], []],
    }


def test_spec_roundtrip():
    spec = _demo_spec()
    state = D.spec_to_state(spec, 2, cur_player=0)
    back = D.state_to_spec(state, 2)
    for key in ("Tier1", "Tier2", "Tier3", "Bank", "Gems", "Cards",
                "Reserve"):
        assert back[key] == spec[key], key
    # noble code spelling is not canonical — compare resolved ids
    assert ([D.lookup_noble(c) for c in back["Nobles"]]
            == [D.lookup_noble(c) for c in spec["Nobles"]])
    assert back["PlayersNobles"] == spec["PlayersNobles"] == [[], []]


def test_deck_consistency_and_validity():
    """Placed/reserved/bought cards leave the deck; state is playable."""
    cfg = E.SplendorConfig(num_players=2)
    spec = _demo_spec()
    state = D.spec_to_state(spec, 2)

    # deck counts: tier1 started 8/color, 4 visible + 1 bought(B1111)+1(R4)... etc
    counts1 = state[cfg.row_decks, :5].astype(int)
    # tier 1: visible B3,R21,K22,W4; reserved G21; bought B1111,R4,K3,W21,G221
    assert counts1.tolist() == [8 - 2, 8 - 2, 8 - 2, 8 - 2, 8 - 2]
    # bit-counts agree with count rows for every tier
    for tier in range(3):
        bits = np.unpackbits(
            state[cfg.row_decks + 2 * tier + 1, :5].astype(np.uint8))
        assert bits.sum() == state[cfg.row_decks + 2 * tier, :5].sum()

    # points: B1111(0)+R4(1)=1 ; K3(0)+W21(0)+G221(0)=0
    assert state[cfg.row_pcards, 6] == 1
    assert state[cfg.row_pcards + 1, 6] == 0

    valids = np.asarray(E.valid_moves_jit(cfg, state, 0))
    assert valids.any()


def test_cur_player_canonicalization():
    spec = _demo_spec()
    s0 = D.spec_to_state(spec, 2, cur_player=0)
    s1 = D.spec_to_state(spec, 2, cur_player=1)
    cfg = E.SplendorConfig(num_players=2)
    # player-1 frame: seat 0 holds player 1's gems
    assert (s1[cfg.row_pgems, :6] == np.array(spec["Gems"][1])).all()
    assert (s0[cfg.row_pgems, :6] == np.array(spec["Gems"][0])).all()


def test_unknown_codes_raise():
    with pytest.raises(KeyError):
        D.lookup_card("W99")
    with pytest.raises(KeyError):
        D.lookup_noble("XX")
