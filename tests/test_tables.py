"""Unit tests for the Splendor action-space tables.

The per-action TAKE/GIVE metadata is re-derived here directly from the
reference's *dispatch arithmetic* (SplendorLogicNumba.py:697-761) so that a
bug in tables._build_action_tables cannot hide."""

import numpy as np

from alphazero_tpu.games.splendor import tables as T


def _give_vec(j):
    v = np.zeros(5, np.int64)
    if j < 5:
        v[j] = 1
    elif j < 15:
        pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        a, b = pairs[j - 5]
        v[a] = v[b] = 1
    else:
        v[j - 15] = 2
    return v


def _take3(i):
    triples = [(a, b, c) for a in range(5) for b in range(a + 1, 5)
               for c in range(b + 1, 5)]
    v = np.zeros(5, np.int64)
    for c in triples[i]:
        v[c] = 1
    return v


def _take2(i):
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    v = np.zeros(5, np.int64)
    for c in pairs[i]:
        v[c] = 1
    return v


def test_combo_tables_order():
    # singles then pairs then triples, in itertools.combinations order
    assert (T.DIFF_UP_TO_3[:5, :5] == np.eye(5)).all()
    for i in range(10):
        assert (T.DIFF_UP_TO_3[5 + i, :5] == _take2(i)).all()
        assert (T.DIFF_UP_TO_3[15 + i, :5] == _take3(i)).all()


def test_exchange_decode_matches_reference_dispatch():
    """Re-derive take/give per exchange action from the reference's
    _give_and_get_gems index arithmetic and compare to our tables."""
    for a in range(60, 405):
        i = a - 60
        if i < 20:
            take = _take3(i // 2)
            give = _give_vec(T.GIVE_IDS[0][i // 2][i % 2])
        elif i < 50:
            j = i - 20
            take = _take3(j // 3)
            give = _give_vec(T.GIVE_IDS[1][j // 3][j % 3])
        elif i < 110:
            j = i - 50
            take = _take2(j // 6)
            give = _give_vec(T.GIVE_IDS[2][j // 6][j % 6])
        elif i < 160:
            j = i - 110
            take = np.zeros(5, np.int64)
            take[j // 10] = 2
            give = _give_vec(T.GIVE_IDS[3][j // 10][j % 10])
        elif i < 190:
            j = i - 160
            take = _take2(j // 3)
            give = _give_vec(T.GIVE_IDS[4][j // 3][j % 3])
        elif i < 210:
            j = i - 190
            take = np.zeros(5, np.int64)
            take[j // 4] = 2
            give = _give_vec(T.GIVE_IDS[5][j // 4][j % 4])
        elif i < 230:
            j = i - 210
            take = np.zeros(5, np.int64)
            take[j // 4] = 1
            give = _give_vec(T.T1G1_GIVE[j])
        elif i < 305:   # reserve+give: slot and one gem back
            j = i - 230
            assert T.ACTION_KIND[a] == T.KIND_RSVG
            assert T.ACTION_PARAM[a] == j // 5
            assert (T.ACTION_GIVE[a] == _give_vec(j % 5)).all()
            continue
        else:
            j = i - 305
            t, g1, g2 = T.GIVE_IDS3[j]
            take = _take3(t)
            give = _give_vec(g1) + _give_vec(g2)
        assert (T.ACTION_TAKE[a] == take).all(), a
        assert (T.ACTION_GIVE[a] == give).all(), a


def test_exchange_token_balance():
    """Every exchange keeps tokens within the reference's intent: after the
    move the player holds at most NUM_TOKEN_LIMIT tokens given the gating
    class."""
    limits = {T.XC_LM2: 8, T.XC_LM1: 9, T.XC_ELSE: 10}
    for a in range(60, 405):
        if T.ACTION_KIND[a] == T.KIND_RSVG:
            continue
        tok = limits[int(T.ACTION_XCLASS[a])]
        delta = int(T.ACTION_TAKE[a].sum()) - int(T.ACTION_GIVE[a].sum())
        assert tok + delta <= 10, (a, tok, delta)


def test_give_never_overlaps_take():
    for a in range(60, 405):
        overlap = (T.ACTION_TAKE[a] > 0) & (T.ACTION_GIVE[a] > 0)
        assert not overlap.any(), a


def test_action_kind_ranges():
    assert (T.ACTION_KIND[:12] == T.KIND_BUY).all()
    assert (T.ACTION_KIND[12:27] == T.KIND_RESERVE).all()
    assert (T.ACTION_KIND[27:30] == T.KIND_BUY_RESERVE).all()
    assert (T.ACTION_KIND[30:60] == T.KIND_GEMS).all()
    assert (T.ACTION_KIND[290:365] == T.KIND_RSVG).all()
    assert (T.ACTION_KIND[405:408] == T.KIND_NOBLE).all()
    assert T.ACTION_KIND[408] == T.KIND_PASS


def test_card_database_shape_and_counts():
    assert T.ALL_CARDS_1.shape == (5, 8, 2, 7)
    assert T.ALL_CARDS_2.shape == (5, 6, 2, 7)
    assert T.ALL_CARDS_3.shape == (5, 4, 2, 7)
    # 90 cards total in standard Splendor
    assert 5 * (8 + 6 + 4) == 90
    # each card's gain row is a one-hot color (+ points)
    for tier in (T.ALL_CARDS_1, T.ALL_CARDS_2, T.ALL_CARDS_3):
        gains = tier[:, :, 1, :5]
        assert (gains.sum(-1) == 1).all()
