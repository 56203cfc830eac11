"""De-circularized action-table validation: parse the REFERENCE source
(`SplendorLogicNumba.py:100-210`, `SplendorLogic.py:250-473`) and check our
`tables.py` encodings against it entry by entry.

tests/test_tables.py validates internal consistency; this file breaks the
circularity flagged in round 1 (the 345-exchange-action semantics were
encoded exactly once): the expected take/give vector of every action is
rebuilt here from the parsed reference tables and the reference's
`_give_and_get_gems` index arithmetic (SplendorLogicNumba.py:697-755), so a
transcription error in GIVE_IDS / GIVE_IDS3 / T1G1_GIVE / ACTION_* now fails
loudly.  Mutating any single GIVE_IDS entry fails these tests."""

import ast
import itertools
import os

import numpy as np
import pytest

from alphazero_tpu.games.splendor import tables as T

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference snapshot not available")


def _read(name):
    with open(os.path.join(REF, name)) as f:
        return f.read()


def _parse_bracketed(text: str, anchor: str):
    """ast.literal_eval the bracket-balanced list starting right after
    ``anchor``."""
    i = text.index(anchor)
    start = text.index("[", i)
    depth = 0
    for j in range(start, len(text)):
        if text[j] == "[":
            depth += 1
        elif text[j] == "]":
            depth -= 1
            if depth == 0:
                return ast.literal_eval(text[start:j + 1])
    raise ValueError(f"unbalanced brackets after {anchor!r}")


@pytest.fixture(scope="module")
def ref_tables():
    numba_src = _read("SplendorLogicNumba.py")
    logic_src = _read("SplendorLogic.py")
    return {
        "give_ids": np.array(_parse_bracketed(numba_src,
                                              "self.give_ids = np.array(")),
        "give_ids3": np.array(_parse_bracketed(numba_src,
                                               "self.give_ids3 = np.array(")),
        "nobles": np.array(_parse_bracketed(logic_src, "all_nobles = [")),
        "cards": [np.array(_parse_bracketed(logic_src, f"all_cards_{t} = ["))
                  for t in (1, 2, 3)],
    }


def test_give_ids_match_reference(ref_tables):
    np.testing.assert_array_equal(np.asarray(T.GIVE_IDS, np.int64),
                                  ref_tables["give_ids"])
    np.testing.assert_array_equal(np.asarray(T.GIVE_IDS3, np.int64),
                                  ref_tables["give_ids3"])


def test_card_and_noble_data_match_reference(ref_tables):
    np.testing.assert_array_equal(np.asarray(T.ALL_NOBLES, np.int64),
                                  ref_tables["nobles"])
    for t, (ours, theirs) in enumerate(
            zip((T.ALL_CARDS_1, T.ALL_CARDS_2, T.ALL_CARDS_3),
                ref_tables["cards"])):
        np.testing.assert_array_equal(np.asarray(ours, np.int64), theirs,
                                      err_msg=f"tier {t + 1}")


# --------------------------------------------------------------------------
# Independent reconstruction of every action's take/give vector from the
# parsed reference tables + the reference's documented index arithmetic
# (SplendorLogicNumba.py:697-755 `_give_and_get_gems`, :586 `_get_gems`,
# :694 `_give_gems`, SplendorLogic.py:250-255 combination generator).
# --------------------------------------------------------------------------
def _diff_combos(max_n):
    singles = [np.eye(5, dtype=np.int64)[c] for c in range(5)]
    rows = []
    for k in range(1, max_n + 1):
        rows += [sum(c) for c in itertools.combinations(singles, k)]
    return np.array(rows)


DIFF3 = _diff_combos(3)       # 25 rows (take ids 0-24; 25-29 = 2 identical)
DIFF2 = _diff_combos(2)       # 15 rows (give ids 0-14; 15-19 = 2 identical)


def _take_vec(i):
    if i < 25:
        return DIFF3[i]
    v = np.zeros(5, np.int64)
    v[i - 25] = 2
    return v


def _give_vec(j):
    if j < 15:
        return DIFF2[j]
    v = np.zeros(5, np.int64)
    v[j - 15] = 2
    return v


def _expected_exchange(i, give_ids, give_ids3):
    """(take5, give5, is_reserve_and_give, reserve_slot) for exchange index
    i in 0..344 (action 60+i)."""
    if i < 20:
        g = give_ids[0]
        return _take_vec(15 + i // 2), _give_vec(g[i // 2][i % 2]), False, -1
    if i < 50:
        i -= 20
        g = give_ids[1]
        return _take_vec(15 + i // 3), _give_vec(g[i // 3][i % 3]), False, -1
    if i < 110:
        i -= 50
        g = give_ids[2]
        return _take_vec(5 + i // 6), _give_vec(g[i // 6][i % 6]), False, -1
    if i < 160:
        i -= 110
        g = give_ids[3]
        return _take_vec(25 + i // 10), _give_vec(g[i // 10][i % 10]), False, -1
    if i < 190:
        i -= 160
        g = give_ids[4]
        return _take_vec(5 + i // 3), _give_vec(g[i // 3][i % 3]), False, -1
    if i < 210:
        i -= 190
        g = give_ids[5]
        return _take_vec(25 + i // 4), _give_vec(g[i // 4][i % 4]), False, -1
    if i < 230:
        i -= 210
        t1g1 = np.array([1, 2, 3, 4, 0, 2, 3, 4, 0, 1, 3, 4,
                         0, 1, 2, 4, 0, 1, 2, 3])        # reference :747
        return _take_vec(i // 4), _give_vec(t1g1[i]), False, -1
    if i < 305:
        i -= 230
        return np.zeros(5, np.int64), _give_vec(i % 5), True, i // 5
    i -= 305
    tid, g1, g2 = give_ids3[i]
    return _take_vec(15 + tid), _give_vec(g1) + _give_vec(g2), False, -1


def test_plain_take_vectors(ref_tables):
    for i in range(30):
        np.testing.assert_array_equal(
            np.asarray(T.ACTION_TAKE[30 + i, :5], np.int64), _take_vec(i),
            err_msg=f"take action {30 + i}")


def test_exchange_take_give_vectors(ref_tables):
    give_ids = ref_tables["give_ids"]
    give_ids3 = ref_tables["give_ids3"]
    for i in range(345):
        a = 60 + i
        take, give, is_rsvg, slot = _expected_exchange(i, give_ids, give_ids3)
        np.testing.assert_array_equal(
            np.asarray(T.ACTION_TAKE[a, :5], np.int64), take,
            err_msg=f"take of action {a}")
        np.testing.assert_array_equal(
            np.asarray(T.ACTION_GIVE[a, :5], np.int64), give,
            err_msg=f"give of action {a}")
        assert (T.ACTION_KIND[a] == T.KIND_RSVG) == is_rsvg, a
        if is_rsvg:
            assert int(T.ACTION_PARAM[a]) == slot, a


def test_exchange_class_partition():
    """Token-count gating (reference _valid_exchange branch structure,
    SplendorLogicNumba.py:615-680): 8 tokens -> 3take1give only; 9 tokens ->
    3take2give + 2take1give groups; 10 tokens -> everything else."""
    xc = np.asarray(T.ACTION_XCLASS)
    assert (xc[60:80] == T.XC_LM2).all()
    assert (xc[80:110] == T.XC_LM1).all()
    assert (xc[220:270] == T.XC_LM1).all()
    assert (xc[110:220] == T.XC_ELSE).all()
    assert (xc[270:405] == T.XC_ELSE).all()


def test_bank_requirements():
    """Takes need the taken gems in the bank; 2-identical takes need >= 4 of
    that color (reference _valid_get_gems_identical :578-583)."""
    for a in range(30, 405):
        take = np.asarray(T.ACTION_TAKE[a, :5], np.int64)
        exp = np.where(take == 2, 4, take)
        np.testing.assert_array_equal(
            np.asarray(T.ACTION_BANK_REQ[a, :5], np.int64), exp,
            err_msg=f"bank req of action {a}")
