"""Run the LITERAL reference engine (/root/reference/SplendorLogicNumba.py)
in-place as a parity oracle (BASELINE config 1: exact state/return parity vs
the actual reference Board, not just the repo's independent oracle).

Nothing is copied into the repo: the module is loaded from the read-only
snapshot with numba stubbed to identity and exactly two repairs applied
textually at load time, both for known WIP breakage in the snapshot:

1. ``_valid_select_noble`` (SplendorLogicNumba.py:682-683) is an unfinished
   function (literal syntax error: ``def _valid_select_noble(player): if``).
   It is replaced by a stub returning "no valid noble-select actions", which
   is the behavior the rest of the snapshot assumes (make_move cannot handle
   moves 405-407 either, :285, so they must never validate).
2. The package-relative ``from .SplendorLogic import ...`` (:1-3) is pointed
   at the in-place-loaded SplendorLogic module (the snapshot is a flattened
   package, SURVEY §0).

Chance parity: the reference draws via ``my_random_choice`` =
searchsorted(cumsum(prob), np.random.random()) (:38-41).  The loader swaps
in a seed-compatible shim that pops injected uniforms from a FIFO, so the
JAX env (which consumes the SAME uniforms through its own
searchsorted-on-cumsum draw, env.py:_draw_deck_card) must reproduce every
hidden deck draw bit-for-bit."""

from __future__ import annotations

import importlib.util
import os
import re
import sys
import types
from collections import deque

import numpy as np

REF_DIR = "/root/reference"
_BROKEN_FN = re.compile(
    r"\tdef _valid_select_noble\(player\):\n\t\tif[ \t]*\n")
_REPAIRED_FN = (
    "\tdef _valid_select_noble(self, player):\n"
    "\t\t# [repair 1] unfinished in the snapshot; noble-select moves are\n"
    "\t\t# unplayable (make_move :285 cannot dispatch them), so none valid\n"
    "\t\treturn np.zeros(3, dtype=np.bool_)\n")


def reference_available() -> bool:
    return os.path.exists(os.path.join(REF_DIR, "SplendorLogicNumba.py"))


def _numba_stub():
    numba = types.ModuleType("numba")

    class _AnyType:
        def __getitem__(self, key):          # numba.int8[:, :] in the spec
            return self

    for name in ("int8", "uint8", "int32", "int64", "float32", "float64",
                 "bool_"):
        setattr(numba, name, _AnyType())

    def njit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(f):
            return f
        return deco

    numba.njit = njit
    experimental = types.ModuleType("numba.experimental")
    experimental.jitclass = lambda spec: (lambda cls: cls)
    numba.experimental = experimental
    return numba


def load_reference_engine():
    """Returns the executed SplendorLogicNumba module namespace with a
    ``_uniform_fifo`` deque attached: push uniforms before any call that
    draws from a deck; ``my_random_choice`` consumes them in order."""
    if "numba" not in sys.modules or not hasattr(
            sys.modules["numba"], "experimental"):
        sys.modules["numba"] = _numba_stub()

    logic_name = "SplendorLogic_ref"
    if logic_name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            logic_name, os.path.join(REF_DIR, "SplendorLogic.py"))
        logic = importlib.util.module_from_spec(spec)
        sys.modules[logic_name] = logic
        spec.loader.exec_module(logic)

    with open(os.path.join(REF_DIR, "SplendorLogicNumba.py")) as f:
        src = f.read()
    # [repair 2] flattened-package import
    src = src.replace("from .SplendorLogic import",
                      f"from {logic_name} import")
    # numpy-2 compat shim (np.bool8 alias removed upstream; :54)
    src = src.replace("np.bool8", "np.bool_")
    # [repair 3] make_move (:267-289) has no dispatch for moves 405-408:
    # noble-select (WIP) and pass fall into the final exchange branch with an
    # out-of-range give_ids3 index (silent OOB read under numba's unchecked
    # indexing, IndexError under numpy).  Pass is a legal mask entry
    # (valid_moves :263) and must be a state no-op; noble-select never
    # validates (repair 1).
    # [repair 4] get_score (:219) reads noble points with a hardcoded
    # 3-rows-per-player stride, but nobles are STORED num_nobles-strided
    # (_give_nobles_if_earned :767, copy_state :301) — internally
    # inconsistent for 3P/4P (num_nobles = 4/5), consistent for 2P.  Use the
    # storage stride, which is what the env implements.
    broken_score = ("\t\tnoble_points = self.players_nobles"
                    "[player*3:player*3+3, idx_points].sum()\n")
    repaired_score = (
        "\t\tnoble_points = self.players_nobles"
        "[player*self.num_nobles:(player+1)*self.num_nobles,"
        " idx_points].sum()\n")
    assert src.count(broken_score) == 1, "snapshot get_score layout changed"
    src = src.replace(broken_score, repaired_score)
    broken_else = ("\t\telse: #365-404\n"
                   "\t\t\tself._give_and_get_gems(move-60, player)\n")
    repaired_else = ("\t\telif move < 405: #365-404\n"
                     "\t\t\tself._give_and_get_gems(move-60, player)\n"
                     "\t\t# else: 405-407 noble-select (WIP) / 408 pass: no-op\n")
    assert src.count(broken_else) == 1, "snapshot make_move layout changed"
    src = src.replace(broken_else, repaired_else)
    src, n_sub = _BROKEN_FN.subn(_REPAIRED_FN, src)
    assert n_sub == 1, "snapshot layout changed: broken fn not found"

    mod = types.ModuleType("SplendorLogicNumba_ref")
    mod.__file__ = os.path.join(REF_DIR, "SplendorLogicNumba.py")
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)

    fifo = deque()

    def my_random_choice_injected(prob):
        u = fifo.popleft()
        return int(np.searchsorted(np.cumsum(prob), u, side="right"))

    mod.my_random_choice = my_random_choice_injected
    mod._uniform_fifo = fifo

    # numba truncates on int8 narrowing; NumPy 2 raises instead.  The packed
    # deck bitmask legitimately uses all 8 bits (e.g. 255 == 8 cards left),
    # so emulate the compiled semantics: wrap to int8 range.
    orig_packbits = mod.my_packbits

    def my_packbits_wrapping(array):
        return np.uint8(int(orig_packbits(array)) & 0xFF).astype(np.int8)

    mod.my_packbits = my_packbits_wrapping
    return mod


def make_reference_board(mod, num_players: int, nobles: np.ndarray,
                         u24: np.ndarray, token_limit: int = 10):
    """Construct + init a reference Board with injected randomness: ``u24``
    feeds the 12 initial visible-card draws (2 uniforms each, fill order
    tier-major as init_game :237-239), ``nobles`` the noble indices
    (np.random.choice at :241 is patched for the call)."""
    mod._uniform_fifo.clear()
    mod._uniform_fifo.extend(np.asarray(u24, np.float64))
    real_choice = np.random.choice
    np.random.choice = lambda *a, **k: np.asarray(nobles)
    try:
        board = mod.Board(num_players)      # __init__ runs init_game (:212)
    finally:
        np.random.choice = real_choice
    assert not mod._uniform_fifo, "init consumed fewer uniforms than injected"
    board.NUM_TOKEN_LIMIT = token_limit
    return board
