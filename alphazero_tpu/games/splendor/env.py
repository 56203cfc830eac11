"""Purely functional, fixed-shape Splendor environment for TPU.

Design (vs the reference's in-place Numba jitclass, SplendorLogicNumba.py:84-775):

- The full game state is one ``(rows, 7) int8`` array with the exact row layout
  of the reference observation (SplendorLogicNumba.py:291-303), so the NN sees
  identical features and states are directly comparable in parity tests.
- Every rule is a pure function ``state -> state`` built from static gather /
  scatter index tables (see tables.py) with no data-dependent Python control
  flow, so the whole engine jits once and ``vmap``s over thousands of boards.
- Chance (hidden deck draws) is injected as explicit uniforms in ``[0,1)``:
  ``step(..., uniforms)`` consumes at most 2 of them (color pick + card pick,
  mirroring SplendorLogicNumba.py:400-420).  Search passes
  ``deterministic=True`` to collapse chance nodes exactly like the reference
  MCTS does (MCTS.py:222-237).
- Known reference WIP/bugs intentionally repaired (documented divergences):
  * ``pass`` (action 408) is a proper no-op; the reference's dispatch falls
    through to an out-of-bounds exchange (SplendorLogicNumba.py:285).
  * noble-select actions 405-407 are never legal by default (the reference's
    ``_valid_select_noble`` is unfinished, SplendorLogicNumba.py:682-683);
    ``enable_noble_select=True`` implements the intended feature properly:
    when a move makes >=2 nobles eligible the mover keeps the turn and must
    play action 405+k = "take the (k+1)-th eligible noble" (eligibility
    flags ride column 5 of the noble rows, so they canonicalize and are
    NN-observable; exactly one eligible noble still auto-awards).
  * per-player noble blocks / swaps use ``num_nobles`` rows for every player
    count (the reference hard-codes 3, correct only for 2 players;
    SplendorLogicNumba.py:219,345).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import tables as T

i32 = jnp.int32
i8 = jnp.int8


@dataclasses.dataclass(frozen=True)
class SplendorConfig:
    """Static game configuration (hashable -> usable as a jit-static arg)."""
    num_players: int = 2
    token_limit: int = 10          # NUM_TOKEN_LIMIT (handicap lever)
    enable_reserve: bool = True    # ENABLE_ACTION_RESERVE
    enable_giveback: bool = True   # ENABLE_ACTION_GIVEBACK
    # Completed version of the reference's unfinished noble-choice feature
    # (actions 405-407); see module docstring.  Off = reference behavior
    # (_give_nobles_if_earned awards every eligible noble at once).
    enable_noble_select: bool = False
    score_win: int = 15

    @property
    def num_nobles(self) -> int:
        return {2: 3, 3: 4, 4: 5}[self.num_players]

    @property
    def num_gems_in_play(self) -> int:
        return {2: 4, 3: 5, 4: 7}[self.num_players]

    @property
    def max_moves(self) -> int:
        return 62 * self.num_players

    # --- row layout (reference SplendorLogicNumba.py:291-303) ---
    @property
    def row_bank(self) -> int:
        return 0

    @property
    def row_cards(self) -> int:
        return 1                   # 24 rows: tier t slot s -> cost 1+8t+2s, gain +1

    @property
    def row_decks(self) -> int:
        return 25                  # 6 rows: tier t -> counts 25+2t, packed bits 26+2t

    @property
    def row_nobles(self) -> int:
        return 31                  # num_nobles rows

    @property
    def row_pgems(self) -> int:
        return 31 + self.num_nobles

    @property
    def row_pnobles(self) -> int:
        return self.row_pgems + self.num_players

    @property
    def row_pcards(self) -> int:
        return self.row_pnobles + self.num_players * self.num_nobles

    @property
    def row_prsv(self) -> int:
        return self.row_pcards + self.num_players

    @property
    def rows(self) -> int:
        return self.row_prsv + 6 * self.num_players

    @property
    def observation_shape(self) -> tuple[int, int]:
        return (self.rows, 7)

    @property
    def num_actions(self) -> int:
        return T.NUM_ACTIONS


# Device-resident constant tables
_KIND = jnp.asarray(T.ACTION_KIND, i32)
_PARAM = jnp.asarray(T.ACTION_PARAM, i32)
_TAKE = jnp.asarray(T.ACTION_TAKE, i32)
_GIVE = jnp.asarray(T.ACTION_GIVE, i32)
_BANK_REQ = jnp.asarray(T.ACTION_BANK_REQ, i32)
_XCLASS = jnp.asarray(T.ACTION_XCLASS, i32)
_CARDS = jnp.asarray(T.ALL_CARDS_PADDED, i8)          # [3,5,8,2,7]
_CARDS_FLAT = jnp.asarray(
    T.ALL_CARDS_PADDED.reshape(120, 2, 7), i32)       # [tier*40+color*8+idx]
_NOBLES = jnp.asarray(T.ALL_NOBLES, i8)               # [10,7]
_BUYRSV_PERM = jnp.asarray([[2, 3, 4, 5], [0, 1, 4, 5], [0, 1, 2, 3]], i32)


# ----------------------------------------------------------------------------
# Small accessors (all return int32 views).
#
# TPU note: row indices are often traced per-board values (they depend on the
# action), and under vmap a dynamic_slice at a per-board index lowers to a
# batched gather/scatter — pathologically slow on TPU.  All row access is
# therefore expressed as mask-select over the whole (rows, 7) state, which is
# tiny (<= 102 x 7 int8) and fuses into pure VPU elementwise work.
# ----------------------------------------------------------------------------
def _bank(state):
    return state[0, :5].astype(i32)


def _static_row(row):
    """True when ``row`` is a compile-time constant (Python/numpy int)."""
    return isinstance(row, (int, np.integer))


def _read_row(state, row):
    if _static_row(row):
        return state[row].astype(i32)
    m = jnp.arange(state.shape[0]) == row
    return jnp.sum(state.astype(i32) * m[:, None], axis=0)


def _read2_rows(state, row):
    if _static_row(row):
        return state[row].astype(i32), state[row + 1].astype(i32)
    r = jnp.arange(state.shape[0])
    s32 = state.astype(i32)
    r0 = jnp.sum(s32 * (r == row)[:, None], axis=0)
    r1 = jnp.sum(s32 * (r == row + 1)[:, None], axis=0)
    return r0, r1


def _player_gems(cfg, state, p):
    return _read_row(state, cfg.row_pgems + p)


def _player_cards(cfg, state, p):
    return _read_row(state, cfg.row_pcards + p)


def _set_row(state, row, values7):
    if _static_row(row):
        return state.at[row].set(values7.astype(i8))
    m = (jnp.arange(state.shape[0]) == row)[:, None]
    return jnp.where(m, values7.astype(i8)[None, :], state)


def _set2_rows(state, row, values_2x7):
    if _static_row(row):
        return state.at[row:row + 2].set(values_2x7.astype(i8))
    r = jnp.arange(state.shape[0])
    m0 = (r == row)[:, None]
    m1 = (r == row + 1)[:, None]
    vals = (m0 * values_2x7[0].astype(i32)[None]
            + m1 * values_2x7[1].astype(i32)[None])
    return jnp.where(m0 | m1, vals.astype(i8), state)


def _add_row(state, row, delta7):
    if _static_row(row):
        return state.at[row].add(delta7.astype(i8))
    m = (jnp.arange(state.shape[0]) == row)[:, None]
    return (state.astype(i32) + jnp.where(m, delta7[None, :], 0)).astype(i8)


def _const_row(table, idx):
    """Gather table[idx] for a small constant table without a gather op."""
    m = jnp.arange(table.shape[0]) == idx
    return jnp.sum(table * m.reshape((-1,) + (1,) * (table.ndim - 1)), axis=0)


# ----------------------------------------------------------------------------
# Initialization
# ----------------------------------------------------------------------------
def empty_state(cfg: SplendorConfig) -> jnp.ndarray:
    """Bank + full decks, no visible cards / nobles (reference is_fill=False)."""
    s = np.zeros(cfg.observation_shape, dtype=np.int8)
    s[0, :5] = cfg.num_gems_in_play
    s[0, 5] = 5
    for tier in range(3):
        s[cfg.row_decks + 2 * tier, :5] = T.CARDS_PER_TIER_COLOR[tier]
        s[cfg.row_decks + 2 * tier + 1, :5] = T.INIT_DECK_BITS[tier].astype(np.int8)
    return jnp.asarray(s)


def _draw_deck_card(cfg, state, tier, u0, u1):
    """Pick a random remaining card of ``tier``: color ~ per-color counts, then
    card ~ remaining bitmask (reference _get_deck_card, SplendorLogicNumba.py:
    400-420, using the same searchsorted-on-cumsum sampling so parity tests can
    inject identical uniforms).  Returns (state', card[2,7], has_card)."""
    crow = cfg.row_decks + 2 * tier
    crow_full, brow_full = _read2_rows(state, crow)
    counts = crow_full[:5]
    total = counts.sum()
    has = total > 0
    cum = jnp.cumsum(counts.astype(jnp.float32)) / jnp.maximum(total, 1).astype(jnp.float32)
    color = jnp.clip(jnp.sum((cum <= u0).astype(i32)), 0, 4)
    col_m = jnp.arange(7) == color

    byte = jnp.sum(brow_full * col_m).astype(jnp.uint8)
    shifts = (7 - jnp.arange(8)).astype(jnp.uint8)
    bits = ((byte >> shifts) & jnp.uint8(1)).astype(i32)
    nb = jnp.maximum(bits.sum(), 1)
    bcum = jnp.cumsum(bits.astype(jnp.float32)) / nb.astype(jnp.float32)
    card_idx = jnp.clip(jnp.sum((bcum <= u1).astype(i32)), 0, 7)

    new_byte = byte & (~(jnp.uint8(1) << (jnp.uint8(7) - card_idx.astype(jnp.uint8))))
    flat_idx = tier * 40 + color * 8 + card_idx
    card = _const_row(_CARDS_FLAT, flat_idx).astype(i8)      # [2, 7]

    new_crow = jnp.where(col_m, crow_full - 1, crow_full)
    new_brow = jnp.where(col_m, new_byte.astype(i8).astype(i32), brow_full)
    state2 = _set_row(state, crow, new_crow)
    state2 = _set_row(state2, crow + 1, new_brow)
    state2 = jnp.where(has, state2, state)
    return state2, card, has


def _fill_slot(cfg, state, tier, index, deterministic, u0, u1):
    """Clear tier slot and (unless deterministic) refill from the deck
    (reference _fill_new_card, SplendorLogicNumba.py:445-450)."""
    row = cfg.row_cards + 8 * tier + 2 * index
    state = _set2_rows(state, row, jnp.zeros((2, 7), i32))

    def draw(s):
        s2, card, has = _draw_deck_card(cfg, s, tier, u0, u1)
        s3 = _set2_rows(s2, row, card)
        return jnp.where(has, s3, s2)

    return jax.lax.cond(deterministic, lambda s: s, draw, state)


def init_with_uniforms(cfg: SplendorConfig, uniforms24: jnp.ndarray,
                       noble_indices: jnp.ndarray) -> jnp.ndarray:
    """Deterministic-given-randomness initializer: 24 uniforms fill the 12
    visible cards in tier-major order (reference init_game,
    SplendorLogicNumba.py:222-246); noble_indices are num_nobles distinct ids
    into the 10-noble table."""
    state = empty_state(cfg)
    k = 0
    for tier in range(3):
        for index in range(4):
            state = _fill_slot(cfg, state, tier, index, jnp.asarray(False),
                               uniforms24[k], uniforms24[k + 1])
            k += 2
    for i in range(cfg.num_nobles):
        state = _set_row(state, cfg.row_nobles + i,
                         _NOBLES[noble_indices[i]].astype(i32))
    return state


def initial_state(cfg: SplendorConfig, key: jax.Array) -> jnp.ndarray:
    ku, kn = jax.random.split(key)
    uniforms = jax.random.uniform(ku, (24,))
    nobles = jax.random.permutation(kn, 10)[: cfg.num_nobles]
    return init_with_uniforms(cfg, uniforms, nobles)


# ----------------------------------------------------------------------------
# Valid moves
# ----------------------------------------------------------------------------
def valid_moves(cfg: SplendorConfig, state: jnp.ndarray, player) -> jnp.ndarray:
    """Boolean mask over the 409 actions (reference valid_moves,
    SplendorLogicNumba.py:251-265, with all seven category kernels fused).

    ``player`` may be a Python int — keep it static when you can: every
    per-player row index then constant-folds, avoiding per-board dynamic
    slices under vmap (the canonical search/self-play paths always use 0)."""
    bank = _bank(state)
    gold_bank = state[0, 5].astype(i32)
    pg_row = _player_gems(cfg, state, player)
    pg, pgold = pg_row[:5], pg_row[5]
    tokens = pg_row[:6].sum()
    pc = _player_cards(cfg, state, player)[:5]

    # --- buy visible (0-11): _valid_buy (:476-501) ---
    costs = state[1:25:2, :5].astype(i32)                       # [12,5]
    missing = jnp.maximum(costs - pg[None] - pc[None], 0).sum(1)
    buy_ok = (missing <= pgold) & (costs.sum(1) != 0)

    # --- reserve (12-26): _valid_reserve (:508-515) ---
    deck_counts = state[cfg.row_decks:cfg.row_decks + 6:2, :5].astype(i32)  # [3,5]
    not_empty15 = jnp.concatenate([costs.sum(1) != 0, deck_counts.sum(1) != 0])
    rsv_base = cfg.row_prsv + 6 * player
    rsv_rows = jax.lax.dynamic_slice(state, (rsv_base, 0), (6, 7)).astype(i32)
    slot_free = rsv_rows[5, :5].sum() == 0          # 3rd slot's gain row empty
    rsv_nolimit = not_empty15 & slot_free
    rsv_gate = jnp.asarray(cfg.enable_reserve) & ~((tokens == cfg.token_limit) & (gold_bank > 0))
    rsv_ok = rsv_nolimit & rsv_gate

    # --- buy reserved (27-29): _valid_buy_reserve (:538-552) ---
    rcosts = rsv_rows[0:6:2, :5]                                # [3,5]
    rmissing = jnp.maximum(rcosts - pg[None] - pc[None], 0).sum(1)
    buyrsv_ok = (rmissing <= pgold) & (rcosts.sum(1) != 0)

    # --- plain takes (30-59): _valid_get_gems(+identical) (:562-583) ---
    bank_ok_all = (bank[None, :] >= _BANK_REQ).all(1)           # [409]
    give_ok_all = (pg[None, :] >= _GIVE).all(1)                 # [409]
    take_sum = _TAKE.sum(1)                                     # [409]
    take_ok = bank_ok_all[30:60] & (tokens + take_sum[30:60] <= cfg.token_limit)
    nz_bank = jnp.count_nonzero(bank).astype(i32)
    allow_take1 = (tokens == 9) | (nz_bank == 1)
    allow_take2d = (tokens == 8) | (nz_bank == 2)
    take_ok = take_ok.at[0:5].set(take_ok[0:5] & allow_take1)
    take_ok = take_ok.at[5:15].set(take_ok[5:15] & allow_take2d)

    # --- exchanges (60-404): _valid_exchange (:615-680) ---
    L = cfg.token_limit
    xclass_now = jnp.where(tokens == L - 2, T.XC_LM2,
                           jnp.where(tokens == L - 1, T.XC_LM1, T.XC_ELSE))
    ex_gate = (tokens > 7) & jnp.asarray(cfg.enable_giveback)
    ex_ok = (_XCLASS == xclass_now) & bank_ok_all & give_ok_all & ex_gate
    # reserve+give (290-364): reserve validity (no limit) + bank gold
    slot15 = _PARAM[T.A_RSVG:T.A_T3G3]
    rsvg_ok = (ex_ok[T.A_RSVG:T.A_T3G3] & rsv_nolimit[slot15] & (gold_bank > 0))
    ex_ok = jax.lax.dynamic_update_slice(ex_ok, rsvg_ok, (T.A_RSVG,))

    valid = jnp.zeros(T.NUM_ACTIONS, jnp.bool_)
    valid = valid.at[0:12].set(buy_ok)
    valid = valid.at[12:27].set(rsv_ok)
    valid = valid.at[27:30].set(buyrsv_ok)
    valid = valid.at[30:60].set(take_ok)
    valid = valid.at[60:405].set(ex_ok[60:405])
    if cfg.enable_noble_select:
        # pending noble choice: only "select the (k+1)-th eligible noble"
        # actions are legal (module docstring); k over at most 3 choices
        flags = state[cfg.row_nobles:cfg.row_nobles + cfg.num_nobles, 5]
        n_elig = flags.astype(i32).sum()
        sel = jnp.zeros(T.NUM_ACTIONS, jnp.bool_)
        for k in range(T.A_PASS - T.A_NOBLE):
            sel = sel.at[T.A_NOBLE + k].set(k < n_elig)
        valid = jnp.where(n_elig > 0, sel, valid)
    # noble-select 405-407 otherwise: disabled (reference WIP);
    # pass iff nothing else
    valid = valid.at[T.A_PASS].set(~valid[:T.A_PASS].any())
    return valid


# ----------------------------------------------------------------------------
# Move application
# ----------------------------------------------------------------------------
def _award_nobles(cfg, state, player):
    """Give every noble whose requirement the player now meets (reference
    _give_nobles_if_earned, SplendorLogicNumba.py:763-768).

    With ``enable_noble_select``: >=2 eligible nobles set the pending-choice
    flags (column 5 of the noble rows) instead of awarding — the mover must
    then play a noble-select action (405-407)."""
    pc = _player_cards(cfg, state, player)[:5]
    if cfg.enable_noble_select:
        eligible = jnp.stack([
            (state[cfg.row_nobles + i, :5].astype(i32).sum() > 0)
            & (pc >= state[cfg.row_nobles + i, :5].astype(i32)).all()
            for i in range(cfg.num_nobles)])
        flagged = state
        for i in range(cfg.num_nobles):
            flagged = flagged.at[cfg.row_nobles + i, 5].set(
                eligible[i].astype(i8))
        awarded_all = _award_nobles(
            dataclasses.replace(cfg, enable_noble_select=False), state, player)
        return jnp.where(eligible.sum() >= 2, flagged, awarded_all)
    for i in range(cfg.num_nobles):
        noble = state[cfg.row_nobles + i].astype(i32)
        earned = (noble[:5].sum() > 0) & (pc >= noble[:5]).all()
        dst = cfg.row_pnobles + cfg.num_nobles * player + i
        awarded = _set_row(_set_row(state, dst, noble),
                           cfg.row_nobles + i, jnp.zeros(7, i32))
        state = jnp.where(earned, awarded, state)
    return state


def _pay_and_gain(cfg, state, cost7, gain7, player):
    """Pay for a card (auto gold for missing colors) and add its gain row
    (reference _buy_card, SplendorLogicNumba.py:458-474)."""
    cost = cost7[:5].astype(i32)
    pg_row = _player_gems(cfg, state, player)
    pg = pg_row[:5]
    pc = _player_cards(cfg, state, player)[:5]
    missing = jnp.maximum(cost - pg - pc, 0).sum()
    paid = jnp.minimum(jnp.maximum(cost - pc, 0), pg)

    pg_new = pg_row.at[:5].add(-paid).at[5].add(-missing)
    state = _set_row(state, cfg.row_pgems + player, pg_new)
    bank_delta = jnp.zeros(7, i32).at[:5].set(paid).at[5].set(missing)
    state = _add_row(state, 0, bank_delta)
    state = _add_row(state, cfg.row_pcards + player, gain7.astype(i32))
    return _award_nobles(cfg, state, player)


def _first_empty_reserve_row(cfg, state, player):
    rsv_base = cfg.row_prsv + 6 * player
    rows = jax.lax.dynamic_slice(state, (rsv_base, 0), (6, 7)).astype(i32)
    empty = rows[0:6:2, :5].sum(1) == 0                          # [3]
    slot = jnp.argmax(empty)                                     # first empty
    return rsv_base + 2 * slot


def _do_reserve(cfg, state, slot15, player, deterministic, u0, u1):
    """Reserve visible card or from deck + take gold if any (reference
    _reserve, SplendorLogicNumba.py:517-536)."""
    er = _first_empty_reserve_row(cfg, state, player)

    def visible(s):
        row = cfg.row_cards + 2 * slot15
        card = jnp.stack(_read2_rows(s, row))
        s = _set2_rows(s, er, card)
        return _fill_slot(cfg, s, slot15 // 4, slot15 % 4, deterministic, u0, u1)

    def from_deck(s):
        def draw(s):
            s2, card, has = _draw_deck_card(cfg, s, slot15 - 12, u0, u1)
            s3 = _set2_rows(s2, er, card)
            return jnp.where(has, s3, s2)
        return jax.lax.cond(deterministic, lambda x: x, draw, s)

    state = jax.lax.cond(slot15 < 12, visible, from_deck, state)

    has_gold = state[0, 5].astype(i32) > 0
    take_gold = jnp.where(has_gold, 1, 0)
    state = _add_row(state, 0, jnp.zeros(7, i32).at[5].set(-take_gold))
    state = _add_row(state, cfg.row_pgems + player,
                     jnp.zeros(7, i32).at[5].set(take_gold))
    return state


def step(cfg: SplendorConfig, state: jnp.ndarray, action, player,
         uniforms: jnp.ndarray, deterministic) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply ``action`` for ``player``; returns (state', next_player).

    ``uniforms`` is shape (2,) — consumed only if a hidden card is revealed.
    ``deterministic=True`` collapses chance exactly like the reference search
    path (empty slots stay empty).  Mirrors make_move
    (SplendorLogicNumba.py:267-289) with the dispatch flattened via
    tables.ACTION_KIND."""
    action = jnp.asarray(action, i32)
    deterministic = jnp.asarray(deterministic, jnp.bool_)
    u0, u1 = uniforms[0], uniforms[1]
    act_m = jnp.arange(T.NUM_ACTIONS) == action
    kind = jnp.sum(_KIND * act_m)
    param = jnp.sum(_PARAM * act_m)
    take = jnp.sum(_TAKE * act_m[:, None], axis=0)
    give = jnp.sum(_GIVE * act_m[:, None], axis=0)

    def k_buy(s):
        cost, gain = _read2_rows(s, cfg.row_cards + 2 * param)
        s = _pay_and_gain(cfg, s, cost, gain, player)
        return _fill_slot(cfg, s, param // 4, param % 4, deterministic, u0, u1)

    def k_reserve(s):
        return _do_reserve(cfg, s, param, player, deterministic, u0, u1)

    def k_buy_reserve(s):
        base = cfg.row_prsv + 6 * player
        cost, gain = _read2_rows(s, base + 2 * param)
        s = _pay_and_gain(cfg, s, cost, gain, player)
        # compact remaining reserved cards (reference _buy_reserve :554-560)
        block = jax.lax.dynamic_slice(s, (base, 0), (6, 7)).astype(i32)
        kept = jnp.where(param == 0, block[jnp.array([2, 3, 4, 5])],
                         jnp.where(param == 1, block[jnp.array([0, 1, 4, 5])],
                                   block[jnp.array([0, 1, 2, 3])]))
        new_block = jnp.concatenate([kept, jnp.zeros((2, 7), i32)], 0).astype(i8)
        return jax.lax.dynamic_update_slice(s, new_block, (base, 0))

    def k_gems(s):
        delta = take - give
        s = _add_row(s, cfg.row_pgems + player, jnp.zeros(7, i32).at[:5].set(delta))
        return _add_row(s, 0, jnp.zeros(7, i32).at[:5].set(-delta))

    def k_rsvg(s):
        s = _do_reserve(cfg, s, param, player, deterministic, u0, u1)
        s = _add_row(s, cfg.row_pgems + player, jnp.zeros(7, i32).at[:5].set(-give))
        return _add_row(s, 0, jnp.zeros(7, i32).at[:5].set(give))

    def k_noop(s):
        return s

    def k_noble(s):
        # award the (k+1)-th flagged noble, clear every pending flag
        k = action - T.A_NOBLE
        flags = s[cfg.row_nobles:cfg.row_nobles + cfg.num_nobles, 5].astype(i32)
        cum = jnp.cumsum(flags)
        hit = (flags > 0) & (cum == k + 1)
        for i in range(cfg.num_nobles):
            noble = s[cfg.row_nobles + i].astype(i32).at[5].set(0)
            dst = cfg.row_pnobles + cfg.num_nobles * player + i
            taken = _set_row(_set_row(s, dst, noble),
                             cfg.row_nobles + i, jnp.zeros(7, i32))
            s = jnp.where(hit[i], taken, s)
            s = s.at[cfg.row_nobles + i, 5].set(0)
        return s

    state = jax.lax.switch(kind, [k_buy, k_reserve, k_buy_reserve, k_gems,
                                  k_rsvg,
                                  k_noble if cfg.enable_noble_select else k_noop,
                                  k_noop], state)
    if cfg.enable_noble_select:
        # a pending noble choice keeps the turn with the mover and defers
        # the round-counter tick to the completed turn
        pend = state[cfg.row_nobles:cfg.row_nobles + cfg.num_nobles, 5]\
            .astype(i32).sum() > 0
        adv = jnp.where(pend, 0, 1)
        state = state.at[0, 6].add(adv.astype(i8))
        next_player = (player + adv) % cfg.num_players
    else:
        state = state.at[0, 6].add(1)  # round counter, int8 wrap like reference
        next_player = (player + 1) % cfg.num_players
    return state, next_player


# ----------------------------------------------------------------------------
# Scores / termination / canonicalization
# ----------------------------------------------------------------------------
def get_score(cfg: SplendorConfig, state: jnp.ndarray, player) -> jnp.ndarray:
    card_pts = _player_cards(cfg, state, player)[6]
    base = cfg.row_pnobles + cfg.num_nobles * player
    nob = jax.lax.dynamic_slice(state, (base, 0), (cfg.num_nobles, 7)).astype(i32)
    return card_pts + nob[:, 6].sum()


def get_round(cfg: SplendorConfig, state: jnp.ndarray) -> jnp.ndarray:
    return state[0, 6].astype(jnp.uint8).astype(i32)


def all_scores(cfg: SplendorConfig, state: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([get_score(cfg, state, p) for p in range(cfg.num_players)])


def judge(cfg: SplendorConfig, state: jnp.ndarray) -> jnp.ndarray:
    """Unconditional winner vector by score with the card-count tiebreak
    (reference judge, SplendorLogicNumba.py:306-334) — used to settle games
    cut off at a move cap regardless of the turn-boundary gate."""
    n = cfg.num_players
    scores = all_scores(cfg, state)
    score_max = scores.max()
    num_cards = jnp.stack(
        [_player_cards(cfg, state, p)[:5].sum() for p in range(n)])
    single = (scores == score_max).sum() == 1
    simple_winners = jnp.where(scores == score_max, 1.0, -1.0)
    masked = jnp.where(scores < score_max, 999, num_cards)
    mmin = masked.min()
    min_ids = masked == mmin
    tie_val = jnp.where(min_ids.sum() > 1, 0.01, 1.0)
    tiebreak_winners = jnp.where(min_ids, tie_val, -1.0)
    return jnp.where(single, simple_winners, tiebreak_winners).astype(jnp.float32)


def check_end_game(cfg: SplendorConfig, state: jnp.ndarray) -> jnp.ndarray:
    """Per-player outcome vector; zeros while the game is running (reference
    check_end_game + judge, SplendorLogicNumba.py:306-334)."""
    n = cfg.num_players
    rnd = get_round(cfg, state)
    scores = all_scores(cfg, state)
    at_turn_boundary = (rnd % n) == 0
    over = (scores.max() >= cfg.score_win) | (rnd >= cfg.max_moves)
    winners = judge(cfg, state)
    return jnp.where(at_turn_boundary & over, winners, jnp.zeros(n, jnp.float32))


def swap_players(cfg: SplendorConfig, state: jnp.ndarray, nb_swaps) -> jnp.ndarray:
    """Rotate seats so player ``nb_swaps`` becomes player 0 (reference
    swap_players, SplendorLogicNumba.py:338-347, with the noble-block roll
    generalized to num_nobles rows)."""
    n = cfg.num_players
    k = jnp.asarray(nb_swaps, i32)

    def roll_block(s, start, rows_total, rows_per_player):
        block = jax.lax.dynamic_slice(s, (start, 0), (rows_total, 7))
        rolled = jnp.roll(block, -rows_per_player * k, axis=0)
        return jax.lax.dynamic_update_slice(s, rolled, (start, 0))

    state = roll_block(state, cfg.row_pgems, n, 1)
    state = roll_block(state, cfg.row_pnobles, n * cfg.num_nobles, cfg.num_nobles)
    state = roll_block(state, cfg.row_pcards, n, 1)
    state = roll_block(state, cfg.row_prsv, 6 * n, 6)
    return state


# ----------------------------------------------------------------------------
# Jitted, vmapped entry points
# ----------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnums=0)
def valid_moves_jit(cfg, state, player):
    return valid_moves(cfg, state, player)


@functools.partial(jax.jit, static_argnums=0)
def step_jit(cfg, state, action, player, uniforms, deterministic):
    return step(cfg, state, action, player, uniforms, deterministic)


@functools.partial(jax.jit, static_argnums=0)
def initial_state_jit(cfg, key):
    return initial_state(cfg, key)


@functools.partial(jax.jit, static_argnums=0)
def check_end_game_jit(cfg, state):
    return check_end_game(cfg, state)


@functools.partial(jax.jit, static_argnums=0)
def swap_players_jit(cfg, state, k):
    return swap_players(cfg, state, k)


def vmapped(fn, cfg, *vmap_args, **jit_kwargs):
    """vmap ``fn(cfg, ...)`` over the leading batch axis of its array args."""
    return jax.jit(jax.vmap(functools.partial(fn, cfg), *vmap_args), **jit_kwargs)
