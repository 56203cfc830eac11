"""Independent plain-numpy Splendor rules oracle.

A deliberately simple, loop-based reimplementation of the Splendor rules with
the same state layout, action encoding and injected-uniform chance protocol as
``alphazero_tpu.games.splendor.env``.  Used ONLY by tests as a cross-check:
the JAX env is table-driven and vectorized; this oracle is written
straight-line from the rules (reference semantics documented in
SplendorLogicNumba.py) so implementation bugs are unlikely to coincide.

State: (32 + 10n + n*n, 7) int8, rows as in env.py.
"""

from __future__ import annotations

import numpy as np

from alphazero_tpu.games.splendor import tables as T


class OracleBoard:
    def __init__(self, num_players=2, token_limit=10,
                 enable_reserve=True, enable_giveback=True):
        self.n = num_players
        self.token_limit = token_limit
        self.enable_reserve = enable_reserve
        self.enable_giveback = enable_giveback
        self.num_nobles = {2: 3, 3: 4, 4: 5}[num_players]
        self.num_gems = {2: 4, 3: 5, 4: 7}[num_players]
        self.max_moves = 62 * num_players
        self.score_win = 15
        n, nn = self.n, self.num_nobles
        self.R_BANK = 0
        self.R_CARDS = 1
        self.R_DECKS = 25
        self.R_NOBLES = 31
        self.R_PGEMS = 31 + nn
        self.R_PNOB = self.R_PGEMS + n
        self.R_PCARDS = self.R_PNOB + n * nn
        self.R_PRSV = self.R_PCARDS + n
        self.rows = self.R_PRSV + 6 * n
        self.state = np.zeros((self.rows, 7), dtype=np.int8)

    # ------------------------------------------------------------------ setup
    def reset_empty(self):
        self.state[:] = 0
        self.state[0, :5] = self.num_gems
        self.state[0, 5] = 5
        for t in range(3):
            cnt = int(T.CARDS_PER_TIER_COLOR[t])
            self.state[self.R_DECKS + 2 * t, :5] = cnt
            self.state[self.R_DECKS + 2 * t + 1, :5] = np.int8(
                np.uint8(T.INIT_DECK_BITS[t]))

    def init_with(self, uniforms24, noble_indices):
        self.reset_empty()
        k = 0
        for t in range(3):
            for s in range(4):
                self._fill_slot(t, s, False, uniforms24[k], uniforms24[k + 1])
                k += 2
        for i, idx in enumerate(noble_indices):
            self.state[self.R_NOBLES + i] = T.ALL_NOBLES[idx]

    # ------------------------------------------------------------ deck draws
    def _deck_counts(self, t):
        return self.state[self.R_DECKS + 2 * t, :5].astype(np.int64)

    def _draw(self, t, u0, u1):
        counts = self._deck_counts(t)
        total = counts.sum()
        if total == 0:
            return None
        cum = np.cumsum(counts.astype(np.float32)) / np.float32(total)
        color = min(int(np.sum(cum <= np.float32(u0))), 4)
        byte = np.uint8(self.state[self.R_DECKS + 2 * t + 1, color])
        bits = np.array([(byte >> (7 - i)) & 1 for i in range(8)], np.int64)
        bcum = np.cumsum(bits.astype(np.float32)) / np.float32(bits.sum())
        ci = min(int(np.sum(bcum <= np.float32(u1))), 7)
        byte = np.uint8(byte & ~np.uint8(1 << (7 - ci)))
        self.state[self.R_DECKS + 2 * t + 1, color] = np.int8(byte)
        self.state[self.R_DECKS + 2 * t, color] -= 1
        return np.array(T.ALL_CARDS_PADDED[t, color, ci])

    def _fill_slot(self, t, s, deterministic, u0=0.0, u1=0.0):
        row = self.R_CARDS + 8 * t + 2 * s
        self.state[row:row + 2] = 0
        if not deterministic:
            card = self._draw(t, u0, u1)
            if card is not None:
                self.state[row:row + 2] = card

    # ------------------------------------------------------------- accessors
    def gems(self, p):
        return self.state[self.R_PGEMS + p]

    def cards(self, p):
        return self.state[self.R_PCARDS + p]

    def reserved(self, p):
        return self.state[self.R_PRSV + 6 * p:self.R_PRSV + 6 * p + 6]

    def tokens(self, p):
        return int(self.gems(p)[:6].astype(np.int64).sum())

    def score(self, p):
        nob = self.state[self.R_PNOB + self.num_nobles * p:
                         self.R_PNOB + self.num_nobles * (p + 1)]
        return int(self.cards(p)[6]) + int(nob[:, 6].astype(np.int64).sum())

    # ------------------------------------------------------------ valid moves
    def valid_moves(self, p):
        v = np.zeros(409, dtype=bool)
        gems = self.gems(p)[:5].astype(np.int64)
        gold = int(self.gems(p)[5])
        cards = self.cards(p)[:5].astype(np.int64)
        bank = self.state[0, :5].astype(np.int64)
        bank_gold = int(self.state[0, 5])
        tok = self.tokens(p)

        def can_afford(cost):
            missing = np.maximum(cost - gems - cards, 0).sum()
            return missing <= gold

        # buy visible
        for a in range(12):
            cost = self.state[1 + 2 * a, :5].astype(np.int64)
            v[a] = cost.sum() > 0 and can_afford(cost)

        # reserve
        rsv = self.reserved(p)
        slot_free = rsv[5, :5].sum() == 0
        rsv_nolimit = np.zeros(15, dtype=bool)
        for i in range(12):
            rsv_nolimit[i] = self.state[1 + 2 * i, :5].sum() > 0 and slot_free
        for t in range(3):
            rsv_nolimit[12 + t] = self._deck_counts(t).sum() > 0 and slot_free
        rsv_allowed = self.enable_reserve and not (tok == self.token_limit and bank_gold > 0)
        if rsv_allowed:
            v[12:27] = rsv_nolimit

        # buy reserved
        for i in range(3):
            cost = rsv[2 * i, :5].astype(np.int64)
            v[27 + i] = cost.sum() > 0 and can_afford(cost)

        # plain takes
        nz_bank = int(np.count_nonzero(bank))
        for a in range(30, 60):
            take = T.ACTION_TAKE[a].astype(np.int64)
            req = T.ACTION_BANK_REQ[a].astype(np.int64)
            ok = (bank >= req).all() and tok + take.sum() <= self.token_limit
            if 30 <= a < 35 and not (tok == 9 or nz_bank == 1):
                ok = False
            if 35 <= a < 45 and not (tok == 8 or nz_bank == 2):
                ok = False
            v[a] = ok

        # exchanges
        if self.enable_giveback and tok > 7:
            L = self.token_limit
            if tok == L - 2:
                cls = T.XC_LM2
            elif tok == L - 1:
                cls = T.XC_LM1
            else:
                cls = T.XC_ELSE
            for a in range(60, 405):
                if T.ACTION_XCLASS[a] != cls:
                    continue
                give = T.ACTION_GIVE[a].astype(np.int64)
                if (gems < give).any():
                    continue
                if T.ACTION_KIND[a] == T.KIND_RSVG:
                    slot = int(T.ACTION_PARAM[a])
                    v[a] = bank_gold > 0 and rsv_nolimit[slot]
                else:
                    req = T.ACTION_BANK_REQ[a].astype(np.int64)
                    v[a] = (bank >= req).all()

        v[408] = not v[:408].any()
        return v

    # -------------------------------------------------------------- mutation
    def _award_nobles(self, p):
        cards = self.cards(p)[:5].astype(np.int64)
        for i in range(self.num_nobles):
            noble = self.state[self.R_NOBLES + i]
            if noble[:5].sum() > 0 and (cards >= noble[:5].astype(np.int64)).all():
                self.state[self.R_PNOB + self.num_nobles * p + i] = noble
                self.state[self.R_NOBLES + i] = 0

    def _pay_and_gain(self, cost7, gain7, p):
        cost = cost7[:5].astype(np.int64)
        gems = self.gems(p)[:5].astype(np.int64)
        cards = self.cards(p)[:5].astype(np.int64)
        missing = int(np.maximum(cost - gems - cards, 0).sum())
        paid = np.minimum(np.maximum(cost - cards, 0), gems)
        self.state[self.R_PGEMS + p, :5] -= paid.astype(np.int8)
        self.state[self.R_PGEMS + p, 5] -= missing
        self.state[0, :5] += paid.astype(np.int8)
        self.state[0, 5] += missing
        self.state[self.R_PCARDS + p] += gain7
        self._award_nobles(p)

    def _do_reserve(self, slot15, p, deterministic, u0, u1):
        rsv = self.reserved(p)
        er = None
        for i in range(3):
            if rsv[2 * i, :5].sum() == 0:
                er = self.R_PRSV + 6 * p + 2 * i
                break
        assert er is not None
        if slot15 < 12:
            row = self.R_CARDS + 2 * slot15
            self.state[er:er + 2] = self.state[row:row + 2]
            self._fill_slot(slot15 // 4, slot15 % 4, deterministic, u0, u1)
        elif not deterministic:
            card = self._draw(slot15 - 12, u0, u1)
            if card is not None:
                self.state[er:er + 2] = card
        if self.state[0, 5] > 0:
            self.state[0, 5] -= 1
            self.state[self.R_PGEMS + p, 5] += 1

    def make_move(self, a, p, deterministic, u0=0.0, u1=0.0):
        kind = int(T.ACTION_KIND[a])
        param = int(T.ACTION_PARAM[a])
        if kind == T.KIND_BUY:
            row = self.R_CARDS + 2 * param
            cost = self.state[row].copy()
            gain = self.state[row + 1].copy()
            self._pay_and_gain(cost, gain, p)
            self._fill_slot(param // 4, param % 4, deterministic, u0, u1)
        elif kind == T.KIND_RESERVE:
            self._do_reserve(param, p, deterministic, u0, u1)
        elif kind == T.KIND_BUY_RESERVE:
            base = self.R_PRSV + 6 * p
            cost = self.state[base + 2 * param].copy()
            gain = self.state[base + 2 * param + 1].copy()
            self._pay_and_gain(cost, gain, p)
            remaining = [self.state[base + 2 * j:base + 2 * j + 2].copy()
                         for j in range(3) if j != param]
            for j, block in enumerate(remaining):
                self.state[base + 2 * j:base + 2 * j + 2] = block
            self.state[base + 4:base + 6] = 0
        elif kind == T.KIND_GEMS:
            delta = (T.ACTION_TAKE[a].astype(np.int64)
                     - T.ACTION_GIVE[a].astype(np.int64))
            self.state[self.R_PGEMS + p, :5] += delta.astype(np.int8)
            self.state[0, :5] -= delta.astype(np.int8)
        elif kind == T.KIND_RSVG:
            self._do_reserve(param, p, deterministic, u0, u1)
            give = T.ACTION_GIVE[a]
            self.state[self.R_PGEMS + p, :5] -= give
            self.state[0, :5] += give
        # KIND_NOBLE / KIND_PASS: no-op
        # explicit mod-256 wrap of the int8 round counter (mirrors the env's
        # int8 overflow semantics without tripping numpy's overflow warning)
        self.state[0, 6] = np.uint8((int(self.state[0, 6]) + 1) % 256).astype(
            np.int8)
        return (p + 1) % self.n

    # ------------------------------------------------------------- terminal
    def get_round(self):
        return int(np.uint8(self.state[0, 6]))

    def check_end_game(self):
        n = self.n
        if self.get_round() % n != 0:
            return np.zeros(n, np.float32)
        scores = np.array([self.score(p) for p in range(n)])
        smax = scores.max()
        if smax < self.score_win and self.get_round() < self.max_moves:
            return np.zeros(n, np.float32)
        if (scores == smax).sum() == 1:
            return np.where(scores == smax, 1.0, -1.0).astype(np.float32)
        ncards = np.array([int(self.cards(p)[:5].astype(np.int64).sum())
                           for p in range(n)])
        masked = np.where(scores < smax, 999, ncards)
        win = np.full(n, -1.0, np.float32)
        ids = np.where(masked == masked.min())[0]
        win[ids] = 0.01 if len(ids) > 1 else 1.0
        return win

    def swap_players(self, k):
        n, nn = self.n, self.num_nobles

        def roll(start, total, per):
            block = self.state[start:start + total].copy()
            for i in range(total):
                self.state[start + i] = block[(i + per * k) % total]

        roll(self.R_PGEMS, n, 1)
        roll(self.R_PNOB, n * nn, nn)
        roll(self.R_PCARDS, n, 1)
        roll(self.R_PRSV, 6 * n, 6)
