"""Symmetry augmentation for Splendor.

The reference expands every stored example into up to 12 symmetric variants at
collection time (SplendorLogicNumba.py:349-395: permuting the 4 open card
slots within a tier, and each player's reserved-card slots).  Here we instead
draw ONE random symmetry per sample at *training* time, on device — same
augmentation distribution, ~10x less replay memory.

Divergence (improvement): the reference forgets to permute the
reserve-and-give-back actions (290-364) whose ids reference tier card slots;
we permute those blocks consistently with the card-slot permutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import env as E
from . import tables as T

# 4 choices per tier: identity + the reference's three derangements
TIER_PERMS = np.array([[0, 1, 2, 3], [1, 3, 0, 2], [2, 0, 3, 1], [3, 2, 1, 0]],
                      dtype=np.int32)
# reserve-slot perms indexed by occupied count (rows padded with identity)
RSV_PERMS_BY_COUNT = np.array([
    [[0, 1, 2], [0, 1, 2], [0, 1, 2]],   # 0 reserved
    [[0, 1, 2], [0, 1, 2], [0, 1, 2]],   # 1
    [[0, 1, 2], [1, 0, 2], [0, 1, 2]],   # 2 -> may swap first two
    [[0, 1, 2], [1, 2, 0], [2, 0, 1]],   # 3 -> cyclic perms
], dtype=np.int32)

_TIER_PERMS = jnp.asarray(TIER_PERMS)
_RSV_PERMS = jnp.asarray(RSV_PERMS_BY_COUNT)


def random_symmetry(cfg: E.SplendorConfig, key, state, pi, valids):
    """Apply one uniformly random symmetry to (state, pi, valids).

    state: (R, 7) int8 canonical; pi: (A,) float; valids: (A,) bool."""
    n = cfg.num_players
    k_tier, k_rsv = jax.random.split(key)
    tier_choice = jax.random.randint(k_tier, (3,), 0, 4)        # per tier
    rsv_raw = jax.random.randint(k_rsv, (n,), 0, 3)             # per player

    row_perm = jnp.arange(cfg.rows, dtype=jnp.int32)
    act_perm = jnp.arange(cfg.num_actions, dtype=jnp.int32)

    for t in range(3):
        perm = _TIER_PERMS[tier_choice[t]]                      # (4,)
        # state rows: slot s (2 rows) <- slot perm[s]
        base = cfg.row_cards + 8 * t
        src_rows = base + 2 * perm
        row_perm = row_perm.at[base + 2 * jnp.arange(4)].set(src_rows)
        row_perm = row_perm.at[base + 2 * jnp.arange(4) + 1].set(src_rows + 1)
        # actions: buy 4t+s, reserve 12+4t+s, reserve+give blocks of 5
        act_perm = act_perm.at[4 * t + jnp.arange(4)].set(4 * t + perm)
        act_perm = act_perm.at[12 + 4 * t + jnp.arange(4)].set(12 + 4 * t + perm)
        rsvg_dst = (T.A_RSVG + 5 * (4 * t + jnp.arange(4))[:, None]
                    + jnp.arange(5)[None, :])
        rsvg_src = (T.A_RSVG + 5 * (4 * t + perm)[:, None]
                    + jnp.arange(5)[None, :])
        act_perm = act_perm.at[rsvg_dst.ravel()].set(rsvg_src.ravel())

    for p in range(n):
        base = cfg.row_prsv + 6 * p
        rows = jax.lax.dynamic_slice(state, (base, 0), (6, 7)).astype(jnp.int32)
        count = (rows[0:6:2, :5].sum(1) > 0).sum()
        perm = _RSV_PERMS[count, rsv_raw[p]]                    # (3,)
        src_rows = base + 2 * perm
        row_perm = row_perm.at[base + 2 * jnp.arange(3)].set(src_rows)
        row_perm = row_perm.at[base + 2 * jnp.arange(3) + 1].set(src_rows + 1)
        if p == 0:
            act_perm = act_perm.at[27 + jnp.arange(3)].set(27 + perm)

    return state[row_perm], pi[act_perm], valids[act_perm]


def batched_random_symmetry(cfg: E.SplendorConfig):
    def fn(key, states, pis, valids):
        keys = jax.random.split(key, states.shape[0])
        return jax.vmap(lambda k, s, p, v: random_symmetry(cfg, k, s, p, v))(
            keys, states, pis, valids)
    return jax.jit(fn)
