"""Glue between the Splendor env, the network, and the batched MCTS."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...models import splendor_net as N
from . import env as E


def net_config_for(cfg: E.SplendorConfig, dropout: float = 0.3,
                   nn_version: int = 1, width: int = 128,
                   dtype: str = "float32") -> N.NetConfig:
    return N.NetConfig(
        nb_vect=cfg.rows,
        vect_dim=7,
        action_size=cfg.num_actions,
        num_players=cfg.num_players,
        max_score_diff=15,
        dropout=dropout,
        nn_version=nn_version,
        width=width,
        dtype=dtype,
    )


def make_eval_fn(net_cfg: N.NetConfig):
    """eval_fn(params_bundle, states_f32, valids) -> (probs, values).
    ``params_bundle`` is ``(params, batch_stats)``."""
    def eval_fn(bundle, states, valids):
        params, batch_stats = bundle
        probs, v, _ = N.apply_inference(net_cfg, params, batch_stats,
                                        states, valids)
        return probs, v
    return eval_fn


def make_uniform_eval_fn(cfg: E.SplendorConfig):
    """Prior-free evaluator (uniform over valid moves, zero value) — used for
    tests and as the 'untrained net' baseline."""
    def eval_fn(bundle, states, valids):
        del bundle
        B = states.shape[0]
        probs = valids.astype(jnp.float32)
        probs = probs / jnp.maximum(probs.sum(-1, keepdims=True), 1e-8)
        return probs, jnp.zeros((B, cfg.num_players), jnp.float32)
    return eval_fn


def make_search_step_fn(cfg: E.SplendorConfig):
    """In-tree transition: deterministic step (chance collapsed) from the
    canonical frame, re-canonicalize for the next seat, then terminal +
    validity (reference get_next_best_action_and_canonical_state,
    MCTS.py:222-237).  The 4th output is the seat advance of the edge (how
    many seats the turn moved on) — always 1 except for a pending
    noble-select ply (enable_noble_select), where the mover keeps the turn."""
    def step_fn(state, action):
        s2, nxt = E.step(cfg, state, action, 0, jnp.zeros(2, jnp.float32),
                         jnp.asarray(True))
        s2 = E.swap_players(cfg, s2, nxt)
        term = E.check_end_game(cfg, s2)
        valid = E.valid_moves(cfg, s2, 0)
        return s2, term, valid, jnp.asarray(nxt, jnp.int32)
    return step_fn


def make_valid_fn(cfg: E.SplendorConfig):
    return functools.partial(E.valid_moves, cfg, player=0)


def batched_canonical(cfg: E.SplendorConfig):
    """jit-compiled [B]-batched canonicalization by current seat."""
    def fn(states, player):
        return jax.vmap(lambda s: E.swap_players(cfg, s, player))(states)
    return jax.jit(fn)
