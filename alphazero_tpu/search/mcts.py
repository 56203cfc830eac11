"""Batched array-based MCTS for TPU.

Re-design of the reference's recursive dict-tree MCTS (MCTS.py:16-250) as a
fixed-shape array search that runs entirely under ``jit`` and ``vmap`` over a
batch of boards, folding every leaf evaluation into one large on-device NN
forward per simulation step (this replaces the reference's per-leaf ONNX
latency path, GenericNNetWrapper.py:141-168).

Search features mirrored from the reference:
- PUCT with FPU (absolute, or parent-Q reduction; MCTS.py:199-219)
- Dirichlet root noise mixed 0.75/0.25 over valid actions after a prior
  softmax temperature (MCTS.py:141-144,180-186,244-250)
- forced playouts at the root + policy-target pruning (MCTS.py:69-74,206-209)
- terminal-value caching, multiplayer value backprop via seat-roll
  (MCTS.py:168-176)
- playout-cap randomization is driven by the caller choosing the
  ``num_sims`` variant per move (MCTS.py:54-56).

Deliberate structural divergences (documented):
- one fresh tree per move instead of cross-move reuse + round-based GC — the
  arrays are preallocated ``[B, num_sims+1, ...]`` so no GC is needed;
- no transposition table (identical states become distinct nodes), which is
  the standard array-MCTS trade.

TPU memory/layout design (profile-driven):
- Edge visit/value statistics are stored per (node, action) as dense
  ``[B, M, A]`` arrays.  Selection then only ever reads whole per-node rows
  via batched ``take_along_axis`` (a cheap contiguous gather).  The earlier
  per-child layout required a ``[B, A]``-shaped gather of per-child counts
  through the ``children`` matrix at every UCB evaluation — on TPU that
  lowers to a pathological elementwise gather fusion which consumed ~90% of
  the whole search runtime (xprof: two 0.43s fusions per 0.95s search).
- All tree mutation at per-board-varying indices is expressed as flat-1D
  scatters over reshaped ``[B*M*A]``/``[B*M]`` arrays at batch level (not
  under vmap), the fastest scatter form measured on v5e; writes at the
  common ``slot`` index use dynamic-update-slice.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-8
NO_CHILD = jnp.int32(-1)


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    num_sims: int = 100
    cpuct: float = 1.0
    fpu: float = 0.0                  # >0: parent-Q reduction; <=0: absolute
    forced_playouts: bool = False
    k_forced: float = 0.5             # reference MCTS.py:10
    dirichlet_alpha: float = 0.2
    dirichlet_frac: float = 0.25
    prior_temp: float = 1.0           # softmax temp on root priors with noise
    add_noise: bool = False


class Tree(NamedTuple):
    """All arrays carry a leading batch axis [B]; M = num_sims + 1 nodes.

    ``children``/``edge_n``/``edge_w`` are kept permanently FLAT ``[B*M*A]``
    (row-major over (b, node, action)): the scatter sites want the flat 1D
    form and the row reads reshape to ``[B*M, A]`` — a free bitcast — so no
    layout-conversion copies appear at loop boundaries."""
    states: jnp.ndarray      # [B, M, R, 7] int8, canonical (player-0 to move)
    valid: jnp.ndarray       # [B, M, A] bool
    prior: jnp.ndarray       # [B, M, A] f32 (normalized over valid)
    children: jnp.ndarray    # [B*M*A] i32, -1 if unexpanded
    edge_n: jnp.ndarray      # [B*M*A] i32  visits of edge (node, action)
    edge_w: jnp.ndarray      # [B*M*A] f32  sum of node-frame v[0] backups
    parent: jnp.ndarray      # [B, M] i32
    parent_action: jnp.ndarray  # [B, M] i32
    node_n: jnp.ndarray      # [B, M] i32   Ns
    node_vsum: jnp.ndarray   # [B, M] f32   leaf eval + backups (Qs numerator)
    term_val: jnp.ndarray    # [B, M, P] f32 terminal outcome (child frame)
    is_term: jnp.ndarray     # [B, M] bool


class SearchResult(NamedTuple):
    counts: jnp.ndarray      # [B, A] f32 — visit counts, PCR-pruned if forced
    raw_counts: jnp.ndarray  # [B, A] i32
    q: jnp.ndarray           # [B, P] f32 — root Q per seat (reference :64-66)
    root_value: jnp.ndarray  # [B, P] f32 — NN value at root
    root_prior: jnp.ndarray  # [B, A] f32


# EvalFn: (params, states_f32 [B,R,7], valids [B,A]) -> (probs [B,A], v [B,P])
EvalFn = Callable[..., tuple[jnp.ndarray, jnp.ndarray]]
# StepFn: (state [R,7], action) -> (canonical child state, term_vec [P], valid [A])
StepFn = Callable[..., tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]


def _normalize_masked(p, valid):
    p = jnp.where(valid, p, 0.0)
    return p / jnp.maximum(p.sum(-1, keepdims=True), EPS)


def _row(arr_bma, node_b):
    """arr [B, M, ...] indexed at per-board node -> [B, ...]."""
    idx = node_b.reshape((-1,) + (1,) * (arr_bma.ndim - 1))
    return jnp.take_along_axis(arr_bma, idx, axis=1)[:, 0]


def _ucb_pick_rows(cfg: MCTSConfig, prior_r, valid_r, en_r, ew_r, ns, qs,
                   sim_idx, is_root):
    """Vectorized PUCT over per-node rows [B, A] (reference pick_highest_UCB,
    MCTS.py:199-219)."""
    A = prior_r.shape[-1]
    visited = en_r > 0
    q_a = ew_r / jnp.maximum(en_r, 1)

    fpu_init = jnp.where(cfg.fpu > 0, qs - cfg.fpu, cfg.fpu)[:, None]
    ns_f = ns.astype(jnp.float32)[:, None]
    n_f = en_r.astype(jnp.float32)
    u = jnp.where(
        visited,
        q_a + cfg.cpuct * prior_r * jnp.sqrt(ns_f) / (1.0 + n_f),
        fpu_init + cfg.cpuct * prior_r * jnp.sqrt(ns_f + EPS),
    )
    u = jnp.where(valid_r, u, -jnp.inf)
    best = jnp.argmax(u, axis=-1).astype(jnp.int32)

    if cfg.forced_playouts:
        thresh = jnp.floor(jnp.sqrt(
            cfg.k_forced * prior_r * sim_idx.astype(jnp.float32))).astype(jnp.int32)
        force = valid_r & (en_r < thresh) & is_root[:, None]
        idx = jnp.arange(A, dtype=jnp.int32)[None, :]
        first_forced = jnp.min(jnp.where(force, idx, A), axis=-1).astype(jnp.int32)
        best = jnp.where(force.any(-1), first_forced, best)
    return best


def _select(cfg: MCTSConfig, tree: Tree, sim_idx):
    """Batched tree descent; returns (parent [B], action [B], existing [B])
    where existing is -1 if the chosen edge is unexpanded."""
    B, M, A = tree.prior.shape
    bidx = jnp.arange(B, dtype=jnp.int32)
    en2 = tree.edge_n.reshape(B * M, A)
    ew2 = tree.edge_w.reshape(B * M, A)

    def cond(c):
        return ~c[3].all()

    def body(c):
        node, _, _, stop = c
        rows = bidx * M + node
        prior_r = _row(tree.prior, node)
        valid_r = _row(tree.valid, node)
        en_r = jnp.take(en2, rows, axis=0)
        ew_r = jnp.take(ew2, rows, axis=0)
        nn_ = _row(tree.node_n, node)
        nv = _row(tree.node_vsum, node)
        qs = nv / (nn_.astype(jnp.float32) + 1.0)
        a = _ucb_pick_rows(cfg, prior_r, valid_r, en_r, ew_r, nn_, qs,
                           sim_idx, node == 0)
        child = tree.children[rows * A + a]
        term = _row(tree.is_term, jnp.maximum(child, 0))
        now_stop = (child == NO_CHILD) | term
        parent = jnp.where(stop, c[1], node)
        action = jnp.where(stop, c[2], a)
        nxt = jnp.where(stop | now_stop, node, child)
        return (nxt, parent, action, stop | now_stop)

    zeros = jnp.zeros((B,), jnp.int32)
    init = (zeros, zeros, zeros, jnp.zeros((B,), jnp.bool_))
    _, parent, action, _ = jax.lax.while_loop(cond, body, init)
    existing = tree.children[(bidx * M + parent) * A + action]
    return parent, action, existing


def _backprop(tree: Tree, leaf, value_vec):
    """Batch-level path walk from ``leaf`` to the root, rolling the seat
    frame once per level (reference MCTS.py:168-176).  All updates are
    flat-1D scatter-adds (see module docstring)."""
    B, M, A = tree.prior.shape
    bidx = jnp.arange(B, dtype=jnp.int32)
    en = tree.edge_n
    ew = tree.edge_w
    nn_ = tree.node_n.reshape(B * M)
    nv = tree.node_vsum.reshape(B * M)

    def cond(c):
        return jnp.any(c[0] != 0)

    def body(c):
        node, v, en, ew, nn_, nv = c
        active = node != 0
        v = jnp.roll(v, 1, axis=1)
        p = _row(tree.parent, node)
        a = _row(tree.parent_action, node)
        v0 = jnp.where(active, v[:, 0], 0.0)
        ai = active.astype(jnp.int32)
        fe = (bidx * M + p) * A + a
        en = en.at[fe].add(ai)
        ew = ew.at[fe].add(v0)
        fn = bidx * M + p
        nn_ = nn_.at[fn].add(ai)
        nv = nv.at[fn].add(v0)
        return (jnp.where(active, p, 0), v, en, ew, nn_, nv)

    init = (leaf, value_vec, en, ew, nn_, nv)
    _, _, en, ew, nn_, nv = jax.lax.while_loop(cond, body, init)
    return tree._replace(edge_n=en, edge_w=ew,
                         node_n=nn_.reshape(B, M),
                         node_vsum=nv.reshape(B, M))


def build_search(mcts_cfg: MCTSConfig, num_players: int,
                 eval_fn: EvalFn, step_fn: StepFn, valid_fn):
    """Returns ``search(params, roots [B,R,7] int8, rng) -> SearchResult``.

    ``eval_fn(params, states, valids)`` must return normalized masked policy
    probabilities and per-seat values in the state's own frame."""
    cfg = mcts_cfg
    S = cfg.num_sims
    M = S + 1

    def search(params, roots, rng):
        B, R, C = roots.shape
        root_valid = jax.vmap(valid_fn)(roots)                    # [B, A]
        A = root_valid.shape[1]
        pi0, v0 = eval_fn(params, roots.astype(jnp.float32), root_valid)
        pi0 = _normalize_masked(pi0, root_valid)

        if cfg.add_noise:
            if cfg.prior_temp != 1.0:
                pi0 = _normalize_masked(pi0 ** (1.0 / cfg.prior_temp), root_valid)
            g = jax.random.gamma(rng, cfg.dirichlet_alpha, (B, A))
            noise = _normalize_masked(g, root_valid)
            pi0 = _normalize_masked(
                (1.0 - cfg.dirichlet_frac) * pi0 + cfg.dirichlet_frac * noise,
                root_valid)

        tree = Tree(
            states=jnp.zeros((B, M, R, C), jnp.int8).at[:, 0].set(roots),
            valid=jnp.zeros((B, M, A), jnp.bool_).at[:, 0].set(root_valid),
            prior=jnp.zeros((B, M, A), jnp.float32).at[:, 0].set(pi0),
            children=jnp.full((B * M * A,), NO_CHILD),
            edge_n=jnp.zeros((B * M * A,), jnp.int32),
            edge_w=jnp.zeros((B * M * A,), jnp.float32),
            parent=jnp.zeros((B, M), jnp.int32),
            parent_action=jnp.zeros((B, M), jnp.int32),
            node_n=jnp.zeros((B, M), jnp.int32),
            node_vsum=jnp.zeros((B, M), jnp.float32).at[:, 0].set(v0[:, 0]),
            term_val=jnp.zeros((B, M, num_players), jnp.float32),
            is_term=jnp.zeros((B, M), jnp.bool_),
        )
        bidx = jnp.arange(B, dtype=jnp.int32)

        def sim_body(i, tree):
            parent, action, existing = _select(cfg, tree, i)
            fresh = existing == NO_CHILD
            slot = jnp.int32(i + 1)                       # preallocated node id

            # Step every board's selected edge (results unused when the child
            # already exists — terminal revisits only).
            parent_states = _row(tree.states, parent)
            child_state, term_vec, child_valid = jax.vmap(step_fn)(
                parent_states, action)
            probs, values = eval_fn(params, child_state.astype(jnp.float32),
                                    child_valid)
            probs = _normalize_masked(probs, child_valid)
            child_term = jnp.abs(term_vec).sum(-1) > 0

            def dus(arr, upd):
                return jax.lax.dynamic_update_slice_in_dim(
                    arr, upd[:, None].astype(arr.dtype), slot, axis=1)

            BMA = tree.children.size
            fc = jnp.where(fresh, (bidx * M + parent) * A + action, BMA)
            tree = tree._replace(
                states=dus(tree.states, child_state),
                valid=dus(tree.valid, child_valid),
                prior=dus(tree.prior, probs),
                parent=dus(tree.parent, parent),
                parent_action=dus(tree.parent_action, action),
                node_n=dus(tree.node_n, jnp.zeros((B,), jnp.int32)),
                node_vsum=dus(tree.node_vsum, values[:, 0]),
                term_val=dus(tree.term_val, term_vec),
                is_term=dus(tree.is_term, child_term),
                children=tree.children.at[fc].set(slot, mode="drop"),
            )

            leaf = jnp.where(fresh, slot, existing)
            leaf_term = _row(tree.is_term, leaf)
            leaf_tv = _row(tree.term_val, leaf)
            value_vec = jnp.where(leaf_term[:, None], leaf_tv, values)
            return _backprop(tree, leaf, value_vec)

        tree = jax.lax.fori_loop(0, S, sim_body, tree)

        # root row [b, node 0, :] of the flat edge array
        counts = tree.edge_n.reshape(B, M * A)[:, :A]             # [B, A]

        # Root Q vector (reference MCTS.py:64-66)
        qs = tree.node_vsum[:, 0] / (tree.node_n[:, 0] + 1.0)
        q = jnp.concatenate([
            qs[:, None],
            jnp.repeat((-qs / (num_players - 1))[:, None], num_players - 1, 1),
        ], axis=1)

        out_counts = counts.astype(jnp.float32)
        if cfg.forced_playouts:
            # policy target pruning (reference MCTS.py:69-74)
            best = counts.max(axis=1, keepdims=True)
            pruned = counts - jnp.floor(
                jnp.sqrt(cfg.k_forced * tree.prior[:, 0] * S)).astype(jnp.int32)
            adj = jnp.where(counts == best, counts, pruned)
            out_counts = jnp.where(adj > 1, adj, 0).astype(jnp.float32)

        return SearchResult(counts=out_counts, raw_counts=counts, q=q,
                            root_value=v0, root_prior=tree.prior[:, 0])

    return search
