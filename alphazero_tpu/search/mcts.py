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

Memory layout: per-(node,action) matrices are kept to ``children`` (int32)
and ``prior``; edge visit/value statistics live per *child node* (an edge is
identified with the child it leads to), which keeps HBM use linear in the
number of nodes rather than nodes x actions.
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
    """All arrays carry a leading batch axis [B]."""
    states: jnp.ndarray      # [B, M, R, 7] int8, canonical (player-0 to move)
    valid: jnp.ndarray       # [B, M, A] bool
    prior: jnp.ndarray       # [B, M, A] f32 (normalized over valid)
    children: jnp.ndarray    # [B, M, A] i32, -1 if unexpanded
    parent: jnp.ndarray      # [B, M] i32
    parent_action: jnp.ndarray  # [B, M] i32
    edge_n: jnp.ndarray      # [B, M] i32   visits of edge (parent -> this)
    edge_w: jnp.ndarray      # [B, M] f32   sum of parent-frame v[0] backups
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


def _ucb_pick(cfg: MCTSConfig, prior_a, valid_a, child_a, edge_n, edge_w,
              ns, qs, sim_idx, is_root):
    """Select an action at one node (reference pick_highest_UCB,
    MCTS.py:199-219)."""
    A = prior_a.shape[0]
    has_child = child_a >= 0
    safe_child = jnp.maximum(child_a, 0)
    n_a = jnp.where(has_child, edge_n[safe_child], 0)
    w_a = jnp.where(has_child, edge_w[safe_child], 0.0)
    visited = n_a > 0
    q_a = w_a / jnp.maximum(n_a, 1)

    fpu_init = jnp.where(cfg.fpu > 0, qs - cfg.fpu, cfg.fpu)
    ns_f = ns.astype(jnp.float32)
    u = jnp.where(
        visited,
        q_a + cfg.cpuct * prior_a * jnp.sqrt(ns_f) / (1.0 + n_a),
        fpu_init + cfg.cpuct * prior_a * jnp.sqrt(ns_f + EPS),
    )
    u = jnp.where(valid_a, u, -jnp.inf)
    best = jnp.argmax(u)

    if cfg.forced_playouts:
        thresh = jnp.floor(jnp.sqrt(cfg.k_forced * prior_a
                                    * sim_idx.astype(jnp.float32))).astype(jnp.int32)
        force = valid_a & (n_a < thresh) & is_root
        idx = jnp.arange(A, dtype=jnp.int32)
        first_forced = jnp.min(jnp.where(force, idx, A))
        best = jnp.where(force.any(), first_forced, best)
    return best.astype(jnp.int32)


def _select_one(cfg: MCTSConfig, tree_b, sim_idx):
    """Descend one board's tree; returns (edge_parent, edge_action,
    existing_child) where existing_child is -1 if the edge is unexpanded."""
    def cond(c):
        return ~c[3]

    def body(c):
        node, _, _, _ = c
        a = _ucb_pick(
            cfg,
            tree_b.prior[node], tree_b.valid[node], tree_b.children[node],
            tree_b.edge_n, tree_b.edge_w,
            tree_b.node_n[node],
            tree_b.node_vsum[node] / (tree_b.node_n[node] + 1.0),
            sim_idx, node == 0)
        child = tree_b.children[node, a]
        stop = (child == NO_CHILD) | tree_b.is_term[jnp.maximum(child, 0)]
        nxt = jnp.where(stop, node, child)
        return (nxt, node, a, stop)

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.asarray(False))
    _, parent, action, _ = jax.lax.while_loop(cond, body, init)
    return parent, action, tree_b.children[parent, action]


def _backprop_one(tree_b, leaf, value_vec):
    """Walk parent pointers from ``leaf`` to the root, rolling the seat frame
    once per level (reference MCTS.py:168-176)."""
    def cond(c):
        return c[0] != 0

    def body(c):
        node, v, en, ew, nn_, nv = c
        p = tree_b.parent[node]
        v = jnp.roll(v, 1)
        en = en.at[node].add(1)
        ew = ew.at[node].add(v[0])
        nn_ = nn_.at[p].add(1)
        nv = nv.at[p].add(v[0])
        return (p, v, en, ew, nn_, nv)

    init = (leaf, value_vec, tree_b.edge_n, tree_b.edge_w,
            tree_b.node_n, tree_b.node_vsum)
    _, _, en, ew, nn_, nv = jax.lax.while_loop(cond, body, init)
    return en, ew, nn_, nv


class _TreeB(NamedTuple):
    """Single-board view used inside vmap."""
    prior: jnp.ndarray
    valid: jnp.ndarray
    children: jnp.ndarray
    parent: jnp.ndarray
    edge_n: jnp.ndarray
    edge_w: jnp.ndarray
    node_n: jnp.ndarray
    node_vsum: jnp.ndarray
    is_term: jnp.ndarray


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
            children=jnp.full((B, M, A), NO_CHILD),
            parent=jnp.zeros((B, M), jnp.int32),
            parent_action=jnp.zeros((B, M), jnp.int32),
            edge_n=jnp.zeros((B, M), jnp.int32),
            edge_w=jnp.zeros((B, M), jnp.float32),
            node_n=jnp.zeros((B, M), jnp.int32),
            node_vsum=jnp.zeros((B, M), jnp.float32).at[:, 0].set(v0[:, 0]),
            term_val=jnp.zeros((B, M, num_players), jnp.float32),
            is_term=jnp.zeros((B, M), jnp.bool_),
        )

        def sim_body(i, tree):
            tb = _TreeB(tree.prior, tree.valid, tree.children, tree.parent,
                        tree.edge_n, tree.edge_w, tree.node_n, tree.node_vsum,
                        tree.is_term)
            parent, action, existing = jax.vmap(
                functools.partial(_select_one, cfg), in_axes=(0, None))(tb, i)

            fresh = existing == NO_CHILD
            slot = jnp.int32(i + 1)                       # preallocated node id

            # Step every board's selected edge (cheap; results unused when the
            # child already exists).
            parent_states = jnp.take_along_axis(
                tree.states, parent[:, None, None, None], axis=1)[:, 0]
            child_state, term_vec, child_valid = jax.vmap(step_fn)(
                parent_states, action)
            probs, values = eval_fn(params, child_state.astype(jnp.float32),
                                    child_valid)
            probs = _normalize_masked(probs, child_valid)
            child_term = jnp.abs(term_vec).sum(-1) > 0

            bidx = jnp.arange(B)
            write = lambda arr, upd: arr.at[bidx, slot].set(upd)  # noqa: E731
            tree = tree._replace(
                states=write(tree.states, child_state),
                valid=write(tree.valid, child_valid),
                prior=write(tree.prior, probs),
                parent=tree.parent.at[:, slot].set(parent),
                parent_action=tree.parent_action.at[:, slot].set(action),
                edge_n=tree.edge_n.at[:, slot].set(0),
                edge_w=tree.edge_w.at[:, slot].set(0.0),
                node_n=tree.node_n.at[:, slot].set(0),
                node_vsum=tree.node_vsum.at[:, slot].set(values[:, 0]),
                term_val=write(tree.term_val, term_vec),
                is_term=tree.is_term.at[:, slot].set(child_term),
                children=tree.children.at[bidx, parent, action].set(
                    jnp.where(fresh, slot, existing)),
            )

            leaf = jnp.where(fresh, slot, existing)
            leaf_term = tree.is_term[bidx, leaf]
            leaf_tv = tree.term_val[bidx, leaf]
            value_vec = jnp.where(leaf_term[:, None], leaf_tv, values)

            tb2 = _TreeB(tree.prior, tree.valid, tree.children, tree.parent,
                         tree.edge_n, tree.edge_w, tree.node_n, tree.node_vsum,
                         tree.is_term)
            en, ew, nn_, nv = jax.vmap(_backprop_one)(tb2, leaf, value_vec)
            return tree._replace(edge_n=en, edge_w=ew, node_n=nn_, node_vsum=nv)

        tree = jax.lax.fori_loop(0, S, sim_body, tree)

        # Root visit counts per action
        root_children = tree.children[:, 0]                       # [B, A]
        has = root_children >= 0
        safe = jnp.maximum(root_children, 0)
        counts = jnp.where(
            has, jnp.take_along_axis(tree.edge_n, safe, axis=1), 0)

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
