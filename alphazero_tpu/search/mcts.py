"""Batched array-based MCTS for TPU, with cross-move tree reuse.

Re-design of the reference's recursive dict-tree MCTS (MCTS.py:16-250) as a
fixed-shape array search that runs entirely under ``jit`` and ``vmap`` over a
batch of boards, folding every leaf evaluation into one large on-device NN
forward per simulation step (this replaces the reference's per-leaf ONNX
latency path, GenericNNetWrapper.py:141-168).

Search features mirrored from the reference:
- PUCT with FPU (absolute, or parent-Q reduction; MCTS.py:199-219)
- Dirichlet root noise mixed 0.75/0.25 over valid actions after a prior
  softmax temperature (MCTS.py:141-144,180-186,244-250); like the reference,
  noise is (re-)applied to the root priors at the start of every search
  call, including on a reused root (MCTS.py:150-153)
- forced playouts at the root + policy-target pruning (MCTS.py:69-74,206-209)
- terminal-value caching, multiplayer value backprop via seat-roll
  (MCTS.py:168-176)
- playout-cap randomization is driven by the caller choosing the
  ``num_sims`` variant per move (MCTS.py:54-56)
- CROSS-MOVE TREE REUSE (reference keeps its dict tree across moves within a
  game and GCs old rounds, MCTS.py:27-36,79-85): ``build_reusing_search``
  returns a ``reroot`` that re-roots the array tree on the played action —
  the surviving subtree is compacted to the buffer head (ranked by visit
  count, capped at ``keep_cap`` nodes) and the next search continues from
  its carried N/W/priors.  Reuse is per-board validated: it only applies
  when the real next state matches the tree's (deterministic-chance) child
  state, exactly like the reference's state-bytes dict lookup, which also
  only hits when the stochastic draw matched the in-tree collapse.

Remaining structural divergence (documented): no transposition table
(identical states become distinct nodes) — the standard array-MCTS trade.

TPU memory/layout design (profile-driven; see docs/PERF.md history):
- ALL per-node data lives in ONE packed array ``stats [B, M, 4, A+2]``:
  action columns 0..A-1 carry the edge lanes (prior-or-invalid, child-id +
  packed terminal flag, edge visits, edge value-sum) and columns A/A+1 the
  node scalars (terminal flag, seat rotation, Ns, value sum, terminal value
  vector).  Tree descent therefore does exactly ONE contiguous
  ``take_along_axis`` row gather per level — dynamic row gathers on TPU are
  HBM-latency-bound (~60-90us for [B,1,*] regardless of row width), so
  minimizing the NUMBER of gathers per level, not bytes, is what matters
  (the earlier 3-gather layout spent ~half the search in descent).
- Backprop does NOT walk the tree a second time.  Selection records the
  (parent, action, rotation) path into ``[B, PL]`` buffers; afterwards the
  whole backup — edge N/W increments, node Ns/value-sum increments (via a
  two-hot action row), child-pointer install, and the expanded node's full
  row — is expressed as dense one-hot matmul deltas fused into a single
  whole-array add (see ``_backprop_fused``).  TPU scatter costs ~23ns per
  update element (effectively serial) and ANY dynamic-index write to the
  ~437MB stats array (scatter, lane-sliced ``.at[].add``, or
  dynamic-update-slice) rewrites the whole buffer, so the only mutations
  are elementwise passes XLA can fuse; measured history in docs/PERF.md.
- Small arrays (states, parent) are written at the per-board ``slot`` index
  with a one-hot masked ``where`` — their full-buffer rewrite is a few MB
  and cheap.
- ``reroot`` runs ONCE per move (vs per sim): reachability from the played
  child via parent-pointer doubling (log2(M) gathers), a stable int-key
  argsort ranking (played child first, then kept nodes by visit count — so
  an ancestor always outranks its descendants and truncation never orphans
  a node), then one gather pass per tree array.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-8

# stats lane indices.  Layout is PACKED: one [B, M, 4, A+2] array holds both
# the per-(node,action) edge data (columns 0..A-1) and the per-node scalars
# (columns A, A+1), so tree descent costs exactly ONE dynamic row gather per
# level (gathers are HBM-latency-bound, ~60-90us each regardless of width —
# docs/PERF.md; the previous 3-array layout paid three).
_PVALID = 0   # prior probability where valid, -1.0 where invalid
_CHILD = 1    # SIGN-PACKED child pointer: +id for a live child, -id if that
              # child is TERMINAL (the sign carries the flag, saving the
              # child-row lookup during descent); 0 = unexpanded (the root
              # can never be a child).  Sign-packing (round 5; previously
              # id + 0.5) keeps every representable id EXACT in bfloat16 up
              # to 255 — the old fractional flag was bf16-exact only to
              # 127.5, halving the capacity at which bf16 stats are safe.
_EN = 2       # edge visit count N(s,a)
_EW = 3       # edge value sum W(s,a) (node-frame v[0] backups)

# node-scalar columns (appended after the A action columns):
# col A:   lane _PVALID -> 1.0 if this node is terminal
#          lane _CHILD  -> cumulative seat rotation mod P from the root
#                          (0 at the root; normally each edge advances one
#                          seat, but a pending noble-select ply keeps the
#                          mover's turn, so rotation is tracked per node)
#          lane _EN     -> node visit count Ns
#          lane _EW     -> node value sum (Qs numerator; leaf eval + backups)
# col A+1: lanes 0..P-1 -> terminal value vector


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
    # Optional descent depth cap (0 = auto: num_sims + keep_cap, which can
    # never be exceeded by construction for a fresh tree).  The batched
    # descent runs to the BATCH-max depth per sim (lockstep), so one board
    # growing a line tree stalls the whole batch; capping treats the node
    # reached at the cap as the leaf (its NN value is re-backed-up, no
    # expansion) — the same bounded-depth policy as mctx's max_depth.
    max_depth: int = 0
    # Tree levels processed per while_loop iteration during descent.  The
    # gathers are serially dependent either way (each level's row index
    # comes from the previous level's child pointer), but every while_loop
    # iteration pays fixed overhead (condition reduction + dispatch + path
    # bookkeeping) on top of the ~70us HBM-latency-bound row gather, so
    # unrolling U levels into one body amortizes that overhead U-fold.
    # Semantically EXACT — the unrolled body is the same per-level function
    # applied U times (tests/test_mcts.py locks unroll==1 equivalence).
    # Default 1: the only A/B measurements so far were taken while the chip
    # was in a degraded state (speedup 0.83-0.96, see docs/PERF.md
    # "chip-day variance") — flip to 2 only on a measured healthy-chip win
    # (bench.py reports speedup_vs_legacy in-session).
    descent_unroll: int = 1
    # Historical flag for the Pallas fused-backup kernel
    # (ops/fused_backup.py).  The kernel targets the pre-packed split
    # stats/node_sc layout and measured slower than the XLA einsum on v5e
    # (2.1ms vs 1.8ms per sim at B=1024 S=64, docs/PERF.md), so with the
    # packed layout it is no longer wired in; enabling raises, the op and
    # its tests remain as the Pallas reference.
    pallas_backup: bool = False
    # Storage dtype for the packed stats array
    # ("auto" | "float32" | "bfloat16").  The backup is HBM-bandwidth-bound
    # in the stats buffer (read + delta + write per sim) and bfloat16
    # halves its traffic: measured 107.8k -> 158.2k rollouts/s at
    # B=1024/S=64 on v5e (round 5, healthy pins — the round-3 "bf16 is
    # slower" result predates the per-lane backup and the sign-packed
    # child pointers).  Exactness bounds for bf16: integers (visit counts,
    # ±id pointers) are exact up to 256, so bf16 requires capacity <= 256
    # AND a fresh tree per search (carried reuse roots accumulate Ns past
    # 256, where bf16 +1 increments vanish).  "auto" (default) resolves to
    # bfloat16 exactly when those bounds hold on a TPU backend, float32
    # otherwise.  Q-precision parity: tests/test_mcts_bf16.py.
    stats_dtype: str = "auto"
    # Staged tree-capacity schedule for FRESH searches ("auto" | "off" |
    # comma-separated sim counts, e.g. "16,48").  After i sims a fresh tree
    # holds only i+1 nodes, yet the backup's cost is linear in the FULL
    # capacity M (dense stats read+write plus the one-hot einsum's M-wide
    # output) — so the sim loop is split into stages whose capacity grows
    # with the node count: first s1 sims on an (s1+1)-node tree, then the
    # arrays are zero-padded and the loop continues.  Semantically EXACT
    # (the padded rows are the same never-referenced zeros; the Dirichlet
    # root refresh runs only in stage 1; forced playouts see the GLOBAL sim
    # index; PCR pruning uses total sims) — locked by
    # tests/test_mcts_staged.py.  "auto": doubling schedule from 16 when
    # num_sims >= 64.  Measured on healthy v5e (round 5,
    # bench_out/staged_ab.json): 159.2k -> 181.8k rollouts/s at B=1024/S=64
    # (schedule 16,16,32) and 93.1k -> 110.1k at B=256/S=128 (16,16,32,64).
    # "off": single full-capacity stage.  Only build_search honors this —
    # reusing searches carry nodes across moves and always run full-size.
    stage_sims: str = "auto"


class Tree(NamedTuple):
    """All arrays carry a leading batch axis [B]; M = capacity =
    num_sims + keep_cap + 1 nodes."""
    states: jnp.ndarray      # [B, M, R, 7] int8, canonical (player-0 to move)
    stats: jnp.ndarray       # [B, M, 4, A+2] — packed edge + node data,
                             # lanes/columns per module header
    parent: jnp.ndarray      # [B, M] i32 — parent node id (0 for the root)


class SearchResult(NamedTuple):
    counts: jnp.ndarray      # [B, A] f32 — visit counts, PCR-pruned if forced
    raw_counts: jnp.ndarray  # [B, A] i32
    q: jnp.ndarray           # [B, P] f32 — root Q per seat (reference :64-66)
    root_value: jnp.ndarray  # [B, P] f32 — NN value at root
    root_prior: jnp.ndarray  # [B, A] f32


class ReusingSearch(NamedTuple):
    """Tree-reusing search API (reference MCTS.py:27-36 keeps its tree across
    moves; here the carry is explicit because the arrays are fixed-shape).

    init_tree(roots [B,R,7]) -> (Tree, n [B])        fresh per-game trees
    run(params, tree, n, rng) -> (SearchResult, Tree, n)   one search call
    reroot(tree, actions [B], next_states [B,R,7]) -> (Tree, n)
    """
    init_tree: Callable[..., Any]
    run: Callable[..., Any]
    reroot: Callable[..., Any]
    capacity: int


# EvalFn: (params, states_f32 [B,R,7], valids [B,A]) -> (probs [B,A], v [B,P])
EvalFn = Callable[..., tuple[jnp.ndarray, jnp.ndarray]]
# StepFn: (state [R,7], action) ->
#   (canonical child state, term_vec [P], valid [A], seat_advance i32)
StepFn = Callable[..., tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray]]


def _mm_dtype():
    """bf16 one-hot matmuls on TPU; CPU's dot thunk lacks BF16xBF16=F32.
    AZTPU_MM_DTYPE overrides (diagnostic lever, docs/PERF.md class-2).
    NOTE: read at TRACE time — a search jitted before the env var changes
    keeps the dtype it was traced with."""
    import os
    ov = os.environ.get("AZTPU_MM_DTYPE")
    if ov:
        if ov not in ("float32", "bfloat16"):
            raise ValueError(
                f"AZTPU_MM_DTYPE={ov!r}: must be 'float32' or 'bfloat16'")
        return jnp.dtype(ov)
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _backup_form():
    """Backup-delta formulation: 'fused3' (one 3-lane einsum, default) or
    'perlane' (three separate matmuls — the round-4 diagnostic fallback).
    Read at TRACE time, like _mm_dtype."""
    import os
    form = os.environ.get("AZTPU_BACKUP_FORM", "perlane")
    if form not in ("fused3", "perlane"):
        raise ValueError(
            f"AZTPU_BACKUP_FORM={form!r}: must be 'fused3' or 'perlane'")
    return form


def _normalize_masked(p, valid):
    p = jnp.where(valid, p, 0.0)
    return p / jnp.maximum(p.sum(-1, keepdims=True), EPS)


def _row(arr, node_b):
    """arr [B, M, ...] indexed at per-board node -> [B, ...]."""
    idx = node_b.reshape((-1,) + (1,) * (arr.ndim - 1))
    return jnp.take_along_axis(arr, idx, axis=1,
                               mode="promise_in_bounds")[:, 0]


def _pack_pvalid(probs, valid):
    """prior where valid, -1 where invalid — one lane encodes both."""
    return jnp.where(valid, probs, -1.0)


def _write_row(arr, slot_b, upd):
    """arr [B, M, ...] with per-board row index slot_b [B] <- upd [B, ...].

    One-hot masked ``where`` instead of scatter/DUS: any dynamic-index write
    rewrites the whole buffer anyway, and the masked select is a single
    fusable elementwise pass."""
    B, M = arr.shape[:2]
    onehot = jnp.arange(M, dtype=jnp.int32)[None, :] == slot_b[:, None]
    mask = onehot.reshape((B, M) + (1,) * (arr.ndim - 2))
    return jnp.where(mask, upd[:, None].astype(arr.dtype), arr)


def _ucb_pick_rows(cfg: MCTSConfig, prior_r, valid_r, en_r, ew_r, ns, qs,
                   sim_idx, is_root):
    """Vectorized PUCT over per-node rows [B, A] (reference pick_highest_UCB,
    MCTS.py:199-219)."""
    A = prior_r.shape[-1]
    visited = en_r > 0
    q_a = ew_r / jnp.maximum(en_r, 1)

    fpu_init = jnp.where(cfg.fpu > 0, qs - cfg.fpu, cfg.fpu)[:, None]
    ns_f = ns[:, None]
    u = jnp.where(
        visited,
        q_a + cfg.cpuct * prior_r * jnp.sqrt(ns_f) / (1.0 + en_r),
        fpu_init + cfg.cpuct * prior_r * jnp.sqrt(ns_f + EPS),
    )
    u = jnp.where(valid_r, u, -jnp.inf)
    best = jnp.argmax(u, axis=-1).astype(jnp.int32)

    if cfg.forced_playouts:
        thresh = jnp.floor(jnp.sqrt(
            cfg.k_forced * prior_r * sim_idx.astype(jnp.float32)))
        force = valid_r & (en_r < thresh) & is_root[:, None]
        idx = jnp.arange(A, dtype=jnp.int32)[None, :]
        first_forced = jnp.min(jnp.where(force, idx, A), axis=-1).astype(jnp.int32)
        best = jnp.where(force.any(-1), first_forced, best)
    return best


def _select(cfg: MCTSConfig, tree: Tree, sim_idx, path_p, path_a, path_r,
            depth_cap: int):
    """Batched tree descent with path recording.

    Returns (parent [B], action [B], existing [B] — 0 if the chosen edge is
    unexpanded, depth [B] — number of edges on the path, parent_rot [B] —
    the stopping node's seat rotation, path_p, path_a, path_r).  Each path
    node's rotation (node column of lane ``_CHILD``) is recorded during the descent itself, so
    backprop never re-gathers node rows.  ``depth_cap`` (== the path-buffer
    width) bounds the descent; the node reached at the cap is treated as the
    leaf."""
    B, M, _, A = tree.stats.shape
    PL = path_p.shape[1]
    U = max(int(cfg.descent_unroll), 1)
    if U > 1:
        # scratch columns for the unrolled sub-levels that run after every
        # board has stopped (they record only drop-sentinels, see below)
        pad = jnp.zeros((B, U - 1), jnp.int32)
        path_p = jnp.concatenate([path_p, jnp.full((B, U - 1), M,
                                                   jnp.int32)], 1)
        path_a = jnp.concatenate([path_a, pad], 1)
        path_r = jnp.concatenate([path_r, pad], 1)
    # level-major [PL, B] layout inside the loop (see the write-site note)
    path_p, path_a, path_r = path_p.T, path_a.T, path_r.T
    zeros = jnp.zeros((B,), jnp.int32)

    def cond(c):
        return ~c[3].all()

    def one_level(c):
        (node, parent, action, stop, depth, level, path_p, path_a, path_r,
         existing, prot) = c
        row = _row(tree.stats, node)                       # [B, 4, A+2]
        A = row.shape[-1] - 2
        pv = row[:, _PVALID, :A].astype(jnp.float32)
        valid_r = pv >= 0.0
        prior_r = jnp.maximum(pv, 0.0)
        en_r = row[:, _EN, :A].astype(jnp.float32)
        ew_r = row[:, _EW, :A].astype(jnp.float32)
        nn_ = row[:, _EN, A].astype(jnp.float32)
        rot = row[:, _CHILD, A].astype(jnp.int32)
        qs = row[:, _EW, A].astype(jnp.float32) / (nn_ + 1.0)
        a = _ucb_pick_rows(cfg, prior_r, valid_r, en_r, ew_r, nn_, qs,
                           sim_idx, node == 0)
        # _CHILD sign-packs "±child id, negative if terminal": one gather
        # serves both the pointer and the terminal check
        child_raw = jnp.take_along_axis(
            row[:, _CHILD, :A], a[:, None], axis=1,
            mode="promise_in_bounds")[:, 0].astype(jnp.float32)
        child = jnp.abs(child_raw).astype(jnp.int32)
        term_c = child_raw < 0.0
        # cap reached: treat the chosen edge's child as the leaf (it is
        # re-evaluated and backed up, never expanded further this sim)
        now_stop = (child == 0) | term_c | (level >= depth_cap - 1)

        # record the traversed edge for boards still descending.  The
        # deepest possible REAL record sits at column depth_cap-1 (stop is
        # forced there); unrolled sub-levels past it write sentinel-only
        # rows into the scratch columns, which are sliced off below.
        # Level-major layout: the update is a leading-axis one-row DUS,
        # the same well-exercised pattern as lax.scan's ys stacking.
        rec_p = jnp.where(stop, M, node)       # M = one-hot drop sentinel
        rec_a = jnp.where(stop, 0, a)
        rec_r = jnp.where(stop, 0, rot)
        path_p = jax.lax.dynamic_update_slice_in_dim(
            path_p, rec_p[None, :], level, axis=0)
        path_a = jax.lax.dynamic_update_slice_in_dim(
            path_a, rec_a[None, :], level, axis=0)
        path_r = jax.lax.dynamic_update_slice_in_dim(
            path_r, rec_r[None, :], level, axis=0)
        depth = depth + (~stop).astype(jnp.int32)

        parent = jnp.where(stop, parent, node)
        action = jnp.where(stop, action, a)
        existing = jnp.where(stop, existing, child)
        prot = jnp.where(stop, prot, rot)
        nxt = jnp.where(stop | now_stop, node, child)
        return (nxt, parent, action, stop | now_stop, depth,
                level + 1, path_p, path_a, path_r, existing, prot)

    def body(c):
        for _ in range(U):
            c = one_level(c)
        return c

    init = (zeros, zeros, zeros, jnp.zeros((B,), jnp.bool_), zeros,
            jnp.int32(0), path_p, path_a, path_r, zeros, zeros)
    out = jax.lax.while_loop(cond, body, init)
    (_, parent, action, _, depth, _, path_p, path_a, path_r, existing,
     prot) = out
    return (parent, action, existing, depth, prot,
            path_p.T[:, :PL], path_a.T[:, :PL], path_r.T[:, :PL])


def _backprop_fused(tree: Tree, path_p, path_a, path_r, depth, value_vec,
                    leaf_rot, parent, action, fresh, slot_b, pvalid_new,
                    child_term, child_rot, leaf_init_v, term_vec):
    """Whole-path backup + node expansion in O(1) dense device passes
    (reference MCTS.py:168-176).

    Level l (0-based from the root) holds edge (path_p[l], path_a[l]) into
    the node at depth l+1; both that edge and node path_p[l] receive
    ``value_vec[(rot(path_p[l]) - leaf_rot) mod P]`` — ``value_vec`` is in
    the leaf frame, so each ancestor reads the lane of its own mover seat.
    With one-seat-per-edge rotation this reduces to the reference's
    ``np.roll`` walk (rot(node)=level, leaf_rot=depth); per-node rotations
    (node column of lane ``_CHILD``) generalize it to noble-select plies
    that keep the turn.

    ``slot_b`` is the PER-BOARD id of the node expanded this sim (boards
    carry different node counts once trees are reused across moves).  Its
    row content — priors, terminal flag, rotation, initial value, terminal
    value vector — is written whether or not the chosen edge was fresh; a
    revisit leaves it as an unreferenced dead slot (same semantics as the
    previous split-array writes).

    TPU cost model (measured, B=1024 S=64 A=409): any *dynamic-index* write
    to the [B,M,4,A+2] stats array — scatter, lane-sliced .at[].add, or
    dynamic-update-slice — rewrites (or worse) the whole ~437MB buffer, so
    the entire mutation is expressed as ONE elementwise pass
    ``stats + einsum_delta + broadcast_row`` which XLA fuses into a single
    bandwidth-bound kernel with the one-hot matmul feeding it:
    - edge N/W increments along the path   -> einsum delta lanes _EN/_EW at
      columns path_a[l]
    - node Ns / value-sum increments       -> the SAME einsum levels via a
      TWO-hot action row (column a_l AND the node column A carry the same
      per-level weights), so the packed layout absorbs the old separate
      node-scalar einsum for free
    - fresh child-pointer install          -> two extra einsum "levels"
      whose lane-_CHILD weights split the sign-packed pointer
      ``±slot`` (negative iff the child is terminal) into bf16-exact
      halves (±multiple-of-128 + ±remainder; add == set: a fresh edge's
      lane is 0; the SIGN packs the child-terminal flag read back during
      descent).  The packed id must NEVER pass through a bf16 cast whole:
      bfloat16 cannot represent odd integers above 256 (257 -> 256), so
      on TPU (where ``_mm_dtype`` is bf16) any tree with capacity > 256
      nodes would silently install pointers to the WRONG node — the root
      cause of the class-1 "root counts for a different state" corruption
      (a reuse-specific class-2 defect remained open past this fix; see
      docs/PERF.md); regression-locked by
      tests/test_mcts_backprop_precision.py.  The split itself is exact
      only while ``hi = slot & ~127`` is bf16-exact, i.e. capacity <=
      32768 — guarded in ``_build_core``
    - the expanded node's full row         -> broadcast outer-product add
      (priors ride at +1 over the -1 initialization; node columns start 0)
    """
    B, M, _, A2 = tree.stats.shape
    A = A2 - 2
    S = path_p.shape[1]
    P = value_vec.shape[1]
    mmt = _mm_dtype()
    sdt = tree.stats.dtype
    lv = jnp.arange(S, dtype=jnp.int32)[None, :]                    # [1, S]
    mask = lv < depth[:, None]                                      # [B, S]

    # per-level backup value: value_vec[(rot(node_l) - leaf_rot) mod P];
    # path_r was recorded during descent (no re-gather)
    roll_idx = jnp.mod(path_r - leaf_rot[:, None], P)               # [B, S]
    v_l = jnp.einsum(
        "bsp,bp->bs",
        jax.nn.one_hot(roll_idx, P, dtype=value_vec.dtype), value_vec)
    v_l = jnp.where(mask, v_l, 0.0)

    # Lane _PVALID (0) never receives delta updates, so only the 3 live
    # lanes (_CHILD/_EN/_EW) are computed and a zero lane is stacked back
    # for the fused elementwise add.
    # Child-pointer install rides the delta as TWO extra levels whose f32
    # accumulation reconstructs the sign-packed pointer ``±slot``
    # (negative iff the child is terminal) EXACTLY: bf16 (8 significand
    # bits) cannot represent odd integers above 256 (257 -> 256 = a
    # pointer to the WRONG node), but the split
    #   hi = ±(slot & ~127)       (multiple of 128 -> exact up to 32768)
    #   lo = ±(slot & 127)        (integer < 128 -> exact)
    # keeps every level bf16-exact.  Alternatives measured slower: an f32
    # one-hot outer product added to the einsum output (-40%), a broadcast
    # term in the final elementwise add (-30%) — both break the
    # einsum+add fusion this backup lives on.
    slot_i = jnp.where(fresh, slot_b, 0)
    sgn = jnp.where(child_term, -1.0, 1.0)
    inst_hi = sgn * (slot_i & ~127).astype(jnp.float32)
    inst_lo = sgn * (slot_i & 127).astype(jnp.float32)
    pp = jnp.concatenate([jnp.where(mask, path_p, M),
                          parent[:, None], parent[:, None]], 1)      # [B,S+2]
    pa = jnp.concatenate([path_a, action[:, None], action[:, None]], 1)
    onehot_pp = jax.nn.one_hot(pp, M, dtype=mmt)                     # [B,S+2,M]
    # two-hot action rows: backup levels hit their action column AND the
    # node column A; the install levels (S, S+1) stay one-hot so the
    # pointer lands only on its edge column.  The node-column bump is a
    # TRACE-TIME CONSTANT broadcast (all boards bump column A at levels
    # < S) — the earlier per-sim ``.at[:, :S, A].add(1)`` compiled to a
    # real scatter-add costing ~0.5 ms/sim (xprof, round 5).
    act2 = (jax.nn.one_hot(pa, A2, dtype=mmt)
            + jnp.zeros((1, S + 2, A2), mmt).at[0, :S, A].set(1))
    # ALL THREE lanes share act2: the CH lane's weights are zero at levels
    # 0..S-1 (only the two install levels carry inst_lo/inst_hi), so the
    # node-column bump there multiplies a zero weight — sharing the operand
    # saves materializing a second [B,S+2,A+2] one-hot every sim.

    # The delta for the 3 live lanes.  DO NOT use a single 4-D contraction
    # with the lane axis free on the RHS (bsm,bsva->bmva): that einsum
    # MISCOMPILES on XLA:TPU at these shapes — a fraction of level
    # contributions land on the WRONG tree row (verified deterministic,
    # dtype-independent).  Forensics and the minimal discriminating
    # experiment are recorded in docs/PERF.md ("class-2" corruption);
    # regression-locked by tests/test_mcts.py invariants +
    # scripts/reuse_repro.py on hardware.  Two SAFE forms (both plain 3-D
    # batched GEMMs, the shape class validated at every size tested):
    # - "perlane" (default): three separate bsm,bsa->bma matmuls with the
    #   per-level weights folded into the pp one-hot — measured FASTER
    #   than every wider fusion tried (one bsm,bsk->bmk with lanes along
    #   k: 6.9 ms/sim; lanes on the LHS + transpose: 4.3; 2-dot split:
    #   5.6; vs 3.6 ms/sim here — the wide concatenated operands cost
    #   more than the extra dispatches, round-5 microbench on v5e)
    # - "fused3": the single wide-k einsum (AZTPU_BACKUP_FORM=fused3,
    #   kept as a diagnostic; counts verified identical on hardware)
    zeros2 = jnp.zeros((B, 2), mmt)
    w_en = jnp.concatenate([mask.astype(mmt), zeros2], 1)            # [B,S+2]
    w_ew = jnp.concatenate([v_l.astype(mmt), zeros2], 1)
    w_ch = jnp.concatenate([jnp.zeros((B, S), mmt),
                            inst_lo.astype(mmt)[:, None],
                            inst_hi.astype(mmt)[:, None]], 1)

    if _backup_form() == "perlane":
        def lane_delta(w, ah):
            return jnp.einsum("bsm,bsa->bma", onehot_pp * w[:, :, None], ah,
                              preferred_element_type=jnp.float32)    # [B,M,A+2]

        delta = jnp.stack([jnp.zeros((B, M, A2), jnp.float32),
                           lane_delta(w_ch, act2),
                           lane_delta(w_en, act2),
                           lane_delta(w_ew, act2)], axis=2).astype(sdt)
    else:
        act_cat = jnp.concatenate([act2 * w_ch[:, :, None],
                                   act2 * w_en[:, :, None],
                                   act2 * w_ew[:, :, None]], -1)     # [B,S+2,3(A+2)]
        d3 = jnp.einsum("bsm,bsk->bmk", onehot_pp, act_cat,
                        preferred_element_type=jnp.float32)          # [B,M,3(A+2)]
        delta = jnp.concatenate(
            [jnp.zeros((B, M, 1, A2), jnp.float32),
             d3.reshape(B, M, 3, A2)], axis=2).astype(sdt)

    # expanded node's full row: broadcast outer product, fused into the add
    content = jnp.zeros((B, 4, A2), jnp.float32)\
        .at[:, _PVALID, :A].set(pvalid_new + 1.0)\
        .at[:, _PVALID, A].set(child_term.astype(jnp.float32))\
        .at[:, _CHILD, A].set(child_rot.astype(jnp.float32))\
        .at[:, _EW, A].set(leaf_init_v)\
        .at[:, :P, A + 1].set(term_vec)
    onehot_slot = jax.nn.one_hot(slot_b, M, dtype=jnp.float32)       # [B, M]
    row_add = onehot_slot[:, :, None, None] * content[:, None, :, :]
    stats = tree.stats + delta + row_add.astype(sdt)

    return tree._replace(stats=stats)


def _build_core(mcts_cfg: MCTSConfig, num_players: int, eval_fn: EvalFn,
                step_fn: StepFn, valid_fn, keep_cap: int, *,
                total_sims: int | None = None, continue_tree: bool = False,
                sim_offset: int = 0, staged: bool = False):
    """Shared search core over a caller-provided tree with per-board node
    counts ``n0`` (1 == fresh root-only tree).

    Staging hooks (all trace-time constants; see ``MCTSConfig.stage_sims``):
    ``total_sims`` is the WHOLE search budget when this core runs only one
    stage of it (PCR pruning and the bf16 visit-count bound are functions of
    the total, not the stage); ``continue_tree`` skips the root
    prior/noise/scalar refresh (the tree already carries them from stage 1);
    ``sim_offset`` is the number of sims already run, added to the loop
    index wherever the GLOBAL sim index is meant (forced playouts);
    ``staged`` marks keep_cap as "head-room for earlier stages of the same
    fresh search" rather than carried reuse nodes, which keeps bf16 stats
    legal (visit counts stay bounded by total_sims)."""
    cfg = mcts_cfg
    S = cfg.num_sims
    TS = total_sims if total_sims is not None else S
    M = S + keep_cap + 1
    P = num_players
    PL = min(M - 1, cfg.max_depth) if cfg.max_depth > 0 else M - 1
    if cfg.stats_dtype == "auto":
        # bf16 stats halve the backup's HBM traffic (the dominant cost) and
        # are EXACT for counts and sign-packed pointers while capacity stays
        # <= 256 on a fresh tree; carried reuse roots accumulate Ns without
        # bound (bf16 +1 increments vanish past 256), so reuse keeps f32
        sdt = (jnp.dtype(jnp.bfloat16)
               if (jax.default_backend() == "tpu" and M <= 256 and TS <= 256
                   and (keep_cap == 0 or staged))
               else jnp.dtype(jnp.float32))
    else:
        sdt = jnp.dtype(cfg.stats_dtype)
    if sdt == jnp.bfloat16 and (M > 256 or TS > 256
                                or (keep_cap > 0 and not staged)):
        raise ValueError(
            f"stats_dtype=bfloat16 stores visit counts and the sign-packed "
            f"child pointers exactly only up to 256 on a FRESH tree, but "
            f"tree capacity is {M} (num_sims={S}, keep_cap={keep_cap}); "
            f"use float32 (reuse trees accumulate root Ns past 256, where "
            f"bf16 +1 increments vanish)")
    if _mm_dtype() == jnp.bfloat16 and M > 32768:
        # the child-pointer install rides the backup einsum in _mm_dtype as
        # hi = slot & ~127 (bf16-exact only while slot <= 32768: 128*k needs
        # k <= 256) plus a <128 remainder — beyond that the install would
        # silently write wrong pointers again (the class-1 failure mode)
        raise ValueError(
            f"tree capacity {M} exceeds 32768, the largest size whose "
            f"child-pointer install split (hi = multiple-of-128) is exact "
            f"in the bf16 backup einsum on this backend; shrink "
            f"num_sims+keep_cap")
    if cfg.pallas_backup:
        raise NotImplementedError(
            "the Pallas fused-backup kernel targets the pre-packed split "
            "stats/node_sc layout (and measured slower than the XLA einsum "
            "it replaced, docs/PERF.md); ops/fused_backup.py remains as the "
            "kernel reference with its own op-level tests")

    def empty_tree(B, R, C, A):
        # packed layout: A action columns + 2 node-scalar columns; priors
        # initialize to -1 ("invalid") on the action columns ONLY — the node
        # columns (terminal flag etc.) must start at 0
        return Tree(
            states=jnp.zeros((B, M, R, C), jnp.int8),
            stats=jnp.zeros((B, M, 4, A + 2), sdt)
                  .at[:, :, _PVALID, :A].set(-1.0),
            parent=jnp.zeros((B, M), jnp.int32),
        )

    def init_tree(roots):
        B, R, C = roots.shape
        A = jax.eval_shape(valid_fn, roots[0]).shape[0]
        tree = empty_tree(B, R, C, A)
        return (tree._replace(states=tree.states.at[:, 0].set(roots)),
                jnp.ones((B,), jnp.int32))

    def core(params, tree, n0, rng):
        B = tree.states.shape[0]
        roots = tree.states[:, 0]
        root_valid = jax.vmap(valid_fn)(roots)                    # [B, A]
        A = root_valid.shape[1]
        pi0, v0 = eval_fn(params, roots.astype(jnp.float32), root_valid)
        pi0 = _normalize_masked(pi0, root_valid)

        if continue_tree:
            # staged continuation within one search call: the root row
            # (priors + noise + N/V scalars) is already exactly as stage 1
            # left it — any rewrite here would double-apply noise.  v0 is
            # still recomputed above (deterministic, same params/roots) so
            # the final stage's SearchResult.root_value matches stage 1's.
            pass
        else:
            if cfg.add_noise:
                if cfg.prior_temp != 1.0:
                    pi0 = _normalize_masked(pi0 ** (1.0 / cfg.prior_temp),
                                            root_valid)
                g = jax.random.gamma(rng, cfg.dirichlet_alpha, (B, A))
                noise = _normalize_masked(g, root_valid)
                pi0 = _normalize_masked(
                    (1.0 - cfg.dirichlet_frac) * pi0
                    + cfg.dirichlet_frac * noise,
                    root_valid)

            # root prior row is always refreshed (new priors + noise,
            # reference MCTS.py:150-153); carried roots keep their N/V
            # scalars and edge stats, fresh roots (n0 == 1) get the NN value
            # as initial value sum
            carried = n0 > 1
            root_nn = jnp.where(carried, tree.stats[:, 0, _EN, A]
                                .astype(jnp.float32), 0.0)
            root_nv = jnp.where(carried, tree.stats[:, 0, _EW, A]
                                .astype(jnp.float32), v0[:, 0])
            tree = tree._replace(
                stats=tree.stats.at[:, 0, _PVALID, :A].set(
                    _pack_pvalid(pi0, root_valid).astype(sdt))
                .at[:, 0, _EN, A].set(root_nn.astype(sdt))
                .at[:, 0, _EW, A].set(root_nv.astype(sdt)),
            )
        # Path buffers stay PL wide even under a depth cap: measured on v5e,
        # shrinking the backup einsum's contraction (path-level axis) made
        # the whole search SLOWER (e.g. D=24: 477ms vs 366ms at B=1024/S=64)
        # — XLA picks a worse strategy for the small contraction — so the
        # cap is a semantic bound, not a perf one.
        path_p0 = jnp.full((B, PL), M, jnp.int32)
        path_a0 = jnp.zeros((B, PL), jnp.int32)
        path_r0 = jnp.zeros((B, PL), jnp.int32)

        def sim_body(i, tree):
            # forced playouts key on the GLOBAL sim index (reference
            # MCTS.py:199-219 uses the root visit total); under staging the
            # loop index restarts per stage, so the offset restores it
            (parent, action, existing, depth, parent_rot, path_p, path_a,
             path_r) = _select(cfg, tree, i + sim_offset, path_p0, path_a0,
                               path_r0, PL)
            fresh = existing == 0
            slot_b = n0 + i                       # per-board node id [B]

            # Step every board's selected edge (results unused when the child
            # already exists — terminal revisits only).
            parent_states = _row(tree.states, parent)
            child_state, term_vec, child_valid, adv = jax.vmap(step_fn)(
                parent_states, action)
            child_rot = jnp.mod(parent_rot + adv, P)
            probs, values = eval_fn(params, child_state.astype(jnp.float32),
                                    child_valid)
            probs = _normalize_masked(probs, child_valid)
            child_term = jnp.abs(term_vec).sum(-1) > 0

            tree = tree._replace(
                states=_write_row(tree.states, slot_b, child_state),
                parent=_write_row(tree.parent, slot_b, parent),
            )

            # Leaf frame data: a FRESH leaf's scalars are exactly the values
            # just computed (its row is only written inside the backup), so
            # the row gather is needed only for revisited leaves.
            leaf_row = _row(tree.stats, existing)              # [B, 4, A+2]
            ex_term = leaf_row[:, _PVALID, A] > 0.0
            ex_rot = leaf_row[:, _CHILD, A].astype(jnp.int32)
            ex_tv = leaf_row[:, :P, A + 1].astype(jnp.float32)
            leaf_term = jnp.where(fresh, child_term, ex_term)
            leaf_rot = jnp.where(fresh, child_rot, ex_rot)
            leaf_tv = jnp.where(fresh[:, None], term_vec, ex_tv)
            value_vec = jnp.where(leaf_term[:, None], leaf_tv, values)
            return _backprop_fused(tree, path_p, path_a, path_r, depth,
                                   value_vec, leaf_rot, parent, action, fresh,
                                   slot_b, _pack_pvalid(probs, child_valid),
                                   child_term, child_rot, values[:, 0],
                                   term_vec)

        tree = jax.lax.fori_loop(0, S, sim_body, tree)

        counts = tree.stats[:, 0, _EN, :A].astype(jnp.int32)       # [B, A]
        root_prior = jnp.maximum(
            tree.stats[:, 0, _PVALID, :A].astype(jnp.float32), 0.0)

        # Root Q vector (reference MCTS.py:64-66)
        qs = (tree.stats[:, 0, _EW, A].astype(jnp.float32)
              / (tree.stats[:, 0, _EN, A].astype(jnp.float32) + 1.0))
        q = jnp.concatenate([
            qs[:, None],
            jnp.repeat((-qs / (num_players - 1))[:, None], num_players - 1, 1),
        ], axis=1)

        out_counts = counts.astype(jnp.float32)
        if cfg.forced_playouts:
            # policy target pruning (reference MCTS.py:69-74); TS is the
            # WHOLE search budget even when this core ran only the last stage
            best = counts.max(axis=1, keepdims=True)
            pruned = counts - jnp.floor(
                jnp.sqrt(cfg.k_forced * root_prior * TS)).astype(jnp.int32)
            adj = jnp.where(counts == best, counts, pruned)
            out_counts = jnp.where(adj > 1, adj, 0).astype(jnp.float32)
            # low-sim edge case: if pruning zeroed every edge (all raw
            # counts <= 1), fall back to the raw distribution rather than
            # emit an all-zero policy target
            total = out_counts.sum(-1, keepdims=True)
            out_counts = jnp.where(total > 0, out_counts,
                                   counts.astype(jnp.float32))

        result = SearchResult(counts=out_counts, raw_counts=counts, q=q,
                              root_value=v0, root_prior=root_prior)
        return result, tree, n0 + S

    return init_tree, core, M


def _resolve_stage_schedule(cfg: MCTSConfig):
    """Parse ``cfg.stage_sims`` into a per-stage sim-count tuple or None.

    "auto" builds a doubling schedule from 16 (16, 16, 32, 64, ... with the
    remainder folded into the last stage) once num_sims >= 64 — below that
    the full tree is already small enough that stage-transition overhead
    (array pad + an extra dispatch chain) eats the bandwidth saving."""
    spec = str(cfg.stage_sims or "off").strip().lower()
    if spec == "off":
        return None
    if spec == "auto":
        S = cfg.num_sims
        if S < 64:
            return None
        sched, done, step = [], 0, 16
        while done + step < S:
            sched.append(step)
            done += step
            if len(sched) >= 2:
                step *= 2
        sched.append(S - done)
        return tuple(sched)
    parts = tuple(int(x) for x in spec.split(","))
    if any(p <= 0 for p in parts) or sum(parts) != cfg.num_sims:
        raise ValueError(
            f"stage_sims={spec!r}: entries must be positive and sum to "
            f"num_sims={cfg.num_sims}")
    return parts if len(parts) > 1 else None


def _grow_tree(tree: Tree, new_m: int) -> Tree:
    """Zero-pad a tree's node axis to capacity ``new_m`` (stage transition).
    Padded stats rows get the same empty-row init as ``empty_tree`` (priors
    -1 on the action columns); states/parent pad with zeros."""
    B, M, _, A2 = tree.stats.shape
    pad = new_m - M
    R, C = tree.states.shape[2:]
    sdt = tree.stats.dtype
    empty = jnp.zeros((B, pad, 4, A2), sdt).at[:, :, _PVALID, :A2 - 2].set(-1.0)
    return Tree(
        states=jnp.concatenate(
            [tree.states, jnp.zeros((B, pad, R, C), jnp.int8)], axis=1),
        stats=jnp.concatenate([tree.stats, empty], axis=1),
        parent=jnp.concatenate(
            [tree.parent, jnp.zeros((B, pad), jnp.int32)], axis=1),
    )


def build_search(mcts_cfg: MCTSConfig, num_players: int,
                 eval_fn: EvalFn, step_fn: StepFn, valid_fn):
    """Returns ``search(params, roots [B,R,7] int8, rng) -> SearchResult`` —
    a fresh tree per call (no cross-move reuse).

    ``eval_fn(params, states, valids)`` must return normalized masked policy
    probabilities and per-seat values in the state's own frame.

    When ``cfg.stage_sims`` resolves to a schedule, the sim loop runs as
    successive stages with growing tree capacity (see the config field doc);
    each stage is a separate ``_build_core`` whose keep_cap reserves exactly
    the rows earlier stages filled.  Stage results other than the last are
    discarded, so XLA dead-code-eliminates their root evals; only the final
    stage's SearchResult (built on the full tree) is returned."""
    schedule = _resolve_stage_schedule(mcts_cfg)
    if not schedule:
        init_tree, core, _ = _build_core(mcts_cfg, num_players, eval_fn,
                                         step_fn, valid_fn, keep_cap=0)

        def search(params, roots, rng):
            tree, n0 = init_tree(roots)
            result, _, _ = core(params, tree, n0, rng)
            return result

        return search

    total = mcts_cfg.num_sims
    stages = []
    done = 0
    init_tree0 = None
    for i, s in enumerate(schedule):
        scfg = dataclasses.replace(mcts_cfg, num_sims=s)
        init_i, core_i, m_i = _build_core(
            scfg, num_players, eval_fn, step_fn, valid_fn, keep_cap=done,
            total_sims=total, continue_tree=(i > 0), sim_offset=done,
            staged=True)
        if i == 0:
            init_tree0 = init_i
        stages.append((core_i, m_i))
        done += s

    def search(params, roots, rng):
        tree, n = init_tree0(roots)
        result, tree, n = stages[0][0](params, tree, n, rng)
        for core_i, m_i in stages[1:]:
            tree = _grow_tree(tree, m_i)
            result, tree, n = core_i(params, tree, n, rng)
        return result

    return search


def build_reusing_search(mcts_cfg: MCTSConfig, num_players: int,
                         eval_fn: EvalFn, step_fn: StepFn, valid_fn,
                         keep_cap: int = 0) -> ReusingSearch:
    """Tree-reusing variant: ``run`` searches from an explicit tree carry and
    ``reroot`` re-roots it on the played action (reference MCTS.py:27-36
    keeps its dict tree across moves within a game).

    ``keep_cap`` bounds the carried subtree (default: num_sims).  Tree
    capacity is ``num_sims + keep_cap + 1``."""
    if keep_cap <= 0:
        keep_cap = mcts_cfg.num_sims
    init_tree, core, M = _build_core(mcts_cfg, num_players, eval_fn, step_fn,
                                     valid_fn, keep_cap=keep_cap)
    P = num_players
    KMAX = keep_cap + 1          # kept nodes incl. the new root

    def reroot(tree: Tree, actions, next_states):
        """Re-root on (root, actions): compact the surviving subtree to the
        buffer head.  Per board, reuse applies only when the played edge has
        an expanded, non-terminal child whose stored state equals the REAL
        next state (chance draws must have matched the deterministic in-tree
        collapse — the same condition under which the reference's
        state-bytes dict lookup hits)."""
        B, Mc, _, A2 = tree.stats.shape
        A = A2 - 2
        ar_m = jnp.arange(Mc, dtype=jnp.int32)[None, :]             # [1, M]

        c_raw = jnp.take_along_axis(
            tree.stats[:, 0, _CHILD, :A], actions[:, None], axis=1,
            mode="promise_in_bounds")[:, 0].astype(jnp.float32)     # [B]
        c_star = jnp.abs(c_raw).astype(jnp.int32)
        has = c_star > 0
        child_states = _row(tree.states, c_star)
        match = (child_states == next_states).reshape(B, -1).all(-1)
        child_term = c_raw < 0.0                         # sign-packed flag
        valid = has & match & ~child_term

        # reachability from c_star: parent-pointer doubling with absorbing
        # states {c_star, root}; anc == c_star <=> node is in the subtree
        anc = jnp.where(ar_m == c_star[:, None], c_star[:, None],
                        tree.parent)
        for _ in range(max(Mc - 1, 1).bit_length()):
            anc = jnp.take_along_axis(anc, anc, axis=1,
                                      mode="promise_in_bounds")
        keep = (anc == c_star[:, None]) & valid[:, None]            # [B, M]

        # rank: c_star first, then kept nodes by visit count (desc), then
        # non-kept.  Stable sort + N(parent) >= N(child) + parents allocated
        # before children => an ancestor always precedes its descendants, so
        # truncation at KMAX never keeps an orphan.
        n_i = jnp.minimum(tree.stats[:, :, _EN, A].astype(jnp.float32),
                          2.0 ** 28).astype(jnp.int32)
        key = ((ar_m == c_star[:, None]).astype(jnp.int32) * (1 << 30)
               + keep.astype(jnp.int32) * (1 << 29) + n_i)
        order = jnp.argsort(-key, axis=1, stable=True)              # [B, M]
        rank = jnp.zeros((B, Mc), jnp.int32).at[
            jnp.arange(B)[:, None], order].set(ar_m)
        count = keep.sum(1)
        n_kept = jnp.where(valid, jnp.minimum(count, KMAX), 1)
        keep_fin = keep & (rank < n_kept[:, None])
        new_id = jnp.where(keep_fin, rank, 0)

        # remap child pointers (keeping the sign-packed terminal flag) and
        # parent ids in the OLD layout
        child_old_f = tree.stats[:, :, _CHILD, :A].astype(jnp.float32)
        child_old = jnp.abs(child_old_f).astype(jnp.int32)
        sgn_old = jnp.where(child_old_f < 0, -1.0, 1.0)
        flat = child_old.reshape(B, Mc * A)
        keep_c = jnp.take_along_axis(keep_fin, flat, axis=1,
                                     mode="promise_in_bounds")
        id_c = jnp.take_along_axis(new_id, flat, axis=1,
                                   mode="promise_in_bounds")
        child_new = jnp.where(
            (flat > 0) & keep_c,
            id_c.astype(jnp.float32) * sgn_old.reshape(B, Mc * A),
            0.0).reshape(B, Mc, A)
        sdt_l = tree.stats.dtype
        stats_old = tree.stats.at[:, :, _CHILD, :A].set(
            child_new.astype(sdt_l))

        par_keep = jnp.take_along_axis(keep_fin, tree.parent, axis=1,
                                       mode="promise_in_bounds")
        par_new = jnp.where(par_keep, jnp.take_along_axis(
            new_id, tree.parent, axis=1, mode="promise_in_bounds"), 0)

        # seat rotations (node column of lane _CHILD) rebase to the new root
        rot_c = _row(tree.stats, c_star)[:, _CHILD, A].astype(jnp.float32)
        rot_new = jnp.mod(tree.stats[:, :, _CHILD, A].astype(jnp.float32)
                          - rot_c[:, None], P)
        stats_old = stats_old.at[:, :, _CHILD, A].set(
            rot_new.astype(sdt_l))

        # gather rows into the new order, then blank rows >= n_kept and
        # whole boards without valid reuse
        def g(arr):
            idx = order.reshape((B, Mc) + (1,) * (arr.ndim - 2))
            return jnp.take_along_axis(arr, idx, axis=1,
                                       mode="promise_in_bounds")

        live = (ar_m < n_kept[:, None]) & valid[:, None]            # [B, M]
        l4 = live[:, :, None, None]
        empty_stats = jnp.zeros((4, A + 2), sdt_l)\
            .at[_PVALID, :A].set(-1.0)[None, None]
        new_tree = Tree(
            states=jnp.where(l4, g(tree.states), 0)
                   .at[:, 0].set(next_states),
            stats=jnp.where(l4, g(stats_old), empty_stats),
            parent=jnp.where(live, jnp.take_along_axis(
                par_new, order, axis=1, mode="promise_in_bounds"), 0),
        )
        return new_tree, n_kept

    return ReusingSearch(init_tree=init_tree, run=core, reroot=reroot,
                         capacity=M)
