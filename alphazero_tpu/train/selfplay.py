"""Vectorized self-play: B games stepped in lockstep on device.

Replaces the reference's one-game-at-a-time executeEpisode (Coach.py:50-100)
with a batched actor: every move runs batched MCTS over all live boards
(leaf NN evals batched [B]-wide), then one vmapped env step with real chance
draws.  Playout-cap randomization (MCTS.py:54-56) is PER BOARD PER MOVE: each
move the batch is randomly partitioned into a full-search sub-batch of
``round(prob_full * B)`` boards and a fast sub-batch (stratified version of
the reference's per-game Bernoulli), with finished boards biased into the
fast half so full searches are never wasted on dead games.  Examples are
stored only for full-search moves, tagged with the per-player root-Q
surprise vector (reference Coach.py:75,94 stores the q vector), and
finalized with per-player winner / score-diff vectors rolled into each
mover's frame (Coach.py:89-100).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..games.splendor import adapter as A
from ..games.splendor import env as E
from ..search import mcts as M
from .replay import Iteration


@dataclasses.dataclass(frozen=True)
class SelfPlayConfig:
    batch_size: int = 128
    num_sims: int = 100
    ratio_full: int = 5            # fast sims = num_sims // ratio_full
    prob_full: float = 0.25
    temp_threshold: int = 10       # moves at temp=2, then temp=0.2 (Coach :83)
    temp_early: float = 2.0
    temp_late: float = 0.2
    cpuct: float = 1.0
    fpu: float = 0.0
    forced_playouts: bool = False
    dirichlet_alpha: float = 0.2
    prior_temp: float = 1.25       # args.temperature[0]
    max_moves: int = 0             # 0 -> env max
    chunk_moves: int = 16          # moves fused into one jitted scan call
    # carry each board's search tree across moves, re-rooted on the played
    # action (reference MCTS.py:27-36 keeps its tree within a game); reuse
    # only validates when the real chance draw matched the in-tree collapse.
    # Default OFF: measured ~9x cost per rollout on TPU for <=4x
    # strength-per-sim, plus an open TPU-runtime corruption hazard at some
    # shapes — see docs/PERF.md "tree reuse costs and hazards"
    tree_reuse: bool = False
    # descent/path-buffer depth cap: with reused trees the worst-case path
    # equals the tree capacity (2x sims), which would double the backup
    # einsum's level axis; real Splendor searches stay far shallower, so cap
    # it (the node at the cap is re-evaluated, not expanded — mctx max_depth
    # semantics)
    max_depth: int = 64
    # MCTS edge-stats storage dtype ("float32" | "bfloat16"); bfloat16 halves
    # the backup's HBM traffic but requires tree capacity <= 256 (exact
    # integer counts) — see MCTSConfig.stats_dtype; "auto" resolves to
    # bfloat16 on TPU for fresh trees with capacity <= 256 (the production
    # S=128 shape), float32 otherwise (incl. all reuse trees)
    stats_dtype: str = "auto"
    # staged tree-capacity schedule for the fresh-tree searches (see
    # MCTSConfig.stage_sims; composes exactly with max_depth).  "auto"
    # resolves to the doubling schedule on the full search (S>=64) and
    # leaves the fast search single-stage; ignored when tree_reuse is on
    # (reusing searches always run full-size)
    stage_sims: str = "auto"
    # --- class-2 reuse-corruption investigation levers (docs/PERF.md) ---
    # donate the fused-chunk carry (tree buffers reused in place by XLA);
    # False forces fresh output buffers every chunk call
    donate_chunk: bool = True
    # insert jax.lax.optimization_barrier between the reroot's whole-tree
    # compaction gathers and the next search that consumes them
    reuse_barrier: bool = False
    # emit per-wave tree-root state + post-search root prior-validity as
    # extra scan outputs (forensic dump channel for AZTPU_DEBUG_BAD)
    debug_outputs: bool = False


class SelfPlayEngine:
    def __init__(self, env_cfg: E.SplendorConfig, eval_fn, cfg: SelfPlayConfig,
                 mesh=None):
        """``mesh``: optional jax.sharding.Mesh with an 'env' axis — the
        self-play batch (boards, trees, results) shards over it and GSPMD
        propagates the sharding through the fused move chunks (SPMD scaling
        per SURVEY §7; the reference is single-process, README.md:112-115)."""
        self.env_cfg = env_cfg
        self.cfg = cfg
        self.mesh = mesh
        self.n = env_cfg.num_players
        step_fn = A.make_search_step_fn(env_cfg)
        valid_fn = A.make_valid_fn(env_cfg)

        full = M.MCTSConfig(
            num_sims=cfg.num_sims, cpuct=cfg.cpuct, fpu=cfg.fpu,
            forced_playouts=cfg.forced_playouts, add_noise=True,
            dirichlet_alpha=cfg.dirichlet_alpha, prior_temp=cfg.prior_temp,
            max_depth=cfg.max_depth, stats_dtype=cfg.stats_dtype,
            stage_sims=cfg.stage_sims)
        fast = M.MCTSConfig(
            num_sims=max(cfg.num_sims // cfg.ratio_full, 2),
            cpuct=cfg.cpuct, fpu=cfg.fpu, max_depth=cfg.max_depth,
            stats_dtype=cfg.stats_dtype, stage_sims=cfg.stage_sims)
        ecfg = env_cfg

        def _init_batch(key):
            keys = jax.random.split(key, cfg.batch_size)
            return jax.vmap(lambda k: E.initial_state(ecfg, k))(keys)

        def _canonical(states, player):
            return jax.vmap(lambda s: E.swap_players(ecfg, s, player))(states)

        def _step_batch(states, actions, player, key):
            u = jax.random.uniform(key, (states.shape[0], 2))
            s2, nxt = jax.vmap(
                lambda s, a, uu: E.step(ecfg, s, a, player, uu, False)
            )(states, actions, u)
            return s2, nxt[0]

        def _end_batch(states):
            return jax.vmap(lambda s: E.check_end_game(ecfg, s))(states)

        def _judge_batch(states):
            return jax.vmap(lambda s: E.judge(ecfg, s))(states)

        def _scores_batch(states):
            return jax.vmap(lambda s: E.all_scores(ecfg, s))(states)

        def _sample_actions(counts, temp, key):
            # sample a ~ counts^(1/temp) via Gumbel-max; temp ~ 0 -> argmax
            logits = jnp.where(counts > 0, jnp.log(jnp.maximum(counts, 1e-12)),
                               -jnp.inf)
            g = jax.random.gumbel(key, counts.shape)
            return jnp.argmax(jnp.where(temp > 1e-6,
                                        logits / jnp.maximum(temp, 1e-6) + g,
                                        logits), axis=-1)

        self.valid_batch = jax.jit(jax.vmap(valid_fn))
        self.init_batch = jax.jit(_init_batch)
        self.canonical = jax.jit(_canonical)
        self.step_batch = jax.jit(_step_batch)
        self.end_batch = jax.jit(_end_batch)
        self.judge_batch = jax.jit(_judge_batch)
        self.scores_batch = jax.jit(_scores_batch)
        self.sample_actions = jax.jit(_sample_actions)

        # ------------------------------------------------------------------
        # Fused actor: ``chunk_moves`` whole moves (search + action sample +
        # env step + bookkeeping) inside ONE jit as a lax.scan, so per-move
        # host<->device round-trips (~25 ms each over the TPU tunnel)
        # disappear.  This is the TPU equivalent of the reference's inner
        # self-play loop (Coach.py:62-88) — but batched and device-resident.
        # ------------------------------------------------------------------
        search_full_fn = M.build_search(full, self.n, eval_fn, step_fn, valid_fn)
        search_fast_fn = M.build_search(fast, self.n, eval_fn, step_fn, valid_fn)
        n = self.n

        # Tree-reusing variants share ONE capacity so the whole batch carries
        # a single tree pytree regardless of which half (full/fast) a board
        # lands in each move; reroot caps the kept subtree for the stricter
        # (full) follow-up search.
        if cfg.tree_reuse:
            rs_full = M.build_reusing_search(
                full, self.n, eval_fn, step_fn, valid_fn,
                keep_cap=full.num_sims)
            rs_fast = M.build_reusing_search(
                fast, self.n, eval_fn, step_fn, valid_fn,
                keep_cap=rs_full.capacity - fast.num_sims - 1)
            assert rs_fast.capacity == rs_full.capacity
            self.init_tree = jax.jit(rs_full.init_tree)

        def _resolve_nobles(bundle, states_mid, adv, key):
            """Boards whose last step left a pending noble choice (adv==0)
            pick a noble via a fast search in the same mover's frame; all
            other boards pass through untouched."""
            pend = adv == 0

            def resolve(states_mid):
                kn, ku2 = jax.random.split(key)
                res2 = search_fast_fn(bundle, states_mid, kn)
                acts2 = jnp.argmax(res2.counts, axis=-1).astype(jnp.int32)
                u2 = jax.random.uniform(ku2, (states_mid.shape[0], 2))
                s3 = jax.vmap(
                    lambda s, a, uu: E.step(ecfg, s, a, 0, uu, False)[0]
                )(states_mid, acts2, u2)
                return jnp.where(pend[:, None, None], s3, states_mid)

            return jax.lax.cond(pend.any(), resolve,
                                lambda s: s, states_mid)

        # States are kept CANONICAL throughout (current player at seat 0), a
        # scalar rotation offset tracks which absolute player that is.  Every
        # env call then uses the static player index 0, so all per-player row
        # arithmetic constant-folds (no per-board dynamic slices), and the
        # per-move canonicalization collapses to one constant-shift
        # swap_players(·, 1) fused into the step.
        B = cfg.batch_size
        B_full = int(round(cfg.prob_full * B))
        if cfg.prob_full >= 1.0:
            B_full = B
        elif cfg.prob_full > 0.0:
            B_full = min(max(B_full, 1), B - 1) if B > 1 else B

        def _chunk(bundle, carry0, key):
            def body(carry, key_t):
                if cfg.tree_reuse:
                    states, offset, move, done, results, tree, nn_t = carry
                else:
                    states, offset, move, done, results = carry
                k_part, ks, ks2, ka, ku, kn = jax.random.split(key_t, 6)
                valids = jax.vmap(valid_fn)(states)

                # per-board full/fast partition (stratified PCR, MCTS.py:54-56);
                # finished boards sort last so they land in the fast half
                if B_full >= B or B_full == 0:
                    if cfg.tree_reuse:
                        rs = rs_full if B_full >= B else rs_fast
                        res, tree, nn_t = rs.run(bundle, tree, nn_t, ks)
                    else:
                        sfn = search_full_fn if B_full >= B else search_fast_fn
                        res = sfn(bundle, states, ks)
                    counts, q = res.counts, res.q
                    is_full_b = jnp.full((B,), B_full >= B, jnp.bool_)
                else:
                    u_b = jax.random.uniform(k_part, (B,))
                    perm = jnp.argsort(u_b + done.astype(jnp.float32))
                    idx_full, idx_fast = perm[:B_full], perm[B_full:]
                    # merge the two halves back in board order with ONE
                    # inverse-permutation gather (no scatters)
                    inv = jnp.zeros((B,), jnp.int32).at[perm].set(
                        jnp.arange(B, dtype=jnp.int32))
                    merge = lambda a_, b_: jnp.take(  # noqa: E731
                        jnp.concatenate([a_, b_], 0), inv, 0)
                    if cfg.tree_reuse:
                        tf = jax.tree_util.tree_map(
                            lambda x: jnp.take(x, idx_full, 0), tree)
                        ts = jax.tree_util.tree_map(
                            lambda x: jnp.take(x, idx_fast, 0), tree)
                        res_f, tf, nf = rs_full.run(
                            bundle, tf, jnp.take(nn_t, idx_full, 0), ks)
                        res_s, ts, nns = rs_fast.run(
                            bundle, ts, jnp.take(nn_t, idx_fast, 0), ks2)
                        tree = jax.tree_util.tree_map(merge, tf, ts)
                        nn_t = merge(nf, nns)
                    else:
                        res_f = search_full_fn(
                            bundle, jnp.take(states, idx_full, 0), ks)
                        res_s = search_fast_fn(
                            bundle, jnp.take(states, idx_fast, 0), ks2)
                    counts = merge(res_f.counts, res_s.counts)
                    q = merge(res_f.q, res_s.q)
                    is_full_b = merge(
                        jnp.ones((B_full,), jnp.bool_),
                        jnp.zeros((B - B_full,), jnp.bool_))
                temp = jnp.where(move < cfg.temp_threshold,
                                 cfg.temp_early, cfg.temp_late)
                actions = _sample_actions(counts, temp, ka)
                u = jax.random.uniform(ku, (states.shape[0], 2))

                # finished boards skip the game step (so final scores reflect
                # the position at termination, like the reference which stops
                # each game there, Coach.py:88) but still rotate seats so the
                # whole batch shares one canonical rotation offset.
                def step_main(s, a, uu, d):
                    s2, nxt = E.step(ecfg, s, a, 0, uu, False)
                    s2 = jnp.where(d, s, s2)
                    adv = jnp.where(d, 1, jnp.asarray(nxt, jnp.int32))
                    return s2, adv

                states_mid, adv = jax.vmap(step_main)(states, actions, u, done)
                if ecfg.enable_noble_select:
                    # A pending noble choice keeps the mover's turn (adv==0).
                    # Resolve it INSIDE the macro-move with a fast search so
                    # the whole batch still advances exactly one seat (keeps
                    # the shared canonical rotation).  The noble ply itself is
                    # not stored as a training example; its visit counts still
                    # steer play.
                    states_mid = _resolve_nobles(bundle, states_mid, adv, kn)
                states2 = jax.vmap(
                    lambda s: E.swap_players(ecfg, s, 1))(states_mid)
                offset2 = (offset + 1) % n
                ends_rel = jax.vmap(
                    lambda s: E.check_end_game(ecfg, s))(states2)
                ends = jnp.roll(ends_rel, offset2, axis=1)   # absolute seats
                newly = ends.any(1) & ~done
                results = jnp.where(newly[:, None], ends, results)
                out = (states, counts, valids, q, offset,
                       ~done, is_full_b)
                if cfg.debug_outputs and cfg.tree_reuse:
                    # forensic channel: the search's OWN view of the root —
                    # its stored state and which actions its (refreshed)
                    # prior lane considers valid after this wave's search
                    A_ = counts.shape[-1]
                    out = out + (tree.states[:, 0],
                                 tree.stats[:, 0, M._PVALID, :A_] >= 0)
                if cfg.tree_reuse:
                    # re-root every board's tree on the played action; boards
                    # whose real chance draw diverged from the in-tree
                    # collapse (or that resolved a noble ply) fall back to a
                    # fresh root automatically via the state-match check
                    tree, nn_t = rs_full.reroot(tree, actions, states2)
                    if cfg.reuse_barrier:
                        # keep XLA from fusing/aliasing the reroot's
                        # whole-tree compaction gathers with the next
                        # iteration's consumers (class-2 investigation)
                        tree, nn_t = jax.lax.optimization_barrier(
                            (tree, nn_t))
                    next_carry = (states2, offset2, move + 1, done | newly,
                                  results, tree, nn_t)
                else:
                    next_carry = (states2, offset2, move + 1, done | newly,
                                  results)
                return next_carry, out

            return jax.lax.scan(body, carry0,
                                jax.random.split(key, cfg.chunk_moves))

        self.chunk = jax.jit(
            _chunk, donate_argnums=(1,) if cfg.donate_chunk else ())

    def run_games(self, params_bundle, key, np_rng: np.random.Generator,
                  collect: bool = True):
        """Play one batch of games to completion.

        Returns (Iteration | None, stats dict)."""
        cfg, n = self.cfg, self.n
        B = cfg.batch_size
        max_moves = cfg.max_moves or self.env_cfg.max_moves

        key, k0 = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
        states = self.init_batch(k0)
        carry = (states, jnp.int32(0), jnp.int32(0),
                 jnp.zeros(B, jnp.bool_), jnp.zeros((B, n), jnp.float32))
        if cfg.tree_reuse:
            carry = carry + self.init_tree(states)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(self.mesh, P("env"))
            rep = NamedSharding(self.mesh, P())

            def place(x):
                sh = data if getattr(x, "ndim", 0) >= 1 and x.shape[0] == B \
                    else rep
                return jax.device_put(x, sh)

            carry = jax.tree_util.tree_map(place, carry)
            params_bundle = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), params_bundle)
        collected = []          # per-chunk host copies of full-search moves
        total_moves = 0
        total_sims = 0
        fast_sims = max(cfg.num_sims // cfg.ratio_full, 2)

        for _ in range((max_moves + cfg.chunk_moves - 1) // cfg.chunk_moves):
            key, kc = jax.random.split(key)
            carry, outs = self.chunk(params_bundle, carry, kc)
            states, offset, move, done, results = carry[:5]
            (canon_t, counts_t, valids_t, q_t, player_t, alive_t, full_t,
             *dbg) = (np.asarray(o) for o in outs)
            total_moves += int(alive_t.sum())
            total_sims += (int((alive_t & full_t).sum()) * cfg.num_sims
                           + int((alive_t & ~full_t).sum()) * fast_sims)
            if collect:
                for t in range(full_t.shape[0]):
                    mask = alive_t[t] & full_t[t]
                    if not mask.any():
                        continue
                    idx = np.flatnonzero(mask)
                    counts = counts_t[t][idx]
                    vm = valids_t[t][idx]
                    # correctness backstop: a root visit count on an invalid
                    # action means the search/tree-carry produced counts for
                    # a state other than the stored one (observed rarely on
                    # the TPU runtime with tree reuse) — drop that mass
                    # rather than poison the policy targets
                    bad = counts * ~vm
                    if bad.any():
                        import logging
                        import os as _os
                        logging.getLogger(__name__).warning(
                            "masking %d root visits on invalid actions "
                            "across %d examples", int(bad.sum()),
                            int((bad.sum(1) > 0).sum()))
                        dump = _os.environ.get("AZTPU_DEBUG_BAD")
                        if dump and not getattr(self, "_bad_dumped", False):
                            # one-shot forensic snapshot of the first corrupt
                            # wave (class-2 investigation, docs/PERF.md):
                            # boards + FULL batch context so the analyzer can
                            # test row-permutation hypotheses
                            self._bad_dumped = True
                            extra = ({"root_states": dbg[0],
                                      "root_pv_valid": dbg[1]}
                                     if dbg else {})
                            np.savez_compressed(
                                dump, t=t, idx=idx,
                                boards=canon_t, counts=counts_t,
                                valids=valids_t, q=q_t,
                                alive=alive_t, full=full_t, **extra)
                        counts = counts * vm
                        # a row whose EVERY visited action was invalid has no
                        # usable policy target, and its board/value came from
                        # the same corrupted search — drop it entirely
                        keep = counts.sum(1) > 0
                        if not keep.all():
                            idx = idx[keep]
                            counts = counts[keep]
                            vm = vm[keep]
                            if len(idx) == 0:
                                continue
                    pi = counts / np.maximum(counts.sum(1, keepdims=True), 1e-9)
                    collected.append((canon_t[t][idx], pi.astype(np.float16),
                                      vm, q_t[t][idx],
                                      int(player_t[t]), idx))
            if bool(np.asarray(done).all()):
                break

        # unfinished games: judge at move cap (reference scores tiebreak)
        results_np = np.array(results)
        done_np = np.asarray(done)
        off = int(offset)
        if not done_np.all():
            # settle by the unconditional judge: at a chunk-granularity cutoff
            # the round count need not sit on a turn boundary (3-4P), where
            # check_end_game would report "still running"
            ends = np.roll(np.asarray(self.judge_batch(states)), off, axis=1)
            results_np[~done_np] = ends[~done_np]

        stats = {
            "games": B,
            "avg_moves": total_moves / B,
            "rollouts": total_sims,
            "examples": 0,
        }
        if not collect or not collected:
            return None, stats

        # scores come back in the final canonical frame; rotate to absolute
        scores = np.roll(np.asarray(self.scores_batch(states)), off, axis=1)
        it = finalize_examples(collected, results_np, scores)
        if it is None:
            return None, stats
        stats["examples"] = len(it)
        return it, stats


def finalize_examples(collected, results: np.ndarray,
                      scores: np.ndarray) -> Iteration | None:
    """Roll each game's final outcome into every stored example's mover frame
    (reference Coach.py:89-100): ``winner = roll(result, -player)``,
    ``scdiff = roll(scores - scores[player], -player)``, plus the per-player
    surprise vector ``|q - winner|`` (the reference tags the root-Q vector
    per example, Coach.py:75,94, and weights sampling by it,
    GenericNNetWrapper.py:332-341).

    ``collected``: list of per-move tuples ``(boards [E,R,7], pi [E,A],
    valids [E,A], q [E,P] mover-frame root Q, player, board_idx [E])``;
    ``results``/``scores``: ``[B, P]`` absolute-seat final arrays."""
    boards_l, pi_l, val_l, win_l, sd_l, sur_l = [], [], [], [], [], []
    for boards, pi, valids, q, pl, idx in collected:
        if len(idx) == 0:
            continue
        r = results[idx]                                     # absolute frame
        winner = np.roll(r, -pl, axis=1)
        sc = scores[idx]
        sd = np.roll(sc - sc[:, pl:pl + 1], -pl, axis=1)
        boards_l.append(boards)
        pi_l.append(pi)
        val_l.append(valids)
        win_l.append(winner.astype(np.float16))
        sd_l.append(np.clip(sd, -127, 127).astype(np.int8))
        sur_l.append(np.abs(q - winner).astype(np.float16))

    if not boards_l:
        return None
    return Iteration(
        boards=np.concatenate(boards_l),
        pi=np.concatenate(pi_l),
        winner=np.concatenate(win_l),
        scdiff=np.concatenate(sd_l),
        valids=np.concatenate(val_l),
        surprise=np.concatenate(sur_l),
    )
