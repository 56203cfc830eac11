"""Vectorized arena: head-to-head matches between agents.

Replaces the reference's one-game-at-a-time Arena (Arena.py:64-227) with a
batched runner: B games advance in lockstep; each seat is controlled by an
"agent" callable acting on the whole batch at once.  Seat fairness is achieved
by running the seat-permuted halves as separate sub-batches (the reference
alternates '1 2 2 1' across sequential games, Arena.py:195-202)."""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..games.splendor import env as E

# Agent: (canonical_states [B,R,7] int8, key) -> actions [B] int32
Agent = Callable[[jnp.ndarray, jax.Array], jnp.ndarray]


@dataclasses.dataclass
class MatchResult:
    outcomes: np.ndarray      # (B, n) terminal vectors, absolute seats
    scores: np.ndarray        # (B, n)
    moves: int

    def tally(self, seat_of_agent: list[int]):
        """wins per agent index given one entry per seat (N-player aware)."""
        wins = [0] * (max(seat_of_agent) + 1)
        draws = 0
        for r in self.outcomes:
            top = np.flatnonzero(r > 0)
            if len(top) == 1:
                wins[seat_of_agent[top[0]]] += 1
            else:
                draws += 1
        return wins, draws


class BatchArena:
    def __init__(self, env_cfg: E.SplendorConfig, batch_size: int,
                 token_limits: list[int] | None = None):
        """``token_limits``: optional per-seat gem-holding limit — the
        reference's handicap experiment lever (Arena.py:102-116,
        SplendorLogicNumba.py:214-215).  Rules seen by seat p use
        ``token_limit=token_limits[p]``."""
        self.cfg = env_cfg
        self.B = batch_size
        cfg = env_cfg
        self.token_limits = (list(token_limits) if token_limits
                             else [cfg.token_limit] * cfg.num_players)
        self.handicapped = any(l != cfg.token_limit for l in self.token_limits)

        def _seat_cfg(player: int) -> E.SplendorConfig:
            return dataclasses.replace(cfg,
                                       token_limit=self.token_limits[player])

        def _init(key):
            return jax.vmap(lambda k: E.initial_state(cfg, k))(
                jax.random.split(key, batch_size))

        def _canon(states, player):
            return jax.vmap(lambda s: E.swap_players(cfg, s, player))(states)

        def _make_step(scfg):
            def _step(states, actions, player, key):
                u = jax.random.uniform(key, (batch_size, 2))
                s2, nxt = jax.vmap(
                    lambda s, a, uu: E.step(scfg, s, a, player, uu, False)
                )(states, actions, u)
                return s2, nxt
            return jax.jit(_step)

        self.init = jax.jit(_init)
        self.canon = jax.jit(_canon)
        by_limit = {}
        for p in range(cfg.num_players):
            lim = self.token_limits[p]
            if lim not in by_limit:
                scfg = _seat_cfg(p)
                by_limit[lim] = (
                    _make_step(scfg),
                    jax.jit(jax.vmap(
                        lambda s, c=scfg: E.valid_moves(c, s, 0))))
        self._steps = [by_limit[self.token_limits[p]][0]
                       for p in range(cfg.num_players)]
        self._valids = [by_limit[self.token_limits[p]][1]
                        for p in range(cfg.num_players)]
        self.ends = jax.jit(jax.vmap(lambda s: E.check_end_game(cfg, s)))
        self.judge = jax.jit(jax.vmap(lambda s: E.judge(cfg, s)))
        self.scores = jax.jit(jax.vmap(lambda s: E.all_scores(cfg, s)))

    def step(self, states, actions, player, key):
        return self._steps[player](states, actions, player, key)

    def valids(self, states, player: int = 0):
        return self._valids[player](states)

    def play(self, agents: list[Agent], key, start_states=None,
             start_player: int = 0) -> MatchResult:
        """agents[p] acts for seat p. All B games run to completion."""
        cfg, B = self.cfg, self.B
        key, k0 = jax.random.split(key)
        states = self.init(k0) if start_states is None else start_states
        player = start_player
        done = np.zeros(B, bool)
        outcomes = np.zeros((B, cfg.num_players), np.float32)
        moves = 0
        for _ in range(cfg.max_moves + 1):
            canon = self.canon(states, player)
            key, ka, ku = jax.random.split(key, 3)
            actions = agents[player](canon, ka)
            states, nxt = self.step(states, actions, player, ku)
            pending = np.asarray(nxt) == player
            if cfg.enable_noble_select and pending.any():
                # same mover picks a noble; boards without a pending choice
                # keep their stepped state
                key, ka2, ku2 = jax.random.split(key, 3)
                canon2 = self.canon(states, player)
                acts2 = agents[player](canon2, ka2)
                stepped2, _ = self.step(states, acts2, player, ku2)
                states = jnp.where(
                    jnp.asarray(pending)[:, None, None], stepped2, states)
            player = (player + 1) % cfg.num_players
            moves += 1
            # stateful agents (cross-move tree reuse) follow EVERY move of
            # the game via reroot — the batched analog of the reference pit
            # players whose MCTS dict persists across all moves (MCTS.py:27)
            observers = [a for a in agents if hasattr(a, "on_move")]
            if observers:
                next_canon = self.canon(states, player)
                seen = set()
                for a in observers:       # dedupe: one reroot per agent even
                    if id(a) not in seen:  # when it holds several seats
                        seen.add(id(a))
                        a.on_move(actions, next_canon)
            ends = np.asarray(self.ends(states))
            newly = ends.any(1) & ~done
            outcomes[newly] = ends[newly]
            done |= newly
            if done.all():
                break
        if not done.all():
            # move-cap cutoff: settle by score + card-count tiebreak even off
            # a turn boundary (reference Arena.py relies on the engine judge)
            forced = np.asarray(self.judge(states))
            outcomes[~done] = forced[~done]
        return MatchResult(outcomes=outcomes,
                           scores=np.asarray(self.scores(states)),
                           moves=moves)


def make_search_agent(search_fn, params_bundle, temp: float = 0.0) -> Agent:
    """Greedy (temp=0) agent over a jitted batched search — the reference's
    pit/gating player (Coach.py:152-153, pit.py:88-91)."""
    def agent(canon, key):
        res = search_fn(params_bundle, canon, key)
        if temp <= 1e-6:
            return jnp.argmax(res.counts, axis=-1)
        logits = jnp.log(jnp.maximum(res.counts, 1e-12)) / temp
        g = jax.random.gumbel(key, res.counts.shape)
        return jnp.argmax(logits + g, axis=-1)
    return agent


class ReusingAgent:
    """Arena agent with CROSS-MOVE TREE REUSE: keeps one array tree for the
    whole game (all seats), searching from it on its own turns and
    re-rooting on every move played — the batched analog of the reference's
    pit players whose MCTS dict persists across moves (MCTS.py:27-36,
    pit.py:50-61).  Built from ``mcts.build_reusing_search``; requires the
    owning ``BatchArena.play`` loop, which calls ``on_move`` after every
    step (including the opponent's).

    Per-board validation inside ``reroot`` falls back to a fresh root
    whenever the stored child state mismatches the real next state (chance
    draw diverged), so reuse is exactly as safe as the reference's
    state-bytes dict hit."""

    def __init__(self, reusing_search, bundle, temp: float = 0.0):
        self.rs = reusing_search
        self.bundle = bundle
        self.temp = temp
        self.tree = None
        self.n = None
        self._run = jax.jit(self.rs.run)
        self._reroot = jax.jit(self.rs.reroot)
        self._init = jax.jit(self.rs.init_tree)

    def reset(self):
        self.tree = None

    def __call__(self, canon, key):
        if self.tree is None:
            self.tree, self.n = self._init(canon)
        res, self.tree, self.n = self._run(self.bundle, self.tree, self.n,
                                           key)
        if self.temp <= 1e-6:
            return jnp.argmax(res.counts, axis=-1)
        logits = jnp.log(jnp.maximum(res.counts, 1e-12)) / self.temp
        g = jax.random.gumbel(key, res.counts.shape)
        return jnp.argmax(logits + g, axis=-1)

    def on_move(self, actions, next_canon):
        if self.tree is not None:
            self.tree, self.n = self._reroot(self.tree, actions, next_canon)


def make_random_agent(valids_fn) -> Agent:
    """Uniform random over valid moves (reference SplendorPlayers.py:18-25)."""
    def agent(canon, key):
        v = valids_fn(canon)
        g = jax.random.gumbel(key, v.shape)
        return jnp.argmax(jnp.where(v, g, -jnp.inf), axis=-1)
    return agent


def make_greedy_agent(env_cfg: E.SplendorConfig) -> Agent:
    """Vectorized 1-ply score maximizer with the reference's tie-break ladder
    (SplendorPlayers.py:93-115): play the valid move with the largest
    immediate score gain; if nothing gains, prefer buys (actions <12), then
    3-gem takes (30-59), else any valid move — random within the pool."""
    cfg = env_cfg
    A = cfg.num_actions
    # Only buys (board 0-11, reserved 27-29) can raise the mover's score
    # (card points + noble award); every other Splendor action is
    # score-neutral, so the 1-ply lookahead only steps these 15 candidates.
    cand = jnp.array(list(range(12)) + [27, 28, 29], jnp.int32)

    def one_board(s):
        valid = E.valid_moves(cfg, s, 0)
        s0 = E.all_scores(cfg, s)[0]

        def after(a):
            s2, _ = E.step(cfg, s, a, 0, jnp.zeros(2), True)
            return E.all_scores(cfg, s2)[0]

        cand_gain = jax.vmap(after)(cand) - s0
        gain = jnp.zeros((A,), cand_gain.dtype).at[cand].set(cand_gain)
        gain = jnp.where(valid, gain, -(2 ** 14))
        return valid, gain

    def agent(canon, key):
        valid, gain = jax.vmap(one_board)(canon)
        best = gain.max(-1, keepdims=True)
        ids = jnp.arange(A, dtype=jnp.int32)[None, :]
        pool_gain = valid & (gain == best)
        pool_buy = valid & (ids < 12)
        pool_take = valid & (ids >= 30) & (ids < 60)
        fallback = jnp.where(
            pool_buy.any(-1, keepdims=True), pool_buy,
            jnp.where(pool_take.any(-1, keepdims=True), pool_take, valid))
        pool = jnp.where(best > 0, pool_gain, fallback)
        g = jax.random.gumbel(key, pool.shape)
        return jnp.argmax(jnp.where(pool, g, -jnp.inf), axis=-1)\
                  .astype(jnp.int32)

    return jax.jit(agent)


def two_player_gate(env_cfg, search_fn, new_bundle, old_bundle, games: int,
                    key) -> tuple[int, int, int]:
    """Arena gating: play ``games`` split into both seat orders.
    Returns (new_wins, old_wins, draws) (reference Coach.py:152-156)."""
    half = max(games // 2, 1)
    arena = BatchArena(env_cfg, half)
    new_agent = make_search_agent(search_fn, new_bundle)
    old_agent = make_search_agent(search_fn, old_bundle)
    k1, k2 = jax.random.split(key)
    r1 = arena.play([new_agent, old_agent], k1)
    r2 = arena.play([old_agent, new_agent], k2)
    w1, d1 = r1.tally([0, 1])
    w2, d2 = r2.tally([1, 0])
    return w1[0] + w2[0], w1[1] + w2[1], d1 + d2


class FusedMatch:
    """Whole games fused on device: ``chunk_moves`` moves of (canonicalize ->
    per-seat-bundle search -> greedy action -> env step with chance) inside
    one jitted lax.scan, eliminating per-move host round-trips.  Agents are
    one shared search program evaluated with a per-seat parameter bundle
    (stacked on a leading axis and dynamically selected by current seat)."""

    def __init__(self, env_cfg: E.SplendorConfig, search_fn,
                 batch_size: int, chunk_moves: int = 16):
        self.cfg = env_cfg
        self.B = batch_size
        self.chunk_moves = chunk_moves
        cfg = env_cfg

        def _init(key):
            return jax.vmap(lambda k: E.initial_state(cfg, k))(
                jax.random.split(key, batch_size))

        n = cfg.num_players

        # Canonical-rotation representation (see selfplay._chunk): states stay
        # canonical, ``offset`` is the absolute seat at canonical seat 0, and
        # every env call uses the static player index 0.
        def _chunk(bundles, states, offset, done, results, key):
            def body(carry, key_t):
                states, offset, done, results = carry
                ks, ku, kn = jax.random.split(key_t, 3)
                bundle = jax.tree_util.tree_map(lambda x: x[offset], bundles)
                res = search_fn(bundle, states, ks)
                actions = jnp.argmax(res.counts, axis=-1)
                u = jax.random.uniform(ku, (batch_size, 2))

                def step_main(s, a, uu, d):
                    s2, nxt = E.step(cfg, s, a, 0, uu, False)
                    s2 = jnp.where(d, s, s2)
                    adv = jnp.where(d, 1, jnp.asarray(nxt, jnp.int32))
                    return s2, adv

                states_mid, adv = jax.vmap(step_main)(states, actions, u,
                                                      done)
                if cfg.enable_noble_select:
                    # resolve a pending noble choice inside the macro-move
                    # (same mover, hence the SAME seat bundle) so every board
                    # advances exactly one seat per scan step
                    pend = adv == 0

                    def resolve(states_mid):
                        kn2, ku2 = jax.random.split(kn)
                        res2 = search_fn(bundle, states_mid, kn2)
                        acts2 = jnp.argmax(res2.counts, axis=-1)
                        u2 = jax.random.uniform(ku2, (batch_size, 2))
                        s3 = jax.vmap(
                            lambda s, a, uu: E.step(cfg, s, a, 0, uu,
                                                    False)[0]
                        )(states_mid, acts2, u2)
                        return jnp.where(pend[:, None, None], s3, states_mid)

                    states_mid = jax.lax.cond(pend.any(), resolve,
                                              lambda s: s, states_mid)
                states2 = jax.vmap(
                    lambda s: E.swap_players(cfg, s, 1))(states_mid)
                offset2 = (offset + 1) % n
                ends = jnp.roll(jax.vmap(
                    lambda s: E.check_end_game(cfg, s))(states2),
                    offset2, axis=1)
                newly = ends.any(1) & ~done
                results = jnp.where(newly[:, None], ends, results)
                return (states2, offset2, done | newly, results), None

            init = (states, offset, done, results)
            carry, _ = jax.lax.scan(body, init,
                                    jax.random.split(key, chunk_moves))
            return carry

        self.init = jax.jit(_init)
        self.chunk = jax.jit(_chunk)
        self.judge = jax.jit(jax.vmap(lambda s: E.judge(cfg, s)))
        self.scores = jax.jit(jax.vmap(lambda s: E.all_scores(cfg, s)))

    def play(self, seat_bundles: list, key) -> MatchResult:
        """seat_bundles[p] = parameter bundle controlling seat p."""
        cfg, B = self.cfg, self.B
        bundles = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *seat_bundles)
        key, k0 = jax.random.split(key)
        states = self.init(k0)
        offset = jnp.int32(0)
        done = jnp.zeros(B, jnp.bool_)
        results = jnp.zeros((B, cfg.num_players), jnp.float32)
        moves = 0
        for _ in range((cfg.max_moves + self.chunk_moves - 1)
                       // self.chunk_moves):
            key, kc = jax.random.split(key)
            states, offset, done, results = self.chunk(
                bundles, states, offset, done, results, kc)
            moves += self.chunk_moves
            if bool(np.asarray(done).all()):
                break
        results_np = np.asarray(results)
        done_np = np.asarray(done)
        if not done_np.all():
            # loop exhausted with games still running (e.g. noble-select
            # double-plies consuming scan steps): settle them by the engine
            # judge instead of tallying all-zero rows as draws.  States are
            # canonical; roll back to absolute seats like the in-scan ends.
            forced = np.roll(np.asarray(self.judge(states)), int(offset),
                             axis=1)
            results_np = np.where(done_np[:, None], results_np, forced)
        scores = np.roll(np.asarray(self.scores(states)), int(offset), axis=1)
        return MatchResult(outcomes=results_np, scores=scores, moves=moves)


def fused_two_player_gate(env_cfg, raw_search_fn, new_bundle, old_bundle,
                          games: int, key,
                          chunk_moves: int = 16) -> tuple[int, int, int]:
    """Device-fused arena gating; both seat orders run as one doubled batch
    with a per-board seat assignment encoded by bundle stacking order."""
    half = max(games // 2, 1)
    match = FusedMatch(env_cfg, raw_search_fn, half, chunk_moves)
    k1, k2 = jax.random.split(key)
    r1 = match.play([new_bundle, old_bundle], k1)
    r2 = match.play([old_bundle, new_bundle], k2)
    w1, d1 = r1.tally([0, 1])
    w2, d2 = r2.tally([1, 0])
    return w1[0] + w2[0], w1[1] + w2[1], d1 + d2
