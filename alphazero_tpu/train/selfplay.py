"""Vectorized self-play: B games stepped in lockstep on device.

Replaces the reference's one-game-at-a-time executeEpisode (Coach.py:50-100)
with a batched actor: every move runs ONE batched MCTS over all live boards
(leaf NN evals batched [B]-wide), then one vmapped env step with real chance
draws.  Playout-cap randomization (MCTS.py:54-56) picks full vs fast search
per move for the whole batch; examples are stored only for full-search moves,
tagged with the root-Q surprise vector, and finalized with per-player
winner / score-diff vectors rolled into each mover's frame (Coach.py:89-100).
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


class SelfPlayEngine:
    def __init__(self, env_cfg: E.SplendorConfig, eval_fn, cfg: SelfPlayConfig):
        self.env_cfg = env_cfg
        self.cfg = cfg
        self.n = env_cfg.num_players
        step_fn = A.make_search_step_fn(env_cfg)
        valid_fn = A.make_valid_fn(env_cfg)

        full = M.MCTSConfig(
            num_sims=cfg.num_sims, cpuct=cfg.cpuct, fpu=cfg.fpu,
            forced_playouts=cfg.forced_playouts, add_noise=True,
            dirichlet_alpha=cfg.dirichlet_alpha, prior_temp=cfg.prior_temp)
        fast = M.MCTSConfig(
            num_sims=max(cfg.num_sims // cfg.ratio_full, 2),
            cpuct=cfg.cpuct, fpu=cfg.fpu)
        self.search_full = jax.jit(
            M.build_search(full, self.n, eval_fn, step_fn, valid_fn))
        self.search_fast = jax.jit(
            M.build_search(fast, self.n, eval_fn, step_fn, valid_fn))

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
        self.scores_batch = jax.jit(_scores_batch)
        self.sample_actions = jax.jit(_sample_actions)

    def run_games(self, params_bundle, key, np_rng: np.random.Generator,
                  collect: bool = True):
        """Play one batch of games to completion.

        Returns (Iteration | None, stats dict)."""
        cfg, n = self.cfg, self.n
        B = cfg.batch_size
        max_moves = cfg.max_moves or self.env_cfg.max_moves

        key, k0 = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
        states = self.init_batch(k0)
        player = 0
        done = np.zeros(B, bool)
        results = np.zeros((B, n), np.float32)
        collected = []          # (boards, pi, valids, q, player, alive)
        total_moves = 0
        total_sims = 0

        for move in range(max_moves):
            canon = self.canonical(states, player)
            is_full = bool(np_rng.random() < cfg.prob_full)
            key, ks, ka, ku = jax.random.split(key, 4)
            search = self.search_full if is_full else self.search_fast
            res = search(params_bundle, canon, ks)
            sims = cfg.num_sims if is_full else max(cfg.num_sims // cfg.ratio_full, 2)
            alive = ~done
            total_moves += int(alive.sum())
            total_sims += int(alive.sum()) * sims

            if collect and is_full:
                counts = np.asarray(res.counts)
                pi = counts / np.maximum(counts.sum(1, keepdims=True), 1e-9)
                valids = np.asarray(self.valid_batch(canon))
                collected.append((np.asarray(canon), pi.astype(np.float16),
                                  valids, np.asarray(res.q), player,
                                  alive.copy()))

            temp = cfg.temp_early if move < cfg.temp_threshold else cfg.temp_late
            # selection uses the (possibly pruned) counts, like the reference
            # random_pick over getActionProb's output (Coach.py:83)
            actions = self.sample_actions(res.counts, jnp.float32(temp), ka)
            states, player_dev = self.step_batch(states, actions, player, ku)
            player = int(player_dev)

            ends = np.asarray(self.end_batch(states))
            newly = ends.any(1) & ~done
            if newly.any():
                results[newly] = ends[newly]
                done |= newly
            if done.all():
                break

        # unfinished games count as draws at move cap
        if not done.all():
            ends = np.asarray(self.end_batch(states))
            results[~done] = ends[~done]

        stats = {
            "games": B,
            "avg_moves": total_moves / B,
            "rollouts": total_sims,
            "examples": 0,
        }
        if not collect or not collected:
            return None, stats

        scores = np.asarray(self.scores_batch(states))      # (B, n) absolute
        boards_l, pi_l, val_l, win_l, sd_l, sur_l = [], [], [], [], [], []
        for boards, pi, valids, q, pl, alive in collected:
            idx = np.flatnonzero(alive)
            if len(idx) == 0:
                continue
            r = results[idx]                                 # absolute frame
            winner = np.stack([np.roll(r[i], -pl) for i in range(len(idx))])
            sc = scores[idx]
            sd = np.stack([
                np.roll(sc[i] - sc[i, pl], -pl) for i in range(len(idx))])
            boards_l.append(boards[idx])
            pi_l.append(pi[idx])
            val_l.append(valids[idx])
            win_l.append(winner.astype(np.float16))
            sd_l.append(np.clip(sd, -127, 127).astype(np.int8))
            sur_l.append(np.abs(q[idx, 0] - winner[:, 0]).astype(np.float16))

        if not boards_l:
            return None, stats
        it = Iteration(
            boards=np.concatenate(boards_l),
            pi=np.concatenate(pi_l),
            winner=np.concatenate(win_l),
            scdiff=np.concatenate(sd_l),
            valids=np.concatenate(val_l),
            surprise=np.concatenate(sur_l),
        )
        stats["examples"] = len(it)
        return it, stats
