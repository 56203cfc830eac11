"""Self-play -> train -> arena-gate orchestrator.

The reference Coach (Coach.py:102-162) drives numIters iterations of
(numEps sequential episodes -> history trim -> train -> arena gate at
updateThreshold).  Here every stage is batched on device; the host only
orchestrates and owns the replay buffer."""

from __future__ import annotations

import dataclasses
import logging
import os
import time

import jax
import numpy as np

from ..eval import arena as AR
from ..games.splendor import adapter as A
from ..games.splendor import env as E
from ..models import splendor_net as N
from ..search import mcts as M
from ..utils import checkpoint as CKPT
from . import selfplay as SP
from . import trainer as TR
from .replay import ReplayBuffer

log = logging.getLogger(__name__)


def completed_iterations(checkpoint_dir: str) -> int:
    """Highest iteration number recorded in ``metrics.jsonl`` (0 when none).
    Drives resume continuity: a restarted run picks up at the next iteration
    with monotone numbering in the SAME metrics file, instead of restarting
    its counter (reference resume semantics, Coach.py:175-208)."""
    import json
    path = os.path.join(checkpoint_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return 0
    done = 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                done = max(done, int(json.loads(line).get("iter", 0)))
            except (ValueError, KeyError, TypeError, AttributeError):
                # tolerate any malformed line ("iter": null, non-dict JSON,
                # truncated write at crash time) — resume must not die on it
                continue
    return done


@dataclasses.dataclass
class CoachConfig:
    num_players: int = 2
    score_win: int = 15                  # rule variant lever (tests/smokes)
    num_iters: int = 50
    games_per_iter: int = 128            # numEps
    selfplay_batch: int = 128
    num_sims: int = 100
    ratio_full: int = 5
    prob_full: float = 0.25
    temp_threshold: int = 10
    cpuct: float = 1.0
    fpu: float = 0.0
    forced_playouts: bool = False
    dirichlet_alpha: float = 0.2
    prior_temp: float = 1.25
    tree_reuse: bool = False             # cross-move tree carryover (see
                                         # docs/PERF.md before enabling on TPU)
    stage_sims: str = "auto"             # staged tree-capacity schedule for
                                         # fresh searches (MCTSConfig.stage_sims)
    # training
    learn_rate: float = 3e-4
    vl_weight: float = 10.0
    batch_size: int = 32
    epochs: int = 2
    surprise_weight: bool = False
    val_split: float = 0.0               # held-out validation fraction
    dropout: float = 0.3
    nn_version: int = 1
    net_width: int = 128                 # trunk width (reference fixed 128)
    history: int = 5                      # numItersHistory
    max_examples_per_iter: int = 400_000
    # training-dynamics levers against the N>2 value-head collapse (4P runs
    # showed l_v pinned at 0.75 == the variance of a constant prediction of
    # +1/-1 winner vectors, with vl_weight*l_v dominating the trunk
    # gradient): ramp the value-loss weight linearly over the first
    # ``vl_warmup_iters`` iterations (0 = off, full weight immediately)
    vl_warmup_iters: int = 0
    # gating
    update_threshold: float = 0.6
    arena_games: int = 30
    gate_num_sims: int = 0                # 0 -> num_sims
    # "threshold": reference semantics — accept only past the (fair-share
    #   scaled) winrate bar, else roll back (Coach.py:152-162).  Prone to
    #   deadlock for N>2: once candidates stop clearing the bar, params
    #   freeze, self-play data stops moving, and every retrain from the
    #   same distribution produces the same rejected candidate (observed:
    #   r8_3p iters 27-52, r10_4p all 12).
    # "always": modern AlphaZero — every iteration's net becomes the new
    #   best (no rollback); the gate match still runs and is recorded as
    #   the progress signal.
    gate_mode: str = "threshold"
    # learning-curve evaluation: pit the current net vs random AND greedy
    # baselines every iteration (0 = off); results land in metrics.jsonl
    eval_baseline_games: int = 0
    eval_num_sims: int = 0                # 0 -> gate sims (probe can be
                                          # shallower than the gate search)
    # minibatch updates fused per device dispatch (0 = unfused legacy loop)
    train_chunk_steps: int = 64
    # shard self-play + training over all visible devices via a mesh with an
    # 'env' axis (no-op on one chip; extends to pods via jax.distributed)
    use_mesh: bool = True
    checkpoint_dir: str = "./checkpoints"
    seed: int = 0


class Coach:
    def __init__(self, cfg: CoachConfig):
        self.cfg = cfg
        self.env_cfg = E.SplendorConfig(num_players=cfg.num_players,
                                        score_win=cfg.score_win)
        self.net_cfg = A.net_config_for(self.env_cfg, dropout=cfg.dropout,
                                        nn_version=cfg.nn_version,
                                        width=cfg.net_width)
        self.eval_fn = A.make_eval_fn(self.net_cfg)
        self.key = jax.random.PRNGKey(cfg.seed)
        self.np_rng = np.random.default_rng(cfg.seed)

        self.key, k_init = jax.random.split(self.key)
        self.train_state = TR.init_train_state(self.net_cfg, k_init)
        self.train_cfg = TR.TrainConfig(
            learn_rate=cfg.learn_rate, vl_weight=cfg.vl_weight,
            batch_size=cfg.batch_size, epochs=cfg.epochs,
            val_split=cfg.val_split)
        self.eval_step = (TR.make_eval_step(self.env_cfg, self.net_cfg,
                                            self.train_cfg)
                          if cfg.val_split > 0 else None)

        # env-sharded SPMD across devices when more than one is visible; the
        # mesh spans the largest device count that evenly divides both the
        # self-play batch and the training minibatch
        self.mesh = None
        n_mesh = next((k for k in range(jax.device_count(), 1, -1)
                       if cfg.selfplay_batch % k == 0
                       and cfg.batch_size % k == 0), 1)
        if cfg.use_mesh and n_mesh > 1:
            from ..parallel import mesh as MP
            self.mesh = MP.make_mesh(n_mesh)
            self.train_step = MP.make_sharded_train_step(
                self.env_cfg, self.net_cfg, self.train_cfg, self.mesh)
            log.info("mesh: sharding over %d devices", n_mesh)
        else:
            self.train_step = TR.make_train_step(self.env_cfg, self.net_cfg,
                                                 self.train_cfg)
        self.train_chunk = (TR.make_train_chunk(
            self.env_cfg, self.net_cfg, self.train_cfg, mesh=self.mesh)
            if cfg.train_chunk_steps > 0 else None)

        sp_cfg = SP.SelfPlayConfig(
            batch_size=cfg.selfplay_batch, num_sims=cfg.num_sims,
            ratio_full=cfg.ratio_full, prob_full=cfg.prob_full,
            temp_threshold=cfg.temp_threshold, cpuct=cfg.cpuct, fpu=cfg.fpu,
            forced_playouts=cfg.forced_playouts,
            dirichlet_alpha=cfg.dirichlet_alpha, prior_temp=cfg.prior_temp,
            tree_reuse=cfg.tree_reuse, stage_sims=cfg.stage_sims)
        self.selfplay = SP.SelfPlayEngine(self.env_cfg, self.eval_fn, sp_cfg,
                                          mesh=self.mesh)

        gate_sims = cfg.gate_num_sims or cfg.num_sims
        gate_mcfg = M.MCTSConfig(num_sims=gate_sims, cpuct=cfg.cpuct,
                                 fpu=cfg.fpu)
        # raw (unjitted) search — the fused gate jits whole move chunks;
        # the FusedMatch is built once so gate calls reuse its compilation
        self.gate_search = M.build_search(
            gate_mcfg, cfg.num_players, self.eval_fn,
            A.make_search_step_fn(self.env_cfg),
            A.make_valid_fn(self.env_cfg))
        self._gate_match = AR.FusedMatch(
            self.env_cfg, self.gate_search,
            max(cfg.arena_games // cfg.num_players, 1))

        self.replay = ReplayBuffer(history=cfg.history,
                                   max_per_iter=cfg.max_examples_per_iter)
        self._eval_arena = None        # built lazily on first baseline eval

    # ------------------------------------------------------------------ API
    @property
    def bundle(self):
        return (self.train_state.params, self.train_state.batch_stats)

    def self_play_iteration(self):
        cfg = self.cfg
        its, stats_acc = [], {"games": 0, "examples": 0, "rollouts": 0}
        games_done = 0
        t0 = time.time()
        while games_done < cfg.games_per_iter:
            self.key, k = jax.random.split(self.key)
            it, stats = self.selfplay.run_games(self.bundle, k, self.np_rng)
            games_done += stats["games"]
            for s in ("games", "examples", "rollouts"):
                stats_acc[s] += stats[s]
            if it is not None:
                its.append(it)
        dt = time.time() - t0
        stats_acc["seconds"] = dt
        stats_acc["rollouts_per_s"] = stats_acc["rollouts"] / max(dt, 1e-9)
        if stats_acc["examples"] >= cfg.max_examples_per_iter:
            log.warning(
                "saturation of examples (%d >= max_examples_per_iter=%d): "
                "think about decreasing games_per_iter or raising the cap",
                stats_acc["examples"], cfg.max_examples_per_iter)
        if its:
            from .replay import Iteration
            merged = Iteration(*(np.concatenate([getattr(i, f) for i in its])
                                 for f in ("boards", "pi", "winner", "scdiff",
                                           "valids", "surprise")))
            self.replay.add_iteration(merged)
        return stats_acc

    def train_iteration(self, it: int = 0):
        self.key, k = jax.random.split(self.key)
        # value-loss warmup: ramp vl_weight linearly over the first
        # vl_warmup_iters iterations so early (uninformative) winner targets
        # cannot dominate the trunk gradient and collapse the value head
        # (the observed 4P failure; vl enters the jitted step as a traced
        # scalar so the ramp costs no recompiles)
        w = self.cfg.vl_warmup_iters
        vl_scale = min(1.0, max(it, 1) / w) if w > 0 else 1.0

        def save_intermediary(epoch, state, metrics):
            # rolling mid-train snapshot (reference intermediary checkpoints,
            # GenericNNetWrapper.py:131-137)
            if epoch + 1 < self.train_cfg.epochs:
                CKPT.save_checkpoint(self.cfg.checkpoint_dir,
                                     "intermediary.pt",
                                     params=state.params,
                                     batch_stats=state.batch_stats,
                                     meta={"epoch": epoch, **metrics})

        self.train_state, metrics = TR.fit(
            self.train_state, self.train_step, self.replay, self.train_cfg,
            self.np_rng, k, surprise_weight=self.cfg.surprise_weight,
            eval_step_fn=self.eval_step, on_epoch_end=save_intermediary,
            train_chunk_fn=self.train_chunk,
            chunk_steps=self.cfg.train_chunk_steps,
            vl_scale=vl_scale,
            log_every=500)   # live loss meter (reference tqdm postfix,
                             # GenericNNetWrapper.py:63,99)
        metrics["vl_scale"] = vl_scale
        if not np.isfinite(metrics.get("loss", 0.0)):
            # NaN/inf guard (failure detection, SURVEY §5.3): a diverged train
            # step must not poison best.pt via the gate — roll back to the
            # pre-train snapshot and report the bad loss for the record
            log.error("non-finite train loss %s: rolling back to temp.pt",
                      metrics.get("loss"))
            if os.path.exists(os.path.join(self.cfg.checkpoint_dir,
                                           "temp.pt")):
                ckpt = CKPT.load_network(self.cfg.checkpoint_dir, "temp.pt",
                                         self.train_state.params)
                self.train_state = self.train_state._replace(
                    params=jax.tree_util.tree_map(jax.numpy.asarray,
                                                  ckpt["params"]),
                    batch_stats=jax.tree_util.tree_map(
                        jax.numpy.asarray, ckpt["batch_stats"]))
                # the diverged Adam moments are themselves non-finite — a
                # params-only rollback would blow up again on the next step
                self.train_state = TR.reset_opt_state(self.train_state)
        return metrics

    def gate(self, old_bundle) -> tuple[bool, tuple[int, int, int]]:
        """New net vs previous best with full seat rotation: the candidate
        occupies each of the N seats in turn (generalizes the reference's
        1-2/2-1 alternation, Arena.py:195-202, to N players).

        ``update_threshold`` keeps its 2-player meaning ("win at least
        this fraction of decided games", reference Coach.py:156): with N
        players the candidate holds 1 of N seats, so an EQUAL net wins
        only 1/N of decided games — the acceptance bar scales by
        fair-share (threshold * (1/N)/0.5), otherwise an N>2 gate rejects
        nearly everything (observed: 3P gates hovering at 0.33)."""
        n = self.cfg.num_players
        self.key, k = jax.random.split(self.key)
        nw = ow = dr = 0
        for r, kr in enumerate(jax.random.split(k, n)):
            seats = [self.bundle if p == r else old_bundle for p in range(n)]
            wins, d = self._gate_match.play(seats, kr).tally(
                [0 if p == r else 1 for p in range(n)])
            nw += wins[0]
            ow += wins[1]
            dr += d
        bar = self.cfg.update_threshold * (1.0 / n) / 0.5
        accept = (nw + ow) > 0 and nw / (nw + ow) >= bar
        return accept, (nw, ow, dr)

    def eval_vs_baselines(self) -> dict:
        """Pit the current net (gate search, temp=0) against the random and
        greedy baselines, the net rotating through every seat (N-player
        generalization of the reference's 1-2/2-1 alternation), returning
        winrates with draws counted 0.5.  NOTE: with N > 2 the net faces
        N-1 baseline opponents at once, so an equal-strength agent scores
        the fair share 1/N, not 0.5 — the probe reports that baseline as
        ``eval_fair_share`` so curves are comparable across player counts.
        This is the learning-curve probe the reference demonstrates via
        pit.py runs (README.md:97, SplendorPlayers.py:18-115)."""
        cfg = self.cfg
        per_seat = max(cfg.eval_baseline_games // cfg.num_players, 1)
        if self._eval_arena is None:
            self._eval_arena = AR.BatchArena(self.env_cfg, per_seat)
            self._greedy_agent = AR.make_greedy_agent(self.env_cfg)
            self._random_agent = AR.make_random_agent(self._eval_arena.valids)
            eval_sims = (cfg.eval_num_sims or cfg.gate_num_sims
                         or cfg.num_sims)
            eval_mcfg = M.MCTSConfig(num_sims=eval_sims, cpuct=cfg.cpuct,
                                     fpu=cfg.fpu)
            self._eval_search = jax.jit(M.build_search(
                eval_mcfg, cfg.num_players, self.eval_fn,
                A.make_search_step_fn(self.env_cfg),
                A.make_valid_fn(self.env_cfg)))
        net = AR.make_search_agent(self._eval_search, self.bundle)
        out = {}
        n = cfg.num_players
        for name, opp in (("random", self._random_agent),
                          ("greedy", self._greedy_agent)):
            # the net occupies each of the N seats in turn, every other seat
            # taken by the baseline (N-player generalization of the
            # reference's 1-2/2-1 alternation, Arena.py:195-202)
            w = l = d = 0
            for seat in range(n):
                self.key, k = jax.random.split(self.key)
                agents = [net if p == seat else opp for p in range(n)]
                groups = [0 if p == seat else 1 for p in range(n)]
                wins, dr = self._eval_arena.play(agents, k).tally(groups)
                w += wins[0]
                l += wins[1]
                d += dr
            out[f"wins_vs_{name}"] = w
            out[f"losses_vs_{name}"] = l
            out[f"draws_vs_{name}"] = d
            out[f"winrate_vs_{name}"] = (w + 0.5 * d) / max(w + l + d, 1)
        # an equal-strength agent vs N-1 baselines wins ~1/N of games — log
        # the fair share so 3P/4P curves read correctly next to 2P ones
        out["eval_fair_share"] = 1.0 / n
        return out

    def _append_metrics(self, record: dict):
        """Persistent per-iteration training history (metrics.jsonl) — the
        observability the reference only surfaces transiently via tqdm
        meters (GenericNNetWrapper.py:63,99)."""
        import json
        os.makedirs(self.cfg.checkpoint_dir, exist_ok=True)
        path = os.path.join(self.cfg.checkpoint_dir, "metrics.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def learn(self, on_iteration=None, start_iter: int = 1):
        """Run iterations ``start_iter .. num_iters`` (``num_iters`` is the
        TOTAL budget, so a resumed run continues the same monotone iteration
        numbering in one metrics.jsonl — reference resume parity,
        Coach.py:175-208 + main.py:62-80).  ``start_iter`` is normally
        inferred from metrics.jsonl via ``completed_iterations``."""
        cfg = self.cfg
        if start_iter > cfg.num_iters:
            log.info("run already complete (%d/%d iterations)",
                     start_iter - 1, cfg.num_iters)
            return
        if start_iter > 1:
            # de-correlate the resumed segment from a fresh run's key walk
            # (without this, iteration k after a restart replays iteration
            # 1's randomness)
            self.key = jax.random.fold_in(self.key, start_iter)
            self.np_rng = np.random.default_rng(
                np.random.SeedSequence([cfg.seed, start_iter]))
        CKPT.save_settings(cfg.checkpoint_dir, dataclasses.asdict(cfg))
        CKPT.save_code_snapshot(cfg.checkpoint_dir)
        for it in range(start_iter, cfg.num_iters + 1):
            t_iter = time.time()
            log.info("Iter %d: self-play...", it)
            sp_stats = self.self_play_iteration()
            log.info("Iter %d: %d examples, %.0f rollouts/s", it,
                     sp_stats["examples"], sp_stats["rollouts_per_s"])
            self.replay.save(os.path.join(cfg.checkpoint_dir,
                                          "checkpoint.examples"))

            # deep-copy: the donated train step will delete the live buffers
            old_bundle = jax.tree_util.tree_map(
                lambda x: jax.numpy.array(x, copy=True), self.bundle)
            CKPT.save_checkpoint(cfg.checkpoint_dir, "temp.pt",
                                 params=self.train_state.params,
                                 batch_stats=self.train_state.batch_stats,
                                 opt_state=self.train_state.opt_state,
                                 meta=dataclasses.asdict(cfg))
            metrics = self.train_iteration(it)
            log.info("Iter %d: train %s", it, metrics)

            accept, (nw, ow, dr) = self.gate(old_bundle)
            gate_passed = accept
            if cfg.gate_mode == "always":
                # modern AlphaZero: the latest net always becomes best (no
                # rollback — breaks the N>2 gate deadlock where frozen
                # params regenerate the same rejected candidate forever);
                # the gate match above is still recorded as the progress
                # signal
                accept = True
            if accept:
                log.info("Iter %d: new vs prev %d-%d (%d draws) ACCEPTED",
                         it, nw, ow, dr)
                CKPT.save_checkpoint(cfg.checkpoint_dir, f"checkpoint_{it}.pt",
                                     params=self.train_state.params,
                                     batch_stats=self.train_state.batch_stats,
                                     opt_state=self.train_state.opt_state,
                                     meta=dataclasses.asdict(cfg))
                CKPT.save_checkpoint(cfg.checkpoint_dir, "best.pt",
                                     params=self.train_state.params,
                                     batch_stats=self.train_state.batch_stats,
                                     opt_state=self.train_state.opt_state,
                                     meta=dataclasses.asdict(cfg))
            else:
                log.info("Iter %d: new vs prev %d-%d (%d draws) REJECTED",
                         it, nw, ow, dr)
                ckpt = CKPT.load_checkpoint(cfg.checkpoint_dir, "temp.pt")
                self.train_state = self.train_state._replace(
                    params=jax.tree_util.tree_map(
                        lambda x, ref: jax.numpy.asarray(x), ckpt["params"],
                        self.train_state.params),
                    batch_stats=jax.tree_util.tree_map(
                        lambda x: jax.numpy.asarray(x), ckpt["batch_stats"]))
            record = {
                "iter": it,
                **{f"selfplay_{k}": v for k, v in sp_stats.items()},
                **{f"train_{k}": v for k, v in metrics.items()},
                "gate_new": nw, "gate_old": ow, "gate_draws": dr,
                # decided-game winrate with its binomial stderr, so the
                # accept/reject record carries its own confidence
                "gate_winrate": nw / max(nw + ow, 1),
                "gate_bar": cfg.update_threshold * (1.0 / cfg.num_players)
                            / 0.5,
                "gate_stderr": float(np.sqrt(
                    max(nw * ow, 1)) / max(nw + ow, 1) ** 1.5),
                "accepted": accept,
                "gate_passed_bar": gate_passed,
                "gate_mode": cfg.gate_mode,
                "replay_examples": len(self.replay),
            }
            if cfg.eval_baseline_games > 0:
                ev = self.eval_vs_baselines()
                record.update(ev)
                log.info("Iter %d: winrate vs random %.2f, vs greedy %.2f",
                         it, ev["winrate_vs_random"], ev["winrate_vs_greedy"])
            record["iter_seconds"] = time.time() - t_iter
            self._append_metrics(record)
            if on_iteration:
                on_iteration(it, sp_stats, metrics, (nw, ow, dr), accept)

    # --------------------------------------------------------------- resume
    def load_checkpoint(self, folder, filename, load_examples=True,
                        fallback=False):
        # strict -> partial-transfer chain; sibling-checkpoint fallback only
        # when explicitly requested (a typoed resume path must fail loudly,
        # not silently resume a different network)
        ckpt = CKPT.load_network(folder, filename, self.train_state.params,
                                 fallback=fallback)
        ex_path = os.path.join(folder, "checkpoint.examples")
        if load_examples and os.path.exists(ex_path):
            self.replay = ReplayBuffer.load(
                ex_path, history=self.cfg.history,
                max_per_iter=self.cfg.max_examples_per_iter)
            log.info("resumed %d replay examples from %s",
                     len(self.replay), ex_path)
        self.train_state = self.train_state._replace(
            params=jax.tree_util.tree_map(jax.numpy.asarray, ckpt["params"]),
            batch_stats=jax.tree_util.tree_map(jax.numpy.asarray,
                                               ckpt["batch_stats"]))
        if ckpt.get("opt_state") is not None and ckpt["load_mode"] == "strict":
            # resume the Adam moments so a crash-restart does not silently
            # reset the optimizer mid-run (reference keeps its optimizer
            # in-process across train calls, GenericNNetWrapper.py:49)
            try:
                self.train_state = self.train_state._replace(
                    opt_state=jax.tree_util.tree_map(
                        jax.numpy.asarray, ckpt["opt_state"]))
                log.info("restored optimizer state from checkpoint")
            except Exception as e:                # structure changed: reinit
                log.warning("optimizer state in checkpoint incompatible "
                            "(%s); starting with fresh moments", e)
                self.train_state = TR.reset_opt_state(self.train_state)
        diff = CKPT.compare_settings(folder, dataclasses.asdict(self.cfg))
        if diff:
            log.info("settings changed vs checkpoint: %s", diff)
        return ckpt.get("meta", {})
