"""Pit CLI: play any two agents against each other (reference pit.py).

Agent specs: ``random``, ``greedy``, ``alphabeta``, ``human``, or a
checkpoint path (NN+MCTS, search settings auto-restored from the checkpoint
meta like the reference's additional_keys, pit.py:50-61).

Example:
    python -m alphazero_tpu.cli.pit random greedy -n 20
    python -m alphazero_tpu.cli.pit ./temp/best.pt random -n 10 -m 200
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

log = logging.getLogger(__name__)


class MCTSPlayer:
    """Single-board player over the batched jitted search (B=1)."""

    def __init__(self, game, bundle, num_sims, cpuct=1.0, fpu=0.0,
                 temp: float = 0.0):
        import jax
        from ..games.splendor import adapter as A
        from ..search import mcts as M
        self.game = game
        self.bundle = bundle
        self.temp = temp
        net_cfg = A.net_config_for(game.cfg)
        self.search = jax.jit(M.build_search(
            M.MCTSConfig(num_sims=num_sims, cpuct=cpuct, fpu=fpu),
            game.cfg.num_players, A.make_eval_fn(net_cfg),
            A.make_search_step_fn(game.cfg), A.make_valid_fn(game.cfg)))
        self._key = jax.random.PRNGKey(0)

    def play(self, board) -> int:
        import jax
        import jax.numpy as jnp
        self._key, k = jax.random.split(self._key)
        res = self.search(self.bundle, jnp.asarray(board)[None], k)
        counts = np.asarray(res.counts)[0]
        if self.temp <= 1e-6:
            return int(counts.argmax())
        p = counts ** (1.0 / self.temp)
        p = p / p.sum()
        return int(np.random.default_rng().choice(len(p), p=p))


def create_player(spec: str, game, args):
    """Reference create_player (pit.py:32-93)."""
    from ..eval import players as P
    if spec == "random":
        return P.RandomPlayer(game, seed=args.seed)
    if spec == "greedy":
        return P.GreedyPlayer(game, seed=args.seed)
    if spec == "human":
        return P.HumanPlayer(game)
    if spec == "alphabeta":
        return P.AlphaBetaPlayer(game, depth=args.ab_depth,
                                 deadline_s=args.ab_deadline)
    # checkpoint path -> NN + MCTS
    from ..utils import checkpoint as CKPT
    ckpt = CKPT.load_checkpoint(os.path.dirname(spec) or ".",
                                os.path.basename(spec))
    meta = ckpt.get("meta", {})
    num_sims = args.numMCTSSims or int(meta.get("num_sims", 200))
    cpuct = float(meta.get("cpuct", 1.0))
    fpu = float(meta.get("fpu", 0.0))
    import jax.numpy as jnp
    import jax
    bundle = (jax.tree_util.tree_map(jnp.asarray, ckpt["params"]),
              jax.tree_util.tree_map(jnp.asarray, ckpt["batch_stats"]))
    return MCTSPlayer(game, bundle, num_sims, cpuct, fpu)


def play_games(game, players, num_games, record_dir=None, verbose=False,
               rng=None, token_limits=None):
    """Sequential host arena over the Game adapter; seats follow the
    reference's 1 2 2 1 alternation (Arena.py:195-202).  ``token_limits``
    optionally handicaps each seat's gem-holding limit (reference
    Arena.py:102-116).  Returns (wins_per_agent, draws, score_sums)."""
    n = game.getNumberOfPlayers()
    rng = rng or np.random.default_rng(0)
    wins = [0] * len(players)
    draws = 0
    scores_sum = np.zeros(len(players))
    pattern = [0, 1, 1, 0]
    seat_games = [game] * n
    if token_limits:
        from ..games.game_api import SplendorGame
        seat_games = [game if lim == game.cfg.token_limit
                      else SplendorGame(n, token_limit=lim)
                      for lim in token_limits]
    for gi in range(num_games):
        flip = pattern[gi % 4] if len(players) == 2 else gi % len(players)
        # agent controlling seat s this game
        agent_of_seat = [(s - flip) % len(players) for s in range(n)]
        board = game.getInitBoard()
        player = 0
        records = []
        for move_i in range(game.cfg.max_moves + 1):
            g = seat_games[player]
            canon = g.getCanonicalForm(board, player)
            agent = players[agent_of_seat[player]]
            a = agent.play(canon)
            valids = g.getValidMoves(canon, 0)
            assert valids[a], f"illegal move {a} from agent at seat {player}"
            if verbose:
                print(f"move {move_i} P{player}: {game.moveToString(a)}")
            if record_dir:
                records.append(board.copy())
            board, player = g.getNextState(board, player, a)
            r = game.getGameEnded(board)
            if r.any():
                top = np.flatnonzero(r > 0)
                if len(top) == 1:
                    wins[agent_of_seat[top[0]]] += 1
                else:
                    draws += 1
                for seat in range(n):
                    scores_sum[agent_of_seat[seat]] += game.getScore(board, seat)
                break
        if record_dir:
            import pickle
            os.makedirs(record_dir, exist_ok=True)
            with open(os.path.join(record_dir, f"game_{gi}.pkl"), "wb") as f:
                pickle.dump(records + [board], f)
        log.info("game %d done: wins=%s draws=%d", gi, wins, draws)
    return wins, draws, scores_sum


def _batched_agent(spec: str, env_cfg, args, closers: list):
    """Resolve an agent spec to a batched-arena Agent callable
    (canon [B,R,7], key) -> actions [B]."""
    import jax
    import jax.numpy as jnp
    from ..eval import arena as AR
    if spec == "random":
        from ..games.splendor import env as E
        valids = jax.jit(jax.vmap(lambda s: E.valid_moves(env_cfg, s, 0)))
        return AR.make_random_agent(valids)
    if spec == "greedy":
        return AR.make_greedy_agent(env_cfg)
    if spec == "alphabeta":
        from ..eval.ab_pool import AlphaBetaPool
        pool = AlphaBetaPool(env_cfg.num_players, depth=args.ab_depth,
                             deadline_s=args.ab_deadline,
                             value_ckpt=args.ab_value_ckpt)
        closers.append(pool.close)
        return pool.agent
    # checkpoint path -> batched NN+MCTS (temp=0, full search — the
    # reference pit player, pit.py:88-91)
    from ..games.splendor import adapter as A
    from ..search import mcts as M
    from ..utils import checkpoint as CKPT
    ckpt = CKPT.load_checkpoint(os.path.dirname(spec) or ".",
                                os.path.basename(spec))
    meta = ckpt.get("meta", {})
    num_sims = args.numMCTSSims or int(meta.get("num_sims", 200))
    bundle = (jax.tree_util.tree_map(jnp.asarray, ckpt["params"]),
              jax.tree_util.tree_map(jnp.asarray, ckpt["batch_stats"]))
    net_cfg = A.net_config_for(env_cfg)
    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=num_sims, cpuct=float(meta.get("cpuct", 1.0)),
                     fpu=float(meta.get("fpu", 0.0))),
        env_cfg.num_players, A.make_eval_fn(net_cfg),
        A.make_search_step_fn(env_cfg), A.make_valid_fn(env_cfg)))
    return AR.make_search_agent(search, bundle)


def play_batched(args):
    """Device-batched pit: agent A rotates through every seat, all other
    seats taken by agent B, ``num_games // num_players`` lockstep games per
    seat (the N-seat generalization of the reference's 1-2/2-1 alternation,
    Arena.py:195-202).  Used where the sequential host loop cannot finish —
    e.g. ≥20 games vs reference-config alphabeta (depth 6, 10 s/move,
    SplendorPlayers.py:15-16), whose deadline-bound moves run in a parallel
    CPU worker pool while NN moves run as one batched search on device."""
    import json
    import time
    import jax
    from ..eval import arena as AR
    from ..games.splendor import env as E

    n = args.numPlayers
    env_cfg = E.SplendorConfig(num_players=n)
    per_seat = max(args.num_games // n, 1)
    if per_seat * n != args.num_games:
        log.warning("-n %d is not a multiple of %d players: playing %d "
                    "games (%d per seat)", args.num_games, n, per_seat * n,
                    per_seat)
    if "alphabeta" in args.players and not args.ab_value_ckpt:
        # reference parity: alphabeta's leaf eval defaults to the NN
        # opponent's own value head (pit.py:71-72)
        others = [s for s in args.players if os.path.exists(s)]
        if others:
            args.ab_value_ckpt = others[0]
            log.info("alphabeta leaf values from %s", others[0])
    closers: list = []
    a_main = _batched_agent(args.players[0], env_cfg, args, closers)
    a_opp = _batched_agent(args.players[1], env_cfg, args, closers)
    arena = AR.BatchArena(env_cfg, per_seat)
    key = jax.random.PRNGKey(args.seed)
    w = l = d = 0
    t0 = time.time()
    try:
        for seat in range(n):
            key, k = jax.random.split(key)
            agents = [a_main if p == seat else a_opp for p in range(n)]
            groups = [0 if p == seat else 1 for p in range(n)]
            res = arena.play(agents, k)
            wins, dr = res.tally(groups)
            w += wins[0]
            l += wins[1]
            d += dr
            log.info("seat %d/%d done: cumulative %d-%d (%d draws)",
                     seat + 1, n, w, l, d)
    finally:
        for c in closers:
            c()
    out = {"players": args.players, "num_players": n,
           "games": w + l + d, "wins": w, "losses": l, "draws": d,
           "winrate": (w + 0.5 * d) / max(w + l + d, 1),
           "sims": args.numMCTSSims,
           "ab_depth": args.ab_depth, "ab_deadline": args.ab_deadline,
           "seconds": round(time.time() - t0, 1)}
    print(json.dumps(out))
    return out


def _tournament_paths(args):
    import glob
    import time
    paths = sorted(set(
        glob.glob(os.path.join(args.tournament, "**", "best*.pt"),
                  recursive=True)
        + glob.glob(os.path.join(args.tournament, "**", "checkpoint_*.pt"),
                    recursive=True)))
    if args.max_age_hours is not None:
        cutoff = time.time() - args.max_age_hours * 3600
        paths = [p for p in paths if os.stat(p).st_mtime >= cutoff]
    return paths


def run_tournament_batched(args):
    """Device-batched round-robin: ONE compiled search serves every
    checkpoint (bundles are exchangeable pytrees), each pair playing
    ``num_games`` split across both seat orders in lockstep sub-batches.
    Replaces the reference's multi-console sharding (pit.py:122-154) with
    on-device batching; Glicko-2 bookkeeping as in pit.py:156-199."""
    import itertools
    import jax
    import jax.numpy as jnp
    from ..eval import arena as AR
    from ..games.splendor import adapter as A
    from ..games.splendor import env as E
    from ..search import mcts as M
    from ..utils import checkpoint as CKPT

    paths = _tournament_paths(args)
    if len(paths) < 2:
        print(f"need >=2 checkpoints under {args.tournament}, "
              f"found {len(paths)}")
        return
    print(f"tournament (batched): {len(paths)} checkpoints")
    env_cfg = E.SplendorConfig(num_players=args.numPlayers)
    net_cfg = A.net_config_for(env_cfg)
    sims = args.numMCTSSims or 200
    search = jax.jit(M.build_search(
        M.MCTSConfig(num_sims=sims), env_cfg.num_players,
        A.make_eval_fn(net_cfg), A.make_search_step_fn(env_cfg),
        A.make_valid_fn(env_cfg)))

    def bundle(path):
        ck = CKPT.load_checkpoint(os.path.dirname(path) or ".",
                                  os.path.basename(path))
        return (jax.tree_util.tree_map(jnp.asarray, ck["params"]),
                jax.tree_util.tree_map(jnp.asarray, ck["batch_stats"]))

    half = max(args.num_games // 2, 1)
    arena = AR.BatchArena(env_cfg, half)
    from ..eval.glicko2 import RatingBook
    book = (RatingBook.load(args.ratings) if args.ratings else None)
    key = jax.random.PRNGKey(args.seed)
    for pa, pb in itertools.combinations(paths, 2):
        aa = AR.make_search_agent(search, bundle(pa))
        ab = AR.make_search_agent(search, bundle(pb))
        key, k1, k2 = jax.random.split(key, 3)
        w1, d1 = arena.play([aa, ab], k1).tally([0, 1])
        w2, d2 = arena.play([ab, aa], k2).tally([1, 0])
        wins = [w1[0] + w2[0], w1[1] + w2[1]]
        draws = d1 + d2
        na = os.path.relpath(pa, args.tournament)
        nb = os.path.relpath(pb, args.tournament)
        print(f"{na} vs {nb}: {wins} draws={draws}", flush=True)
        if book is not None:
            total = wins[0] + wins[1] + draws
            book.record_match(na, nb, (wins[0] + 0.5 * draws) / max(total, 1))
            book.save()
    if book is not None:
        for name, r in sorted(book.ratings.items(),
                              key=lambda kv: -kv[1].rating):
            print(f"{r.rating:7.1f} +-{r.rd:5.1f}  {name}")


def run_tournament(game, args):
    """Round-robin of recent checkpoints with Glicko-2 bookkeeping
    (reference pit.py:115-201 play_age/update_ratings — the reference's
    multi-console process sharding is replaced by one batched process)."""
    import itertools

    paths = _tournament_paths(args)
    if len(paths) < 2:
        print(f"need >=2 checkpoints under {args.tournament}, found {len(paths)}")
        return
    print(f"tournament: {len(paths)} checkpoints")
    from ..eval.glicko2 import RatingBook
    book = (RatingBook.load(args.ratings) if args.ratings else None)
    for pa, pb in itertools.combinations(paths, 2):
        players = [create_player(pa, game, args), create_player(pb, game, args)]
        wins, draws, _ = play_games(game, players, args.num_games)
        print(f"{os.path.relpath(pa, args.tournament)} vs "
              f"{os.path.relpath(pb, args.tournament)}: {wins} draws={draws}")
        if book is not None:
            total = wins[0] + wins[1] + draws
            book.record_match(pa, pb, (wins[0] + 0.5 * draws) / max(total, 1))
            book.save()
    if book is not None:
        for name, r in sorted(book.ratings.items(), key=lambda kv: -kv[1].rating):
            print(f"{r.rating:7.1f} +-{r.rd:5.1f}  {name}")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    # honor JAX_PLATFORMS even under the axon sitecustomize, which
    # force-registers the TPU plugin and ignores the env var — lets the
    # whole pit (NN search included) run host-side, freeing the chip
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    p = argparse.ArgumentParser(description="pit agents")
    p.add_argument("players", nargs="*",
                   help="2+ agent specs: random|greedy|alphabeta|human|ckpt "
                        "(omit with --tournament)")
    p.add_argument("--num-games", "-n", type=int, default=10)
    p.add_argument("--numMCTSSims", "-m", type=int, default=0)
    p.add_argument("--numPlayers", "-np", type=int, default=2)
    p.add_argument("--ab-depth", type=int, default=6,
                   help="alphabeta search depth (reference DEFAULT_DEPTH=6, "
                        "SplendorPlayers.py:16)")
    p.add_argument("--ab-deadline", type=float, default=10.0,
                   help="alphabeta per-move wall-clock budget in seconds "
                        "(reference MAX_SEARCH_TIME=10, "
                        "SplendorPlayers.py:15)")
    p.add_argument("--ab-value-ckpt", default=None,
                   help="checkpoint whose value head evaluates alphabeta "
                        "leaves (reference valueFuncNN; --batched defaults "
                        "to the NN opponent's checkpoint, else heuristic)")
    p.add_argument("--record-dir", default=None)
    p.add_argument("--ratings", default=None,
                   help="path to a glicko2 JSON book to update")
    p.add_argument("--token-limits", default=None,
                   help="per-seat gem limits, e.g. 8,10 (handicap mode; "
                        "reference Arena.py:102-116)")
    p.add_argument("--tournament", default=None, metavar="DIR",
                   help="round-robin all best*.pt under DIR instead of "
                        "explicit players (reference pit.py play_age)")
    p.add_argument("--max-age-hours", type=float, default=None,
                   help="with --tournament: only checkpoints newer than this")
    p.add_argument("--batched", action="store_true",
                   help="device-batched lockstep arena instead of the "
                        "sequential host loop (2 agent specs; alphabeta "
                        "moves run in a parallel CPU worker pool)")
    p.add_argument("--verbose", "-v", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if not args.tournament and len(args.players) < 2:
        p.error("need at least 2 agent specs (or --tournament DIR)")
    if args.batched and args.tournament:
        return run_tournament_batched(args)
    if args.batched:
        if len(args.players) != 2:
            p.error("--batched takes exactly 2 agent specs")
        return play_batched(args)

    from ..games.game_api import SplendorGame
    game = SplendorGame(args.numPlayers, seed=args.seed)

    if args.tournament:
        return run_tournament(game, args)

    limits = ([int(x) for x in args.token_limits.split(",")]
              if args.token_limits else None)
    players = [create_player(s, game, args) for s in args.players]
    wins, draws, scores = play_games(game, players, args.num_games,
                                     record_dir=args.record_dir,
                                     verbose=args.verbose,
                                     token_limits=limits)
    print(f"result: wins={wins} draws={draws} avg_scores="
          f"{(scores / max(args.num_games, 1)).round(2).tolist()}")

    if args.ratings and len(players) == 2:
        from ..eval.glicko2 import RatingBook
        book = RatingBook.load(args.ratings)
        total = wins[0] + wins[1] + draws
        score_a = (wins[0] + 0.5 * draws) / max(total, 1)
        book.record_match(args.players[0], args.players[1], score_a)
        book.save()
        print({k: round(v.rating, 1) for k, v in book.ratings.items()})


if __name__ == "__main__":
    main()
