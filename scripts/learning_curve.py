#!/usr/bin/env python3
"""Render the learning curve of a training run (metrics.jsonl -> PNG + md).

Produces the arena-winrate learning-curve evidence demanded by
BASELINE.json ("Arena-winrate learning-curve parity") from the coach's
per-iteration metrics history.

Usage: python scripts/learning_curve.py runs/r4 [docs/learning_curve.png]
"""

import json
import sys

# validated categorical palette (slots 1-3, fixed order) + ink/surface tokens
BLUE, ORANGE, AQUA = "#2a78d6", "#eb6834", "#1baf7a"
INK, INK2, SURFACE = "#0b0b0b", "#52514e", "#fcfcfb"


def load(run_dir):
    rows = []
    with open(f"{run_dir}/metrics.jsonl") as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    # legacy runs (pre resume-continuity) restarted the coach's iteration
    # numbering on every crash-restart; fall back to the cumulative record
    # index only when the recorded sequence is not strictly increasing
    its = [r.get("iter", 0) for r in rows]
    if any(b <= a for a, b in zip(its, its[1:])):
        for i, r in enumerate(rows):
            r["iter"] = i + 1
    return rows


def md_table(rows):
    out = ["| iter | winrate vs random | winrate vs greedy | gate (new-old) | "
           "accepted | train loss | val loss |",
           "|---|---|---|---|---|---|---|"]
    for r in rows:
        out.append(
            f"| {r['iter']} | {r.get('winrate_vs_random', float('nan')):.2f} "
            f"| {r.get('winrate_vs_greedy', float('nan')):.2f} "
            f"| {r['gate_new']}-{r['gate_old']} | "
            f"{'yes' if r['accepted'] else 'no'} "
            f"| {r['train_loss']:.2f} | {r.get('train_val_loss', float('nan')):.2f} |")
    return "\n".join(out)


def plot(rows, out_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    its = [r["iter"] for r in rows]
    wr_rand = [r.get("winrate_vs_random") for r in rows]
    wr_greedy = [r.get("winrate_vs_greedy") for r in rows]

    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    ax.plot(its, wr_rand, color=BLUE, lw=2, marker="o", ms=4,
            label="vs random")
    ax.plot(its, wr_greedy, color=ORANGE, lw=2, marker="o", ms=4,
            label="vs greedy")
    accepted = [r["iter"] for r in rows if r["accepted"]]
    ax.plot(accepted, [-0.04] * len(accepted), ls="none", marker="^", ms=5,
            color=AQUA, label="gate accepted")

    # equal-strength reference: 1 net vs N-1 baselines scores 1/N, not 0.5
    fair = rows[-1].get("eval_fair_share", 0.5) if rows else 0.5
    ax.axhline(fair, color=INK2, lw=0.8, ls=(0, (3, 3)), alpha=0.5)
    ax.annotate(f"fair share {fair:.2f}", (0.01, fair),
                xycoords=("axes fraction", "data"),
                textcoords="offset points", xytext=(0, 3),
                color=INK2, fontsize=7)
    ax.set_ylim(-0.08, 1.02)
    ax.set_xlabel("training iteration", color=INK2)
    ax.set_ylabel("arena winrate (draws = 0.5)", color=INK2)
    ax.set_title("Learning curve: batched self-play on one TPU chip",
                 color=INK, loc="left", fontsize=11)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK2)
    ax.tick_params(colors=INK2, labelsize=8)
    ax.grid(axis="y", color=INK2, alpha=0.12, lw=0.6)
    # direct labels on line ends + legend (identity never color-alone)
    if wr_rand and wr_rand[-1] is not None:
        ax.annotate(f"{wr_rand[-1]:.2f}", (its[-1], wr_rand[-1]),
                    textcoords="offset points", xytext=(6, 0),
                    color=INK, fontsize=8)
    if wr_greedy and wr_greedy[-1] is not None:
        ax.annotate(f"{wr_greedy[-1]:.2f}", (its[-1], wr_greedy[-1]),
                    textcoords="offset points", xytext=(6, 0),
                    color=INK, fontsize=8)
    ax.legend(frameon=False, labelcolor=INK, fontsize=8, loc="center right")
    fig.tight_layout()
    fig.savefig(out_path, facecolor=SURFACE)
    print(f"wrote {out_path}")


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/r4"
    out = sys.argv[2] if len(sys.argv) > 2 else "docs/learning_curve.png"
    rows = load(run_dir)
    print(md_table(rows))
    plot(rows, out)


if __name__ == "__main__":
    main()
