"""Render the round-5 quality artifacts as figures.

Reads the committed JSONs (artifacts/eval_r05_tilt_sweep.json,
artifacts/curve_r05.json) and writes docs/tilt_sweep.png — the Fig-4 analog
(metric response vs exponential tilt, the product's headline
controllability evidence) — and docs/learning_curve.png (train loss + eval
metrics vs step for both training seeds).

Pure matplotlib over the committed artifacts; re-run after regenerating
them (tools/make_r05_artifacts.py).

Run (repo root):  python tools/plot_artifacts.py
"""

from __future__ import annotations

import json
import os
import re

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")
DOCS = os.path.join(REPO, "docs")

# validated default categorical palette, slots 1-2 (light mode)
BLUE, ORANGE = "#2a78d6", "#eb6834"
SURFACE, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"
GRID = "#e6e5e1"


def _style(ax, title, xlabel, ylabel):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, fontsize=10, color=INK, pad=8)
    ax.set_xlabel(xlabel, fontsize=9, color=INK2)
    ax.set_ylabel(ylabel, fontsize=9, color=INK2)
    ax.grid(True, color=GRID, linewidth=0.8)
    ax.tick_params(colors=INK2, labelsize=8)
    for s in ax.spines.values():
        s.set_color(GRID)
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)


def _series(block: dict, metric: str) -> tuple[np.ndarray, np.ndarray]:
    """Mean over eval seeds -> (tilts sorted ascending, metric means)."""
    by_tilt: dict[float, list[float]] = {}
    for key, m in block.items():
        match = re.fullmatch(r"seed\d+_tilt(-?\d+(?:\.\d+)?)", key)
        if match:
            by_tilt.setdefault(float(match.group(1)), []).append(m[metric])
    tilts = np.asarray(sorted(by_tilt))
    return tilts, np.asarray([np.mean(by_tilt[t]) for t in tilts])


def plot_tilt_sweep() -> None:
    with open(os.path.join(ART, "eval_r05_tilt_sweep.json")) as f:
        sweep = json.load(f)
    fig, axes = plt.subplots(1, 3, figsize=(10.5, 3.2), facecolor=SURFACE)
    # panel choice mirrors what tests/test_eval_artifact.py pins: the veh
    # axis responds monotonically in ADE (negative tilt = away from GT) and
    # goal rate; the goal axis responds graded-monotone in ADE (its
    # goal-RATE sign is inverted on this corpus — premature-arrival
    # conditioning, documented in the test)
    panels = (
        (axes[0], "ade", "veh-veh tilt $\\kappa$",
         "Displacement error (ADE, m)", "lower = closer to GT driving",
         (("veh_conflict", "conflict scenes", BLUE),
          ("veh_normal", "normal scenes", ORANGE))),
        (axes[1], "goal", "veh-veh tilt $\\kappa$", "Goal success rate",
         "negative tilt degrades goal reaching",
         (("veh_conflict", "conflict scenes", BLUE),
          ("veh_normal", "normal scenes", ORANGE))),
        (axes[2], "ade", "goal tilt $\\kappa$",
         "Displacement error (ADE, m)", "graded response on the goal axis",
         (("goal_conflict", "conflict scenes", BLUE),)),
    )
    for ax, metric, xlabel, ylabel, subtitle, series in panels:
        for block_key, label, color in series:
            tilts, ys = _series(sweep[block_key], metric)
            ax.plot(tilts, ys, color=color, linewidth=2, marker="o",
                    markersize=5, label=label)
        ax.set_xscale("symlog", linthresh=10)
        _style(ax, subtitle, xlabel, ylabel)
        ax.axvline(0.0, color=GRID, linewidth=1)
        if len(series) > 1:
            ax.legend(fontsize=8, frameon=False, labelcolor=INK2)
    fig.suptitle(
        "Exponential tilting steers the policy (mean of 2 eval seeds, "
        "256 held-out scenes; artifacts/eval_r05_tilt_sweep.json)",
        fontsize=10, color=INK,
    )
    fig.tight_layout(rect=(0, 0, 1, 0.92))
    out = os.path.join(DOCS, "tilt_sweep.png")
    fig.savefig(out, dpi=160, facecolor=SURFACE)
    print(f"wrote {out}")


def plot_learning_curve() -> None:
    with open(os.path.join(ART, "curve_r05.json")) as f:
        curve = json.load(f)
    fig, axes = plt.subplots(1, 3, figsize=(10.5, 3.2), facecolor=SURFACE)
    colors = {"0": BLUE, "1": ORANGE}

    for seed, color in colors.items():
        rows = curve["train_loss"][f"seed{seed}"]
        steps = np.asarray([r["step"] for r in rows])
        loss = np.asarray([r["total"] for r in rows])
        # smooth the per-50-step stream for legibility; raw stays faint
        axes[0].plot(steps, loss, color=color, linewidth=0.6, alpha=0.25)
        k = 21
        if len(loss) > k:
            sm = np.convolve(loss, np.ones(k) / k, mode="valid")
            axes[0].plot(steps[k // 2: k // 2 + len(sm)], sm, color=color,
                         linewidth=2, label=f"train seed {seed}")
        ev = curve["eval"]
        pts = sorted(
            (int(key.split("_step")[1]), m) for key, m in ev.items()
            if key.startswith(f"seed{seed}_")
        )
        st = np.asarray([p[0] for p in pts])
        for ax, metric in ((axes[1], "goal"), (axes[2], "collision_rate")):
            ys = np.asarray([p[1][metric] for p in pts])
            ax.plot(st, ys, color=color, linewidth=2, marker="o",
                    markersize=4, label=f"train seed {seed}")

    for ax, title, ylabel in (
        (axes[0], "Training loss", "Total loss"),
        (axes[1], "Goal success rate (held-out)", "Goal success rate"),
        (axes[2], "Collision rate (held-out)", "Collision rate"),
    ):
        _style(ax, title, "Training step", ylabel)
        ax.legend(fontsize=8, frameon=False, labelcolor=INK2)
    axes[0].set_yscale("log")
    fig.suptitle(
        "26k-step learning curves, 2 training seeds "
        "(artifacts/curve_r05.json; evals on 64 held-out scenes)",
        fontsize=10, color=INK,
    )
    fig.tight_layout(rect=(0, 0, 1, 0.92))
    out = os.path.join(DOCS, "learning_curve.png")
    fig.savefig(out, dpi=160, facecolor=SURFACE)
    print(f"wrote {out}")


def main() -> None:
    os.makedirs(DOCS, exist_ok=True)
    plot_tilt_sweep()
    plot_learning_curve()


if __name__ == "__main__":
    main()
