"""Render the quality-evidence artifacts from a training run's log.csv.

Produces the PSNR-vs-epoch curve PNG and a markdown milestone table
(epochs + wall-clock minutes to 25/28/30 dB val fine PSNR) consumed by
docs/QUALITY.md — the committed record of BASELINE.md's quality north star
(the reference only publishes loss-curve plot images,
`/root/reference/assets/train_logs/`).

Usage:
    python scripts/plot_quality.py logs/quality128/log.csv \
        --run_log /tmp/quality_run.log --out_png assets/quality128_psnr.png

Wall-clock per epoch comes from the run log's `epoch N:` logging timestamps
(log.csv intentionally keeps the reference's schema, which has no time
column).
"""

from __future__ import annotations

import argparse
import csv
import re
from datetime import datetime

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# The repo-wide series convention (utils/monitor.py): blue = coarse,
# orange = fine; solid = train, dashed = val. Blue/orange is the standard
# CVD-safe pair; line style is the secondary encoding.
BLUE, ORANGE, GRAY = "#1f77b4", "#ff7f0e", "#777777"

_EPOCH_RE = re.compile(
    r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}),\d+ \| root \| INFO \| "
    r"epoch (\d+):")
_METRIC_RE = re.compile(r"(\w+)=([0-9.]+)")


def read_log_csv(path: str) -> dict[str, list[float]]:
    cols: dict[str, list[float]] = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            for k, v in row.items():
                cols.setdefault(k, []).append(float(v))
    return cols


def read_run_log(run_log: str):
    """Per-EPOCH metrics + wall-clock from the CLI's logging lines.

    Returns ``(cols, times)``: metric columns keyed like log.csv (epoch
    granularity 1, where log.csv only has update_freq rows) and
    ``{epoch: seconds since the first epoch line}``.
    """
    stamps: dict[int, datetime] = {}
    metrics: dict[int, dict[str, float]] = {}
    with open(run_log, errors="replace") as f:
        for line in f:
            m = _EPOCH_RE.search(line)
            if not m:
                continue
            epoch = int(m.group(2))
            stamps[epoch] = datetime.strptime(
                m.group(1), "%Y-%m-%d %H:%M:%S")
            metrics[epoch] = {
                k: float(v)
                for k, v in _METRIC_RE.findall(line[m.end():])}
    if not stamps:
        return {}, {}
    t0 = min(stamps.values())
    times = {e: (t - t0).total_seconds() for e, t in stamps.items()}
    epochs = sorted(metrics)
    cols = {"epoch": [float(e) for e in epochs]}
    for k in metrics[epochs[0]]:
        cols[k] = [metrics[e][k] for e in epochs]
    return cols, times


def milestone_table(epochs, val_psnr, times: dict[int, float],
                    thresholds=(25.0, 28.0, 30.0)) -> list[dict]:
    rows = []
    for thr in thresholds:
        hit = next((i for i, p in enumerate(val_psnr) if p >= thr), None)
        if hit is None:
            rows.append({"threshold": thr, "epoch": None, "minutes": None})
            continue
        e = int(epochs[hit])
        rows.append({
            "threshold": thr,
            "epoch": e,
            "minutes": times.get(e, 0.0) / 60.0 if times else None,
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_csv")
    ap.add_argument("--run_log", default="")
    ap.add_argument("--out_png", default="assets/quality128_psnr.png")
    ap.add_argument("--title", default="synthetic scene 128x128, v5e-1")
    args = ap.parse_args()

    times: dict[int, float] = {}
    cols: dict[str, list[float]] = {}
    if args.run_log:
        # Prefer per-epoch metrics from the run log (log.csv rows only
        # appear every update_freq epochs).
        cols, times = read_run_log(args.run_log)
    if not cols:
        cols = read_log_csv(args.log_csv)
    epochs = cols["epoch"]

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
    ax.plot(epochs, cols["coarse_psnr"], color=BLUE, lw=2,
            label="coarse train")
    ax.plot(epochs, cols["val_coarse_psnr"], color=BLUE, lw=2,
            linestyle="--", label="coarse val")
    ax.plot(epochs, cols["fine_psnr"], color=ORANGE, lw=2,
            label="fine train")
    ax.plot(epochs, cols["val_fine_psnr"], color=ORANGE, lw=2,
            linestyle="--", label="fine val")
    ax.axhline(30.0, color=GRAY, lw=1, linestyle=":")
    ax.annotate("30 dB north star", (epochs[0], 30.0),
                textcoords="offset points", xytext=(4, 4),
                color=GRAY, fontsize=9)
    ax.set_xlabel("epoch")
    ax.set_ylabel("PSNR (dB)")
    ax.set_title(f"PSNR vs epoch — {args.title}")
    ax.spines[["top", "right"]].set_visible(False)
    ax.grid(axis="y", alpha=0.25)
    ax.legend(frameon=False, loc="lower right")
    fig.tight_layout()
    fig.savefig(args.out_png)
    print(f"wrote {args.out_png}")

    rows = milestone_table(epochs, cols["val_fine_psnr"], times)
    print("\n| val fine PSNR | epoch | wall-clock (min, v5e-1) |")
    print("|---|---|---|")
    for r in rows:
        if r["epoch"] is None:
            print(f"| ≥{r['threshold']:.0f} dB | not reached | — |")
        else:
            mins = f"{r['minutes']:.1f}" if r["minutes"] is not None else "n/a"
            print(f"| ≥{r['threshold']:.0f} dB | {r['epoch']} | {mins} |")
    best = max(cols["val_fine_psnr"])
    ep_best = int(epochs[cols["val_fine_psnr"].index(best)])
    tbest = times.get(ep_best)
    print(f"\nbest val fine PSNR: {best:.2f} dB at epoch {ep_best}"
          + (f" ({tbest / 60:.1f} min)" if tbest is not None else ""))


if __name__ == "__main__":
    main()
