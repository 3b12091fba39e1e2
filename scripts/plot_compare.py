"""Overlay val-PSNR-vs-wall-clock curves of several training runs.

Usage:
    python scripts/plot_compare.py out.png label1=path/to/run1.log \
        label2=path/to/run2.log ...

Each run log is the CLI's logging output (per-epoch metric lines with
timestamps — the same input scripts/plot_quality.py consumes).
"""

from __future__ import annotations

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from scripts.plot_quality import read_run_log  # noqa: E402

# Repo series convention: CVD-safe blue/orange first (monitor convention),
# then the okabe-ito green for a third run.
COLORS = ["#1f77b4", "#ff7f0e", "#009e73", "#777777"]


def main():
    out_png = sys.argv[1]
    runs = [arg.split("=", 1) for arg in sys.argv[2:]]

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
    for (label, path), color in zip(runs, COLORS):
        cols, times = read_run_log(path)
        minutes = [times[int(e)] / 60.0 for e in cols["epoch"]]
        ax.plot(minutes, cols["val_fine_psnr"], color=color, lw=2,
                label=label)
    ax.axhline(30.0, color="#777777", lw=1, linestyle=":")
    ax.annotate("30 dB north star", (0, 30.0), textcoords="offset points",
                xytext=(4, 4), color="#777777", fontsize=9)
    ax.set_xlabel("wall-clock minutes (v5e-1)")
    ax.set_ylabel("val fine PSNR (dB)")
    ax.set_title("Validation PSNR vs wall-clock")
    ax.spines[["top", "right"]].set_visible(False)
    ax.grid(axis="y", alpha=0.25)
    ax.legend(frameon=False, loc="lower right")
    fig.tight_layout()
    fig.savefig(out_png)
    print(f"wrote {out_png}")


if __name__ == "__main__":
    main()
