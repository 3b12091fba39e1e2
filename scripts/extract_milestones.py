"""Extract val-PSNR milestone wall-clock times from a training run log.

Parses the `epoch N: ... val_fine_psnr=X` INFO lines (timestamped by the
logger) and prints, for each requested threshold, the first epoch whose
val fine PSNR crosses it and the minutes elapsed since the run's first
log line. Used for the QUALITY.md milestone tables.

Usage: python scripts/extract_milestones.py assets/occtrain256_run.log \
           [--thresholds 25 28 30 31]
"""

import argparse
import datetime
import re
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log")
    p.add_argument("--thresholds", type=float, nargs="*",
                   default=[25.0, 28.0, 30.0, 31.0])
    args = p.parse_args()

    ts_re = re.compile(r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})")
    ep_re = re.compile(
        r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}).*epoch (\d+):.*"
        r"val_fine_psnr=([0-9.]+)")

    t0 = None
    rows = []
    with open(args.log) as f:
        for line in f:
            if t0 is None:
                m = ts_re.match(line)
                if m:
                    t0 = datetime.datetime.strptime(
                        m.group(1), "%Y-%m-%d %H:%M:%S")
            m = ep_re.search(line)
            if m:
                t = datetime.datetime.strptime(
                    m.group(1), "%Y-%m-%d %H:%M:%S")
                rows.append((int(m.group(2)), float(m.group(3)),
                             (t - t0).total_seconds() / 60.0))
    if not rows:
        sys.exit("no epoch lines found")

    best = max(rows, key=lambda r: r[1])
    print(f"{len(rows)} epochs parsed; last epoch {rows[-1][0]} "
          f"val_fine {rows[-1][1]:.2f} dB at {rows[-1][2]:.1f} min; "
          f"best {best[1]:.2f} dB @ epoch {best[0]}")
    for thr in args.thresholds:
        hit = next((r for r in rows if r[1] >= thr), None)
        if hit:
            print(f">= {thr:4.1f} dB: epoch {hit[0]:3d}  "
                  f"{hit[2]:6.1f} min")
        else:
            print(f">= {thr:4.1f} dB: not reached")


if __name__ == "__main__":
    main()
