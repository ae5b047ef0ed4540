"""Plot training curves from the trainer's CSV logs.

Replaces tasks/R2R/plot.py: validation loss, navigation error, and success
rate over iterations, one line per (run, split).

  python scripts/plot_training.py plots/follower_*_log.csv -o plots/curves.png
"""

from __future__ import annotations

import argparse
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

PANELS = [
    ("Loss", "loss", ["val_seen loss", "val_unseen loss", "train loss"]),
    ("Navigation Error", "m", ["val_seen nav_error", "val_unseen nav_error"]),
    ("Success", "%", ["val_seen success_rate", "val_unseen success_rate"]),
]


def plot(csv_paths, out_path):
    fig, axes = plt.subplots(1, len(PANELS), figsize=(5 * len(PANELS), 4))
    for path in csv_paths:
        df = pd.read_csv(path)
        label = os.path.basename(path).replace("_log.csv", "")
        for ax, (title, ylabel, cols) in zip(axes, PANELS):
            for col in cols:
                # sub-split runs log 'sub_val_seen ...' columns
                matches = [c for c in df.columns if c.endswith(col) or c == col]
                for c in matches:
                    ax.plot(df["iteration"], df[c], label=f"{label}: {c}")
            ax.set_title(title)
            ax.set_xlabel("iteration")
            ax.set_ylabel(ylabel)
    for ax in axes:
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("csvs", nargs="+")
    parser.add_argument("-o", "--out", default="plots/training_curves.png")
    args = parser.parse_args()
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    plot(args.csvs, args.out)
