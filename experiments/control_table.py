#!/usr/bin/env python
"""Build the torch-vs-JAX side-by-side accuracy table (VERDICT r3 next #4).

Joins `results/reference_control_bs32/*.json` (the PyTorch reference's own
training loop on this environment's 8k/2k MNIST re-split — see
experiments/reference_control.py) with the matching JAX runs
(`results/accuracy_mnist_10ep_all/<model>/aggregated_stats.json` +
per-run metrics, same split / epochs / batch size / seeds), and prints a
markdown table ready for docs/results/rope_circulant_comparison.md.

Usage: python experiments/control_table.py [--torch DIR] [--jax DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

ORDER = [
    "baseline", "baseline_rope", "baseline_circulant",
    "performer_favor", "performer_favor_rope", "performer_favor_circulant",
    "performer_favor_most_general",
    "performer_relu", "performer_relu_rope", "performer_relu_circulant",
    "performer_relu_most_general",
]


def torch_rows(d):
    rows = {}
    for f in glob.glob(os.path.join(d, "*.json")):
        j = json.load(open(f))
        rows.setdefault(j["model"], {})[j["seed"]] = j["best_test_accuracy"]
    return rows


def jax_rows(d):
    rows = {}
    for model in os.listdir(d):
        mdir = os.path.join(d, model)
        if not os.path.isdir(mdir):
            continue
        per_seed = {}
        for run in glob.glob(os.path.join(mdir, "run_*_seed_*")):
            seed = int(run.rsplit("_", 1)[1])
            for f in glob.glob(os.path.join(run, "*_metrics.json")):
                j = json.load(open(f))
                agg = j.get("aggregate", {})
                acc = agg.get("best_test_accuracy")
                if acc is None:
                    acc = max(e["test_accuracy"] for e in j["per_epoch"])
                per_seed[seed] = acc
        rows[model] = per_seed
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", default="results/reference_control_bs32")
    ap.add_argument("--jax", default="results/accuracy_mnist_10ep_all")
    ap.add_argument("--seeds", nargs="+", type=int, default=[42, 153])
    args = ap.parse_args()

    t, j = torch_rows(args.torch), jax_rows(args.jax)
    seeds = args.seeds
    hdr = ("| variant | " +
           " | ".join(f"torch s{s}" for s in seeds) + " | " +
           " | ".join(f"jax s{s}" for s in seeds) + " | Δ (mean) |")
    print(hdr)
    print("|" + "---|" * (2 * len(seeds) + 2))
    for m in ORDER:
        tr, jr = t.get(m, {}), j.get(m, {})
        cols = [f"{tr[s]:.2f}" if s in tr else "—" for s in seeds]
        cols += [f"{jr[s]:.2f}" if s in jr else "—" for s in seeds]
        both = [s for s in seeds if s in tr and s in jr]
        if both:
            delta = (sum(jr[s] for s in both) - sum(tr[s] for s in both)) \
                / len(both)
            cols.append(f"{delta:+.1f}")
        else:
            cols.append("—")
        print(f"| {m} | " + " | ".join(cols) + " |")


if __name__ == "__main__":
    main()
