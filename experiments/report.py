#!/usr/bin/env python
"""Static HTML benchmark report — the dashboard for streamlit-less
environments. Renders the same results tree the Streamlit app reads
(summary table, accuracy percentile bands, training curves, efficiency
bars) into a single self-contained HTML file with embedded PNGs.

Usage:
    python experiments/report.py results/benchmark_mnist_20260816_120000
    # -> writes report.html inside that directory
"""

from __future__ import annotations

import base64
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from efficient_rpe_vit_tpu.train import compute_convergence_metrics
from experiments import charts
from experiments.dashboard import (
    accuracy_percentiles,
    create_summary_table,
    load_benchmark_data,
)


def _fig_to_b64(fig) -> str:
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110, bbox_inches="tight")
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


def _img(b64: str) -> str:
    return f'<img src="data:image/png;base64,{b64}" style="max-width:100%"/>'


def build_report(results_dir: str) -> str:
    data = load_benchmark_data(results_dir)
    if data is None:
        raise SystemExit(f"benchmark_config.json not found in {results_dir}")

    parts = ["<html><head><meta charset='utf-8'><title>RPE-ViT TPU report"
             "</title><style>body{font-family:sans-serif;margin:2em;}"
             "table{border-collapse:collapse}td,th{border:1px solid #999;"
             "padding:4px 10px;text-align:right}th{background:#eee}"
             "</style></head><body>"]
    parts.append(f"<h1>Benchmark report</h1><p>{results_dir}</p>")

    rows = create_summary_table(data)
    parts.append("<h2>Summary</h2><table><tr><th>model</th>"
                 "<th>test acc (mean±std)</th><th>img/s</th>"
                 "<th>latency ms</th><th>train s</th><th>runs</th></tr>")
    for r in rows:
        acc = (f"{r['test_accuracy_mean']:.2f}±{r['test_accuracy_std']:.2f}"
               if r["test_accuracy_mean"] is not None else "—")
        thr = f"{r['throughput_img_s']:.1f}" if r["throughput_img_s"] else "—"
        lat = f"{r['latency_ms']:.2f}" if r["latency_ms"] else "—"
        tt = f"{r['train_time_s']:.1f}" if r["train_time_s"] else "—"
        parts.append(f"<tr><td style='text-align:left'>{r['model']}</td>"
                     f"<td>{acc}</td><td>{thr}</td><td>{lat}</td>"
                     f"<td>{tt}</td><td>{r['num_runs']}</td></tr>")
    parts.append("</table>")

    # accuracy percentile bands (median + p25/75 + p5/95)
    parts.append("<h2>Test accuracy across seeds</h2>")
    fig = charts.plot_accuracy_bands(data, accuracy_percentiles)
    parts.append(_img(_fig_to_b64(fig)))

    # efficiency bars + accuracy-vs-throughput scatter
    parts.append("<h2>Efficiency</h2>")
    fig = charts.plot_efficiency_bars(rows)
    parts.append(_img(_fig_to_b64(fig)))
    fig = charts.plot_efficiency_scatter(rows)
    if fig is not None:
        parts.append(_img(_fig_to_b64(fig)))

    # convergence across ALL runs
    parts.append("<h2>Convergence</h2>")
    fig = charts.plot_convergence(data, compute_convergence_metrics)
    if fig is not None:
        parts.append(_img(_fig_to_b64(fig)))

    # per-model training curves, every run
    parts.append("<h2>Training curves</h2>")
    fig = charts.plot_training_curves(data)
    if fig is not None:
        parts.append(_img(_fig_to_b64(fig)))

    parts.append("</body></html>")
    out_path = os.path.join(results_dir, "report.html")
    with open(out_path, "w") as f:
        f.write("\n".join(parts))
    return out_path


if __name__ == "__main__":
    if len(sys.argv) != 2:
        raise SystemExit("usage: python experiments/report.py <results_dir>")
    path = build_report(sys.argv[1])
    print(f"Report written to {path}")
