#!/usr/bin/env python
"""Interactive benchmark dashboard (Streamlit).

Equivalent to the reference's experiments/dashboard.py (:22-648): walks a
benchmark results tree (benchmark_config.json + per-model
aggregated_stats.json + per-run *_metrics.json) and renders summary table,
accuracy comparisons with percentile bands, training curves, efficiency
bars/scatter, convergence bars, and per-run drill-down.

Streamlit is an optional dependency; when absent, use
`python experiments/report.py <results_dir>` for the static-HTML report
that renders the same data.

Run:  streamlit run experiments/dashboard.py
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any, Dict, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import streamlit as st

    HAVE_STREAMLIT = True
except ImportError:  # gated optional dependency
    HAVE_STREAMLIT = False

import numpy as np


def load_benchmark_data(results_dir: str) -> Optional[Dict[str, Any]]:
    """Walk the results tree (reference: dashboard.py:22-93)."""
    config_path = os.path.join(results_dir, "benchmark_config.json")
    if not os.path.exists(config_path):
        return None
    with open(config_path) as f:
        config = json.load(f)
    models: Dict[str, Any] = {}
    for entry in sorted(os.listdir(results_dir)):
        model_dir = os.path.join(results_dir, entry)
        if not os.path.isdir(model_dir):
            continue
        agg_path = os.path.join(model_dir, "aggregated_stats.json")
        agg = None
        if os.path.exists(agg_path):
            with open(agg_path) as f:
                agg = json.load(f)
        runs = []
        for run_entry in sorted(os.listdir(model_dir)):
            run_dir = os.path.join(model_dir, run_entry)
            if not os.path.isdir(run_dir):
                continue
            for fname in os.listdir(run_dir):
                if fname.endswith("_metrics.json"):
                    with open(os.path.join(run_dir, fname)) as f:
                        runs.append(json.load(f))
        if agg or runs:
            models[entry] = {"aggregated": agg, "runs": runs}
    return {"config": config, "models": models}


def create_summary_table(data: Dict[str, Any]):
    """Rows of per-model aggregate stats (reference: dashboard.py:96-136)."""
    rows = []
    for model, d in data["models"].items():
        agg = d.get("aggregated") or {}

        def stat(key):
            v = agg.get(key)
            return (v.get("mean"), v.get("std")) if isinstance(v, dict) else (None, None)

        acc_m, acc_s = stat("test_accuracy")
        thr_m, _ = stat("throughput_images_per_sec")
        lat_m, _ = stat("latency_mean_ms")
        tt_m, _ = stat("train_time")
        rows.append({
            "model": model,
            "test_accuracy_mean": acc_m,
            "test_accuracy_std": acc_s,
            "throughput_img_s": thr_m,
            "latency_ms": lat_m,
            "train_time_s": tt_m,
            "num_runs": agg.get("num_runs"),
        })
    return rows


def accuracy_percentiles(runs) -> Dict[str, Any]:
    """Per-epoch accuracy percentile bands 5/25/75/95 across runs
    (reference: dashboard.py:139-247)."""
    curves = [
        [e["test_accuracy"] for e in r.get("per_epoch", [])] for r in runs
    ]
    curves = [c for c in curves if c]
    if not curves:
        return {}
    n = min(len(c) for c in curves)
    arr = np.asarray([c[:n] for c in curves])
    return {
        "epochs": list(range(1, n + 1)),
        "p5": np.percentile(arr, 5, axis=0).tolist(),
        "p25": np.percentile(arr, 25, axis=0).tolist(),
        "median": np.percentile(arr, 50, axis=0).tolist(),
        "p75": np.percentile(arr, 75, axis=0).tolist(),
        "p95": np.percentile(arr, 95, axis=0).tolist(),
        "runs": arr.tolist(),
    }


def main():
    if not HAVE_STREAMLIT:
        raise SystemExit(
            "streamlit is not installed in this environment. Use the static "
            "report instead:  python experiments/report.py <results_dir>"
        )
    st.set_page_config(page_title="RPE-ViT TPU benchmarks", layout="wide")
    st.title("RPE × Attention benchmark explorer (TPU)")
    results_dir = st.sidebar.text_input("Results directory", "results")
    candidates = (
        [d for d in sorted(os.listdir(results_dir))
         if d.startswith("benchmark_")]
        if os.path.isdir(results_dir) else []
    )
    chosen = st.sidebar.selectbox("Benchmark run", candidates) if candidates else None
    if not chosen:
        st.info("No benchmark_* directories found.")
        return
    data = load_benchmark_data(os.path.join(results_dir, chosen))
    if data is None:
        st.error("benchmark_config.json not found")
        return

    from efficient_rpe_vit_tpu.train import compute_convergence_metrics
    from experiments import charts

    rows = create_summary_table(data)
    tabs = st.tabs(["Summary", "Accuracy", "Training curves",
                    "Efficiency", "Convergence", "Per-run"])
    with tabs[0]:
        st.dataframe(rows)
    with tabs[1]:
        fig = charts.plot_accuracy_bands(data, accuracy_percentiles)
        st.pyplot(fig)
    with tabs[2]:
        fig = charts.plot_training_curves(data)
        if fig is not None:
            st.pyplot(fig)
    with tabs[3]:
        fig = charts.plot_efficiency_bars(rows)
        st.pyplot(fig)
        fig = charts.plot_efficiency_scatter(rows)
        if fig is not None:
            st.pyplot(fig)
    with tabs[4]:
        fig = charts.plot_convergence(data, compute_convergence_metrics)
        if fig is not None:
            st.pyplot(fig)
        # numeric detail: every run, not just the first
        for model, d in data["models"].items():
            for i, run in enumerate(d["runs"]):
                accs = [e["test_accuracy"] for e in run.get("per_epoch", [])]
                if accs:
                    st.write(f"{model} run {i}",
                             compute_convergence_metrics(accs))
    with tabs[5]:
        model = st.selectbox("Model", list(data["models"]))
        runs = data["models"][model]["runs"]
        idx = st.number_input("Run", 0, max(0, len(runs) - 1), 0)
        if runs:
            st.json(runs[int(idx)])


if __name__ == "__main__":
    main()
