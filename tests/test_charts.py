"""Chart-builder smoke tests (matplotlib Agg; no TPU, no streamlit)."""

import pytest

matplotlib = pytest.importorskip("matplotlib")

from efficient_rpe_vit_tpu.train import compute_convergence_metrics  # noqa: E402
from experiments import charts  # noqa: E402
from experiments.dashboard import accuracy_percentiles  # noqa: E402


def _fake_data(n_models=3, n_runs=3, n_epochs=5):
    models = {}
    for i in range(n_models):
        runs = []
        for r in range(n_runs):
            per_epoch = [
                {"epoch": e + 1,
                 "train_accuracy": 50 + 8 * e + i + r,
                 "test_accuracy": 55 + 8 * e + i - r}
                for e in range(n_epochs)
            ]
            runs.append({"per_epoch": per_epoch})
        models[f"model_{i}"] = {"aggregated": None, "runs": runs}
    return {"config": {}, "models": models}


def _fake_rows(n=3):
    return [
        {"model": f"model_{i}", "test_accuracy_mean": 90 + i,
         "test_accuracy_std": 0.5, "throughput_img_s": 1000 + 100 * i,
         "latency_ms": 20 - i, "train_time_s": 100, "num_runs": 3}
        for i in range(n)
    ]


def test_accuracy_bands_figure():
    fig = charts.plot_accuracy_bands(_fake_data(), accuracy_percentiles)
    assert fig is not None and len(fig.axes) == 1


def test_training_curves_small_multiples():
    fig = charts.plot_training_curves(_fake_data(n_models=4))
    assert fig is not None
    visible = [a for a in fig.axes if a.get_visible()]
    assert len(visible) == 4


def test_efficiency_scatter_labels_every_point():
    fig = charts.plot_efficiency_scatter(_fake_rows())
    ax = fig.axes[0]
    assert len(ax.texts) == 3  # direct label per model (relief rule)


def test_convergence_all_runs():
    fig = charts.plot_convergence(_fake_data(), compute_convergence_metrics)
    assert fig is not None


def test_model_colors_stable_under_filtering():
    """Color follows the entity, not its rank in a filtered view."""
    all_models = ["a", "b", "c", "d"]
    subset = ["b", "d"]
    full = charts.model_colors(all_models)
    # removing models must not repaint survivors that keep their sort rank
    assert charts.model_colors(all_models)["b"] == full["b"]
    # linestyles kick in past the 8-hue palette
    many = [f"m{i:02d}" for i in range(10)]
    styles = charts.model_linestyles(many)
    assert styles["m00"] == "-" and styles["m09"] == "--"


def test_empty_inputs_return_none():
    assert charts.plot_training_curves({"models": {}}) is None
    assert charts.plot_efficiency_scatter([]) is None
    assert charts.plot_convergence({"models": {}},
                                   compute_convergence_metrics) is None
