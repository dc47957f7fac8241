"""CLI integration tests (CPU, tiny settings).

Exercises the full train/benchmark/report pipelines end-to-end in-process —
the closest analogue of the reference's README quick-start smoke tests
(SURVEY.md §4)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def train_run(tmp_path_factory):
    from experiments.train import main as train_main

    out = str(tmp_path_factory.mktemp("cli_train"))
    metrics = train_main([
        "--model", "performer_relu_rope", "--dataset", "mnist",
        "--epochs", "1", "--batch-size", "64", "--quiet",
        "--output-dir", out, "--save-model", "--save-plots",
        "--bench-warmup", "1", "--bench-iters", "3",
        "--eval-detailed",
    ])
    return out, metrics


def test_train_cli_metrics_schema(train_run):
    out, metrics = train_run
    # dashboard-compatible sections (reference: train.py:363-400)
    assert {"metadata", "per_epoch", "aggregate", "inference"} <= set(metrics)
    assert metrics["metadata"]["model_name"] == "performer_relu_rope"
    assert metrics["metadata"]["attention_type"] == "relu"
    assert metrics["metadata"]["rpe_type"] == "rope"
    assert metrics["per_epoch"][0]["epoch"] == 1
    agg = metrics["aggregate"]
    assert agg["final_test_accuracy"] > 1.0  # percent scale
    assert {"aic", "bic", "log_likelihood"} <= set(agg)
    path = os.path.join(out, "performer_relu_rope_mnist_metrics.json")
    assert os.path.exists(path)
    on_disk = json.load(open(path))
    assert on_disk["metadata"]["model_name"] == "performer_relu_rope"


def test_train_cli_artifacts(train_run):
    out, _ = train_run
    assert os.path.exists(
        os.path.join(out, "performer_relu_rope_mnist_best.msgpack")
    )
    assert os.path.exists(
        os.path.join(out, "performer_relu_rope_mnist_curves.png")
    )


def test_train_cli_resume(train_run, tmp_path):
    from experiments.train import main as train_main

    out, _ = train_run
    ckpt = os.path.join(out, "performer_relu_rope_mnist_best.msgpack")
    metrics = train_main([
        "--model", "performer_relu_rope", "--dataset", "mnist",
        "--epochs", "2", "--batch-size", "64", "--quiet",
        "--output-dir", str(tmp_path), "--resume", ckpt,
        "--bench-warmup", "1", "--bench-iters", "2",
    ])
    # resumed at epoch 2 -> exactly one new epoch recorded
    assert [e["epoch"] for e in metrics["per_epoch"]] == [2]


def test_benchmark_cli_and_report(tmp_path):
    from experiments.benchmark import main as bench_main
    from experiments.report import build_report

    out = str(tmp_path / "bench")
    summary = bench_main([
        "--models", "baseline", "performer_favor",
        "--dataset", "mnist", "--num-runs", "2", "--epochs", "1",
        "--batch-size", "128", "--output-dir", out, "--quiet",
    ])
    assert set(summary) == {"baseline", "performer_favor"}
    assert summary["baseline"]["num_runs"] == 2
    assert os.path.exists(os.path.join(out, "benchmark_config.json"))
    assert os.path.exists(
        os.path.join(out, "baseline", "aggregated_stats.json")
    )
    # resumability: second invocation with --skip-existing does no new work
    summary2 = bench_main([
        "--models", "baseline", "performer_favor",
        "--dataset", "mnist", "--num-runs", "2", "--epochs", "1",
        "--batch-size", "128", "--output-dir", out, "--quiet",
        "--skip-existing",
    ])
    assert summary2["baseline"]["num_runs"] == 2
    # static report renders
    report = build_report(out)
    assert os.path.exists(report)
    html = open(report).read()
    assert "baseline" in html and "performer_favor" in html


def test_benchmark_cli_rejects_unknown_model(tmp_path):
    from experiments.benchmark import main as bench_main

    with pytest.raises(SystemExit, match="Unknown model"):
        bench_main([
            "--models", "not_a_model", "--dataset", "mnist",
            "--output-dir", str(tmp_path),
        ])


def test_import_torch_shape_mismatch():
    """The checkpoint-import tool rejects mismatched architectures loudly."""
    import numpy as np
    import jax, jax.numpy as jnp
    from efficient_rpe_vit_tpu.configs import mnist_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.utils.import_torch import state_dict_to_params

    cfg = mnist_config()
    model = create_model("baseline", cfg)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 28, 28, 1)))
    sd = {"patch_embedding.weight": np.zeros((99, 49), np.float32)}
    with pytest.raises(ValueError, match="shape mismatch"):
        state_dict_to_params(sd, v["params"])
