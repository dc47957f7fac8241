from .metrics import (
    compute_confusion_matrix,
    compute_metrics_from_confusion_matrix,
    compute_classification_metrics,
    accuracy_score,
)
from .training import (
    TrainState,
    create_optimizer,
    create_lr_scheduler,
    create_train_state,
    make_train_step,
    make_eval_step,
    train_epoch,
    evaluate,
    benchmark_inference,
)
from .checkpoint import (
    save_checkpoint,
    load_checkpoint,
    save_checkpoint_orbax,
    load_checkpoint_orbax,
)
from .benchmark_utils import (
    compute_convergence_metrics,
    compute_aggregated_statistics,
    save_run_metrics,
    load_run_metrics,
    save_benchmark_config,
    print_model_summary,
    set_random_seeds,
)

__all__ = [
    "compute_confusion_matrix",
    "compute_metrics_from_confusion_matrix",
    "compute_classification_metrics",
    "accuracy_score",
    "TrainState",
    "create_optimizer",
    "create_lr_scheduler",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "train_epoch",
    "evaluate",
    "benchmark_inference",
    "save_checkpoint",
    "load_checkpoint",
    "save_checkpoint_orbax",
    "load_checkpoint_orbax",
    "compute_convergence_metrics",
    "compute_aggregated_statistics",
    "save_run_metrics",
    "load_run_metrics",
    "save_benchmark_config",
    "print_model_summary",
    "set_random_seeds",
]
