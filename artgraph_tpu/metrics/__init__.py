from artgraph_tpu.metrics.classification import (
    accuracy,
    top_k_accuracy,
    balanced_accuracy,
    confusion_matrix,
    precision_recall_f1,
    summarize,
)
from artgraph_tpu.metrics.results import write_results

__all__ = [
    "accuracy",
    "top_k_accuracy",
    "balanced_accuracy",
    "confusion_matrix",
    "precision_recall_f1",
    "summarize",
    "write_results",
]
