from artgraph_tpu.tracking.mlflow_adapter import (
    tracker,
    tracker_multitask,
    track_params,
    log_metric,
    log_param,
    set_experiment,
)

__all__ = [
    "tracker",
    "tracker_multitask",
    "track_params",
    "log_metric",
    "log_param",
    "set_experiment",
]
