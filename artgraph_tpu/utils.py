"""Drop-in re-export of the reference's `utils.py` surface
(ref: src/utils.py) so code written against the reference finds every symbol
under the same names:

    from artgraph_tpu.utils import load_dataset, prepare_dataloader, ...
"""
from artgraph_tpu.cli._common import get_base_arguments
from artgraph_tpu.data.manifest import prepare_raw_dataset
from artgraph_tpu.data.factories import (
    load_dataset,
    load_dataset_multimodal,
    load_dataset_new_multimodal,
    load_dataset_multitask_new_multimodal,
    load_dataset_projection,
    get_class_weights,
)
from artgraph_tpu.data.loader import prepare_dataloader
from artgraph_tpu.tracking import tracker, tracker_multitask, track_params

__all__ = [
    "get_base_arguments",
    "prepare_raw_dataset",
    "load_dataset",
    "load_dataset_multimodal",
    "load_dataset_new_multimodal",
    "load_dataset_multitask_new_multimodal",
    "load_dataset_projection",
    "get_class_weights",
    "prepare_dataloader",
    "tracker",
    "tracker_multitask",
    "track_params",
]
