from artgraph_tpu.data.manifest import prepare_raw_dataset
from artgraph_tpu.data.datasets import (
    ArtGraphSingleTask,
    ArtGraphMultiTask,
    MultiModalArtgraphSingleTask,
    MultiModalArtgraphMultiTask,
    NewMultiModalArtgraphMultiTask,
    LabelProjectionDataset,
    Subset,
)
from artgraph_tpu.data.loader import DataLoader, prepare_dataloader
from artgraph_tpu.data.resident import ResidentLoader
from artgraph_tpu.data.factories import (
    load_dataset,
    load_dataset_multimodal,
    load_dataset_new_multimodal,
    load_dataset_multitask_new_multimodal,
    load_dataset_projection,
    get_class_weights,
)

__all__ = [
    "prepare_raw_dataset",
    "ArtGraphSingleTask",
    "ArtGraphMultiTask",
    "MultiModalArtgraphSingleTask",
    "MultiModalArtgraphMultiTask",
    "NewMultiModalArtgraphMultiTask",
    "LabelProjectionDataset",
    "Subset",
    "DataLoader",
    "ResidentLoader",
    "prepare_dataloader",
    "load_dataset",
    "load_dataset_multimodal",
    "load_dataset_new_multimodal",
    "load_dataset_multitask_new_multimodal",
    "load_dataset_projection",
    "get_class_weights",
]
