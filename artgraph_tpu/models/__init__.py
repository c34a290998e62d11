from artgraph_tpu.models.resnet import ResNet50
from artgraph_tpu.models.vit import ViT, vit_base_patch16_224
from artgraph_tpu.models.heads import (
    ResnetSingleTask,
    ResnetMultiTask,
    ViTSingleTask,
    ViTMultiTask,
    ContextNetSingleTask,
    ContextNetlMultiTask,
    MultiModalSingleTask,
    MultiModalMultiTask,
    NewMultiModalSingleTask,
    NewMultiModalMultiTask,
    NewMultiModalSingleTaskVit,
    NewMultiModalMultiTaskViT,
    LabelProjector,
    LabelProjectorVit,
)

__all__ = [
    "ResNet50",
    "ViT",
    "vit_base_patch16_224",
    "ResnetSingleTask",
    "ResnetMultiTask",
    "ViTSingleTask",
    "ViTMultiTask",
    "ContextNetSingleTask",
    "ContextNetlMultiTask",
    "MultiModalSingleTask",
    "MultiModalMultiTask",
    "NewMultiModalSingleTask",
    "NewMultiModalMultiTask",
    "NewMultiModalSingleTaskVit",
    "NewMultiModalMultiTaskViT",
    "LabelProjector",
    "LabelProjectorVit",
]
