from artgraph_tpu.checkpointing.torch_interop import (
    import_model_state,
    import_trunk_state,
    export_model_state,
    save_reference_checkpoint,
    load_reference_checkpoint,
)
from artgraph_tpu.checkpointing.orbax_io import save_checkpoint, restore_checkpoint

__all__ = [
    "import_model_state",
    "import_trunk_state",
    "export_model_state",
    "save_reference_checkpoint",
    "load_reference_checkpoint",
    "save_checkpoint",
    "restore_checkpoint",
]
