from artgraph_tpu.runtime.image_cpp import (
    native_available,
    decode_resize_native,
    decode_batch_native,
)

__all__ = ["native_available", "decode_resize_native", "decode_batch_native"]
