from artgraph_tpu.ops.preprocess import normalize_images, normalize_images_pallas

__all__ = ["normalize_images", "normalize_images_pallas"]
