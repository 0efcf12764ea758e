from changegen_spark.multimodal.assets import (
    ASSET_SCHEMA,
    decode_images,
    extract_features,
    sample_frames,
    synth_assets,
)

__all__ = [
    "ASSET_SCHEMA",
    "synth_assets",
    "decode_images",
    "extract_features",
    "sample_frames",
]
