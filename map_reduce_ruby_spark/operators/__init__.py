from map_reduce_ruby_spark.operators.asof import asof_join
from map_reduce_ruby_spark.operators.skew import salted_agg
from map_reduce_ruby_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    extract_features,
    MEDIA_SCHEMA,
    FEATURE_DIM,
)

__all__ = [
    "asof_join",
    "salted_agg",
    "attach_fake_media",
    "decode_media",
    "extract_features",
    "MEDIA_SCHEMA",
    "FEATURE_DIM",
]
