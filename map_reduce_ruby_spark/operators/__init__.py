from map_reduce_ruby_spark.operators.asof import asof_join
from map_reduce_ruby_spark.operators.zorder import interleave_bits, zorder_by
from map_reduce_ruby_spark.operators.bucketing import (
    register_bucketed,
    write_bucketed,
)
from map_reduce_ruby_spark.operators.compaction import compact
from map_reduce_ruby_spark.operators.connected_components import (
    connected_components,
    connected_components_star,
    incremental_connected_components,
)
from map_reduce_ruby_spark.operators.er import sorted_neighborhood_candidates
from map_reduce_ruby_spark.operators.prefix_sum import exclusive_prefix_sum
from map_reduce_ruby_spark.operators.range_join import range_join
from map_reduce_ruby_spark.operators.ann_index import (
    append_ivf_batch,
    append_pq_batch,
    compact_ivf_index,
    compact_pq_index,
    ivf_index_exists,
    load_ivf_index,
    load_pq_index,
    pq_index_exists,
    write_ivf_index,
    write_pq_index,
)
from map_reduce_ruby_spark.operators.artifact_store import (
    read_index_meta,
    vacuum_index,
)
from map_reduce_ruby_spark.operators.text_index import (
    append_bm25_batch,
    bm25_index_exists,
    bm25_search,
    compact_bm25_index,
    load_bm25_postings,
    write_bm25_index,
)
from map_reduce_ruby_spark.operators.ivf import (
    adaptive_cell_count,
    adaptive_nprobe,
    build_ivf_index,
    ivf_search,
)
from map_reduce_ruby_spark.operators.pq import (
    build_ivf_pq_index,
    build_pq_index,
    ivf_pq_search,
    pq_search,
)
from map_reduce_ruby_spark.operators.skew import salted_agg
from map_reduce_ruby_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    extract_features,
    phash_media,
    resize_media,
    sample_frames,
    MEDIA_SCHEMA,
    FEATURE_DIM,
)

__all__ = [
    "asof_join",
    "connected_components",
    "connected_components_star",
    "incremental_connected_components",
    "exclusive_prefix_sum",
    "sorted_neighborhood_candidates",
    "range_join",
    "adaptive_cell_count",
    "adaptive_nprobe",
    "build_ivf_index",
    "append_ivf_batch",
    "append_bm25_batch",
    "bm25_index_exists",
    "bm25_search",
    "compact_bm25_index",
    "load_bm25_postings",
    "write_bm25_index",
    "compact_ivf_index",
    "compact_pq_index",
    "vacuum_index",
    "ivf_index_exists",
    "load_ivf_index",
    "read_index_meta",
    "write_ivf_index",
    "pq_index_exists",
    "load_pq_index",
    "write_pq_index",
    "append_pq_batch",
    "ivf_search",
    "build_pq_index",
    "pq_search",
    "build_ivf_pq_index",
    "ivf_pq_search",
    "register_bucketed",
    "write_bucketed",
    "compact",
    "interleave_bits",
    "zorder_by",
    "salted_agg",
    "attach_fake_media",
    "decode_media",
    "extract_features",
    "resize_media",
    "sample_frames",
    "phash_media",
    "MEDIA_SCHEMA",
    "FEATURE_DIM",
]
