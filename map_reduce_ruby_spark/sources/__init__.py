from map_reduce_ruby_spark.sources.chunk_datasource import (
    CHUNK_SCHEMA,
    ChunkDataSource,
    register_chunk_source,
)
from map_reduce_ruby_spark.sources.tables import TABLES, load_table, register_views

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "CHUNK_SCHEMA",
    "ChunkDataSource",
    "register_chunk_source",
]
