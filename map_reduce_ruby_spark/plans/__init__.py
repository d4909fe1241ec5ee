from map_reduce_ruby_spark.plans.catalog import CatalogEntry, all_entries, register

__all__ = ["CatalogEntry", "all_entries", "register"]
