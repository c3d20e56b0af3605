from eth_indexer_spark.sinks.store import ParquetStore

__all__ = ["ParquetStore"]
