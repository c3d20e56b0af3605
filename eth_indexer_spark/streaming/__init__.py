from eth_indexer_spark.streaming.ingest import BlockIngestor, start_stream
from eth_indexer_spark.streaming.reorg import ReorgDecision, check_reorg

__all__ = ["BlockIngestor", "start_stream", "ReorgDecision", "check_reorg"]
