"""Streaming layer: ordered block ingest (Structured Streaming foreachBatch)
and stateful operators (change detection, status machines, classification)."""
