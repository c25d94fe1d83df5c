"""Structured Streaming surface (SURVEY §2.8 T-series)."""

from jsonify2ai_spark.streaming.watcher import watch_dropzone, reconcile_deletes

__all__ = ["watch_dropzone", "reconcile_deletes"]
