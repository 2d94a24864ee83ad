"""Structured Streaming surface: idiomatic replacement for the
reference's Airflow sensor/poll machinery (SURVEY.md §2.9)."""

from .ingest import stream_coin_pipeline, windowed_event_counts

__all__ = ["stream_coin_pipeline", "windowed_event_counts"]
