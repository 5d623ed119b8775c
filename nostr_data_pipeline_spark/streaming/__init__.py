"""Structured Streaming replayer: tail the change-log, apply exactly once."""

from nostr_data_pipeline_spark.streaming.replayer import StreamingReplayer  # noqa: F401
