"""Structured Streaming pipelines (SURVEY §2.F): the reference's consumer
re-expressed (micro-batch trigger, foreachBatch stats, checkpointing) plus
the F6 extensions it never wired up (watermarks, tumbling/sliding/session
windows, dropDuplicatesWithinWatermark)."""
