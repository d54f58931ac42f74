"""Dataflow + training-data-pipeline operators, each a DataFrame ->
DataFrame transformation designed for 100 TB inputs (blocked self-joins,
broadcastable dimensions, no driver-side loops)."""
