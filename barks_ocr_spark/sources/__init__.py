"""Table sources/sinks: snapshot-manifest table format + checkpointing."""
