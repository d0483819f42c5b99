"""Structured Streaming operators: gap sessionization and streaming feature
serving (the stateless hot path runs unchanged under ``readStream``)."""
