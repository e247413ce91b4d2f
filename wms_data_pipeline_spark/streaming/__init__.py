"""Structured Streaming mode — the reference's micro-batch incremental
semantics expressed as a continuous pipeline."""
