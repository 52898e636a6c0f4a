"""Structured Streaming pipelines over the events stream."""
