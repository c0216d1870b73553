"""Structured Streaming pipelines (SURVEY.md §2.10 + §3.1)."""
