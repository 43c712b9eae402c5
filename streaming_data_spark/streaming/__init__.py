"""Structured Streaming layer (SURVEY.md §2.9, §3.2)."""
