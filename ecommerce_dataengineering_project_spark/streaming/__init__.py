"""Structured Streaming surface (SURVEY §2i)."""
