"""Placeholder — filled in as operators land."""

QUERIES: dict = {}
ORACLES: dict = {}
