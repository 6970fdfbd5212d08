"""LLM-data-pipeline extension queries (dedup, similarity, text, events)."""

from __future__ import annotations
