"""Structured Streaming surface (batch-equivalent event operators)."""
