"""Query definitions, split by surface (reference parity vs extensions)."""
