"""Relational + data-pipeline operators, each a single lazy DataFrame plan."""
