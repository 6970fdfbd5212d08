"""Concrete pipelines built on the operator library."""
