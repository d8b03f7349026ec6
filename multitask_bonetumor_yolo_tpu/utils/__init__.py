"""Observability, profiling, weight import, misc utilities."""

from .logging import RunLogger

__all__ = ["RunLogger"]
