"""End-to-end pipelines composed from the engine's operators."""

from .diffdb import build_diffdb, write_diffdb_tsv

__all__ = ["build_diffdb", "write_diffdb_tsv"]
