from .catalog import QUERIES, ORACLES

__all__ = ["QUERIES", "ORACLES"]
