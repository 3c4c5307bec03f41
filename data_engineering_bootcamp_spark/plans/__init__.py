from .catalog import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
