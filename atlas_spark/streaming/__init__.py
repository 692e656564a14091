from .state import ControlTables
from .runner import ReplayRunner, CHANGELOG_DDL

__all__ = ["ControlTables", "ReplayRunner", "CHANGELOG_DDL"]
