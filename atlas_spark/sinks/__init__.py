from .base import Sink
from .lakehouse import LakehouseSink

__all__ = ["Sink", "LakehouseSink"]
