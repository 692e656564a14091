from .lww import lww_latest, decode_payload
from .schema_evolution import SchemaRules, DEFAULT_RULES
from .skew import salted_group_max, add_salt

__all__ = [
    "lww_latest",
    "decode_payload",
    "SchemaRules",
    "DEFAULT_RULES",
    "salted_group_max",
    "add_salt",
]
