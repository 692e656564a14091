from .generator import ChangelogSpec, generate_changelog, write_changelog
from .oracle import apply_reference, expected_state_pdf

__all__ = [
    "ChangelogSpec",
    "generate_changelog",
    "write_changelog",
    "apply_reference",
    "expected_state_pdf",
]
