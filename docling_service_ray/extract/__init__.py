"""Pure-Python extractor core (no Ray dependency).

``extract_turn(text)`` is the single-row oracle; the Ray pipeline calls the
same function per batch, so pipeline output must match the oracle
byte-for-byte (SURVEY.md §5 / §7.2).
"""

from .core import extract_turn, ExtractResult, detect_format

__all__ = ["extract_turn", "ExtractResult", "detect_format"]
