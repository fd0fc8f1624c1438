from .core import extract, extract_record, ExtractResult
from .selectors import select
from .formats import format_value

__all__ = ["extract", "extract_record", "ExtractResult", "select", "format_value"]
