"""Custom sources beyond the file/rate built-ins (Python DataSource API)."""

from .sentence_source import SentenceDataSource, register_sentence_source

__all__ = ["SentenceDataSource", "register_sentence_source"]
