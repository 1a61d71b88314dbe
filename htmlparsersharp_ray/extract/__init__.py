"""Main-content extraction over the parsed DOM (SURVEY.md §7.1.2)."""

from .boilerplate import extract_main_content, ExtractionResult  # noqa: F401
