"""Vectorized Arrow/pandas UDFs — the engine's complete Python-crossing
surface (SURVEY.md §2.10). Everything else stays in Catalyst."""

from .udfs import (
    canonicalize_udf,
    join_canonicalize_udf,
    registered_domain_udf,
    extract_links_udf,
    extract_text_udf,
    sniff_mimetype_udf,
    url_to_path_udf,
    robots_allowed_udf,
)

__all__ = [
    "canonicalize_udf",
    "join_canonicalize_udf",
    "registered_domain_udf",
    "extract_links_udf",
    "extract_text_udf",
    "sniff_mimetype_udf",
    "url_to_path_udf",
    "robots_allowed_udf",
]
