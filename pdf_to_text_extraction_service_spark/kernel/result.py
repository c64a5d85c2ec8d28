"""Unified extraction result envelope.

Mirrors reference internal/extract/result.go:12-30 (`Result`,
`PageResult`). This is the kernel-side record; the Spark layer maps it
1:1 onto the output StructType (see functions/extract_udf.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PageResult:
    page_number: int
    text: str = ""
    method: str = ""
    word_count: int = 0


@dataclass
class Result:
    success: bool = False
    text: str = ""
    method: str = ""
    file_type: str = ""
    mime_type: str = ""
    pages: list[PageResult] | None = None
    metadata: dict[str, str] | None = None
    word_count: int = 0
    char_count: int = 0
    error: str | None = None
