"""Aggregations over the per-page results array (SURVEY.md §2.5).

The reference tallies page methods doc-side (countOCRPages /
TextLayerPages / CostSavingsPercent, hybrid.go:136-138,377-392). Here
they are JVM array expressions over the ``pages``
array<struct> column — no Python, no explode, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pdf_page_stats(extracted: DataFrame) -> DataFrame:
    """Per-document page tallies for rows that carry a pages array.

    cost_savings_percent = int(text_layer / total * 100)
    (hybrid.go:387-392; TextLayerPages = len(pages) - OCRPages per
    hybrid.go:137)."""
    df = extracted.filter(F.col("pages").isNotNull())
    total = F.size("pages")
    ocr = F.size(F.filter("pages", lambda p: p["method"] == "ocr"))
    needs = F.size(F.filter("pages", lambda p: p["method"] == "needs-ocr"))
    text_layer = total - ocr
    return df.select(
        "url",
        total.alias("total_pages"),
        text_layer.alias("text_layer_pages"),
        ocr.alias("ocr_pages"),
        needs.alias("needs_ocr_pages"),
        F.when(total == 0, F.lit(0))
        .otherwise((text_layer.cast("double") / total * 100).cast("int"))
        .alias("cost_savings_percent"),
        F.aggregate(
            F.transform("pages", lambda p: p["word_count"]),
            F.lit(0),
            lambda acc, w: acc + w,
        ).alias("sum_page_words"),
    )
