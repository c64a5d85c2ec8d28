"""Aggregations over the per-page results array (SURVEY.md §2.5).

The reference tallies page methods doc-side (countOCRPages /
TextLayerPages / CostSavingsPercent, hybrid.go:136-138,377-392). Here
they are JVM array expressions over the ``pages``
array<struct> column — no Python, no explode, no shuffle.
"""

from __future__ import annotations

from typing import Iterator

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


PDF_IMAGE_STATS_SCHEMA = (
    "url string, total_pages int, needs_ocr_pages int, "
    "blank_pages int, n_images int, img_pixels bigint, "
    "ink_samples bigint, sum_luma bigint"
)


def pdf_image_ocr_stats(pages_df: DataFrame,
                        url_col: str = "url",
                        payload_col: str = "html") -> DataFrame:
    """Per-document embedded-image statistics + the pixel-driven OCR
    decision (kernel/pdfk.page_image_stats / self_blank_page): for
    each PDF payload, decode every image XObject (DCTDecode baseline
    and progressive via kernel/imgcodec.py) and inline image, and
    tally which textless pages escalate to OCR vs prune as blank
    paper.

    Scale shape: one Arrow-batched ``mapInPandas`` hop (the same
    budget as extract()); only the two input columns reach the
    Python worker and only eight scalar columns come back —
    map-only, no shuffle."""

    def _batches(batches: Iterator["pd.DataFrame"]) \
            -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pdf_to_text_extraction_service_spark.kernel import pdfk

        for batch in batches:
            out: dict[str, list] = {k: [] for k in (
                "url", "total_pages", "needs_ocr_pages",
                "blank_pages", "n_images", "img_pixels",
                "ink_samples", "sum_luma")}
            for url, payload in zip(batch[url_col].tolist(),
                                    batch[payload_col].tolist()):
                payload = bytes(payload) if payload is not None else b""
                total = needs = blank = n_img = 0
                pixels = ink = luma = 0
                try:
                    doc = pdfk.PDFDoc(payload)
                    res = pdfk.extract_pdf(payload, "application/pdf",
                                           doc=doc)
                    for p in (res.pages or []):
                        total += 1
                        if p.method == "needs-ocr":
                            needs += 1
                        elif p.method == "blank":
                            blank += 1
                        st = doc.page_image_stats(p.page_number)
                        n_img += st["n_images"]
                        pixels += st["pixels"]
                        ink += st["ink_samples"]
                        luma += st["sum_luma"]
                except Exception:
                    # error docs report zeros, never raise — reset
                    # anything accumulated before the failure so a
                    # doc that dies at page k is not mistaken for a
                    # genuine (k-1)-page document
                    total = needs = blank = n_img = 0
                    pixels = ink = luma = 0
                out["url"].append(url)
                out["total_pages"].append(total)
                out["needs_ocr_pages"].append(needs)
                out["blank_pages"].append(blank)
                out["n_images"].append(n_img)
                out["img_pixels"].append(pixels)
                out["ink_samples"].append(ink)
                out["sum_luma"].append(luma)
            yield pd.DataFrame(out)

    return pages_df.select(url_col, payload_col).mapInPandas(
        _batches, PDF_IMAGE_STATS_SCHEMA)
