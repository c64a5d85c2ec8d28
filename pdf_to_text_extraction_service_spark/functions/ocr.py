"""Spark operators over externally-produced OCR / transcription
output.

The reference's image/audio extractors call network backends (Mistral
OCR, Groq Whisper — internal/image/image.go:115-263,
internal/extractors/audio/transcribe.go:40-100); offline, the router
failure-codes those rows (kernel/router.py). But everything AFTER the
backend call is pure post-processing, and at 100 TB that is exactly
the shape of a real pipeline: an OCR/ASR service (or a GPU fleet)
writes page-markdown / segment sidecar columns, and Spark owns the
combine → clean → quality-gate → count stage. These operators run
that stage over Arrow batches with the byte-parity kernel
(kernel/ocrclean.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

OCR_RESULT_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("success", BooleanType()),
    StructField("text", StringType()),
    StructField("method", StringType()),
    StructField("word_count", IntegerType()),
    StructField("char_count", IntegerType()),
    StructField("error", StringType()),
])


def ocr_clean_results(df: DataFrame, id_col: str = "media_id",
                      pages_col: str = "ocr_pages") -> DataFrame:
    """processOCROnly over a sidecar column of OCR page markdown
    (image.go:218-263): combine pages → clean → meaningfulness gate;
    garbage OCR fails explicitly rather than passing through, with
    the reference's exact error strings."""

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pdf_to_text_extraction_service_spark.kernel import (
            ocrclean,
            runes,
        )

        for batch in batches:
            out = {k: [] for k in ("media_id", "success", "text",
                                   "method", "word_count", "char_count",
                                   "error")}
            for mid, pages in zip(batch[id_col], batch[pages_col]):
                pages = list(pages) if pages is not None else []
                text, err = ocrclean.ocr_text_from_pages(pages)
                wc, cc = runes.build_counts(text)
                out["media_id"].append(mid)
                out["success"].append(err is None)
                out["text"].append(text)
                out["method"].append("ocr")
                out["word_count"].append(wc)
                out["char_count"].append(cc)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return df.select(id_col, pages_col).mapInPandas(
        _run, schema=OCR_RESULT_SCHEMA
    )


def transcript_results(df: DataFrame, id_col: str = "media_id",
                       segments_col: str = "segments",
                       timestamps: bool = True) -> DataFrame:
    """Audio-transcript assembly over a sidecar column of Whisper-style
    segments array<struct<start double, text string>>
    (transcribe.go:80-112): with timestamps each non-empty segment
    becomes "[MM:SS] text" ([HH:MM:SS] past the hour) joined by blank
    lines; an empty transcript is the reference's exact failure
    ("groq transcription returned empty transcript",
    transcribe.go:84-87); counts are BuildCounts."""

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pdf_to_text_extraction_service_spark.kernel import (
            ocrclean,
            runes,
        )

        for batch in batches:
            out = {k: [] for k in ("media_id", "success", "text",
                                   "method", "word_count", "char_count",
                                   "error")}
            for mid, segs in zip(batch[id_col], batch[segments_col]):
                segs = list(segs) if segs is not None else []
                if timestamps and segs:
                    text = ocrclean.format_timestamped_transcript(
                        [(s["start"], s["text"]) for s in segs]
                    )
                else:
                    text = ocrclean._trim_space(
                        " ".join(s["text"] for s in segs
                                 if s["text"] is not None)
                    )
                err = None
                if text == "":
                    err = "groq transcription returned empty transcript"
                wc, cc = runes.build_counts(text)
                out["media_id"].append(mid)
                out["success"].append(err is None)
                out["text"].append(text)
                out["method"].append("groq")
                out["word_count"].append(wc)
                out["char_count"].append(cc)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return df.select(id_col, segments_col).mapInPandas(
        _run, schema=OCR_RESULT_SCHEMA
    )
