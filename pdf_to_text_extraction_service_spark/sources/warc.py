"""WARC source — Common Crawl's native container format.

A from-scratch WARC/1.0 reader+writer pair (no warc libs in this
environment). The reader turns ``response`` records into page rows
``(url, warc_ts, html)``; other record types (warcinfo, request,
metadata) are skipped, HTTP response headers are stripped from the
payload, and malformed records end the file's parse (partial output,
the same stop-at-first-error posture as the XML kernels).

Spark integration: ``read_warc_pages`` loads whole files via the
binaryFile source and parses records inside ``mapInPandas`` — one
file = one row in, N pages out (cardinality-changing, like the frame
sampler). At 100 TB, CC segment files are ~1 GiB each and the
per-file atomicity matches how Common Crawl distributes them; the
post-parse repartition/salt stage (plans/pipeline.py) decouples
extraction parallelism from file count.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd

_CRLF = b"\r\n"


def write_warc(records: list[tuple[str, str, bytes]],
               with_http_headers: bool = True) -> bytes:
    """records: (url, iso_ts 'YYYY-MM-DDTHH:MM:SSZ', payload)."""
    out = bytearray()
    for url, ts, payload in records:
        if with_http_headers:
            http = (b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html\r\n"
                    b"Content-Length: " + str(len(payload)).encode()
                    + b"\r\n\r\n" + payload)
        else:
            http = payload
        headers = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + _CRLF
            + b"WARC-Date: " + ts.encode() + _CRLF
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: " + str(len(http)).encode() + _CRLF
        )
        out += headers + _CRLF + http + _CRLF + _CRLF
    return bytes(out)


def parse_warc(data: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Yield (url, warc_date, payload) for each response record."""
    i, n = 0, len(data)
    while i < n:
        start = data.find(b"WARC/", i)
        if start < 0:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            return  # malicious/corrupt length would move the cursor
        body = data[head_end + 4:head_end + 4 + length]
        i = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = headers.get("warc-date", "")
        payload = body
        if body[:5] in (b"HTTP/",):
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                payload = body[http_end + 4:]
        yield url, ts, payload


PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
])


def _parse_ts(ts: str) -> datetime.datetime | None:
    try:
        return datetime.datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


def _warc_records_fn():
    """mapInPandas record parser shared by the batch and streaming
    WARC readers (one file in, N page rows out)."""

    def _records(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import gzip
        import zlib

        import pandas as pd

        for batch in batches:
            rows: dict[str, list] = {"url": [], "warc_ts": [], "html": []}
            for path, content in zip(batch["path"], batch["content"]):
                data = bytes(content)
                if str(path).endswith(".gz") or data[:2] == b"\x1f\x8b":
                    # CC ships .warc.gz with one gzip MEMBER per
                    # record; gzip.decompress handles the
                    # concatenated-members stream.
                    try:
                        data = gzip.decompress(data)
                    except (OSError, EOFError, zlib.error):
                        # truncated upload raises EOFError, corrupt
                        # deflate zlib.error — neither is an OSError;
                        # either way skip the segment, never poison
                        # the stream checkpoint with a crashing file
                        continue
                for url, ts, payload in parse_warc(data):
                    rows["url"].append(url)
                    rows["warc_ts"].append(_parse_ts(ts))
                    rows["html"].append(payload)
            if rows["url"]:
                # never yield an empty frame: pandas types empty
                # columns float64 and Arrow cannot cast that to
                # timestamp (all-corrupt batches hit this)
                yield pd.DataFrame(rows)

    return _records


def read_warc_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files → pages DataFrame (url, warc_ts, html)."""
    files = spark.read.format("binaryFile").load(path_glob)
    return _parse_files(files)


def _parse_files(files: DataFrame) -> DataFrame:
    return files.select("path", "content").mapInPandas(
        _warc_records_fn(), schema=PAGES_SCHEMA)


def read_warc_pages_stream(spark: SparkSession, path: str) -> DataFrame:
    """STREAMING WARC ingestion: new segment files appearing under
    ``path`` become page micro-batches — the shape of a continuous
    crawl feed (Common Crawl drops ~1 GiB .warc.gz segments; the
    binaryFile streaming source tracks processed files in the
    checkpoint, so a restart never re-parses a segment)."""
    # the streaming source requires an explicit schema (binaryFile's
    # is fixed: path/modificationTime/length/content)
    files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .option("pathGlobFilter", "*.warc*")
        # the file source's DEFAULT maxFileAge is 7 days: backfilled
        # segments with old mtimes (rsync/s3-sync preserve them)
        # would be silently skipped — disable age-based exclusion
        .option("maxFileAge", "36500d")
        .load(path)
    )
    return _parse_files(files)
