"""Deterministic page-table synthesis.

Two sources of `(url, warc_ts, html, text, lang)` pages
(BASELINE.json input_hint):

- ``pages_from_documents``: expression-only wrapping of the driver's
  ``documents`` table into HTML pages — built from Spark SQL
  expressions so the DuckDB oracle can mirror the construction
  exactly (the basis of the extraction correctness gate).
- ``generate_corpus_rows`` / ``write_corpus``: a seeded mixed-format
  corpus (FIXTURES.md §1 generation mix) exercising every dispatch
  route, duplicates for dedup, an oversized skew tail, and failure
  rows; used by pipeline tests and the benchmark.

No wall-clock anywhere — everything derives from the seed.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


BASE_URL = "https://corpus.example"
EPOCH = "2026-01-01 00:00:00"


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pages_from_documents(docs: DataFrame, dup_factor: int = 1) -> DataFrame:
    """Wrap each document row into a well-formed HTML page.

    The page is ``<html><head><title>Doc {id}</title></head><body>
    <h1>Doc {id}</h1><p>{text}</p></body></html>`` so the HTML-strip
    kernel provably yields ``# Doc {id}\\n\\n{text}`` — the SQL-oracle
    contract (documents.text is [a-z0-9 .,]+, no markup, verified).

    dup_factor > 1 replicates each url with distinct warc_ts values to
    exercise latest-capture-wins dedup; the LAST replica (k =
    dup_factor-1) carries the max timestamp.
    """
    df = docs
    if dup_factor > 1:
        df = df.withColumn(
            "_k", F.explode(F.sequence(F.lit(0), F.lit(dup_factor - 1)))
        )
    else:
        df = df.withColumn("_k", F.lit(0))
    return df.select(
        F.concat(
            F.lit(BASE_URL + "/"), F.col("source"), F.lit("/doc"),
            F.col("doc_id").cast("string"), F.lit(".html"),
        ).alias("url"),
        F.expr(
            f"timestamp '{EPOCH}' + make_interval(0, 0, 0, 0, 0, 0, "
            "doc_id % 86400 + _k * 3600)"
        ).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>Doc "),
                F.col("doc_id").cast("string"),
                F.lit("</title></head><body><h1>Doc "),
                F.col("doc_id").cast("string"),
                F.lit("</h1><p>"), F.col("text"),
                F.lit("</p></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


# --- seeded mixed-format corpus ---------------------------------------

_LANGS = ["en", "de", "fr", "es", "zh"]
_WORDS = (
    "data spark batch query table column row filter join window "
    "aggregate shuffle partition broadcast salt skew stream page "
    "extract text quality score language token fingerprint corpus "
    "document crawl index vector cluster sample measure value"
).split()


def _sentences(rng: random.Random, n_words: int) -> str:
    words = [rng.choice(_WORDS) for _ in range(n_words)]
    return " ".join(words)


def generate_corpus_rows(n: int, seed: int = 42,
                         dup_rate: float = 0.12,
                         skew_rate: float = 0.002,
                         nonhtml_rate: float = 0.15) -> list[tuple]:
    """Rows (url, warc_ts_offset_s, html_bytes, text, lang).

    warc_ts is returned as an integer offset in seconds from EPOCH so
    callers can build timestamps engine-side.
    """
    rng = random.Random(seed)
    rows: list[tuple] = []
    formats = [
        ("md", _gen_md), ("txt", _gen_txt), ("csv", _gen_csv),
        ("json", _gen_json), ("jsonl", _gen_jsonl), ("xml", _gen_xml),
        ("yaml", _gen_yaml), ("py", _gen_py), ("ipynb", _gen_ipynb),
        ("tex", _gen_tex), ("rtf", _gen_rtf), ("pdf", _gen_pdf),
        ("docx", _gen_docx), ("xlsx", _gen_xlsx), ("pptx", _gen_pptx),
        ("odt", _gen_odt), ("epub", _gen_epub),
    ]
    nonhtml_k = 0
    for i in range(n):
        lang = _LANGS[i % len(_LANGS)]
        r = rng.random()
        if r < nonhtml_rate:
            # round-robin over formats so every kernel appears even in
            # small corpora
            ext, gen = formats[nonhtml_k % len(formats)]
            nonhtml_k += 1
            payload = gen(rng, i)
            url = f"{BASE_URL}/files/item{i}.{ext}"
        elif r < nonhtml_rate + 0.003:
            url = f"{BASE_URL}/blobs/item{i}.xyz"
            payload = bytes([0, 1, 2, 3]) + rng.randbytes(64)
        else:
            size_words = 900 if rng.random() < skew_rate else rng.randint(30, 220)
            payload = _gen_html(rng, i, size_words)
            url = f"{BASE_URL}/pages/item{i}.html"
        rows.append((url, (i * 37) % 86400, payload, None, lang))
        if rng.random() < dup_rate:
            # duplicate capture of the same url, later timestamp
            rows.append((url, (i * 37) % 86400 + 7200, payload, None, lang))
    return rows


def write_corpus(spark: SparkSession, path: str, n: int, seed: int = 42,
                 partitions: int = 8, **kw) -> None:
    rows = generate_corpus_rows(n, seed, **kw)
    df = spark.createDataFrame(
        rows, "url string, ts_off long, html binary, text string, lang string"
    ).select(
        "url",
        F.expr(f"timestamp '{EPOCH}' + make_interval(0,0,0,0,0,0, ts_off)")
        .alias("warc_ts"),
        "html", "text", "lang",
    )
    df.repartition(partitions).write.mode("overwrite").parquet(path)


def _gen_html(rng: random.Random, i: int, n_words: int) -> bytes:
    paras = []
    remaining = n_words
    while remaining > 0:
        k = min(remaining, rng.randint(10, 40))
        paras.append(f"<p>{_sentences(rng, k)}</p>")
        remaining -= k
    items = "".join(
        f"<li>{_sentences(rng, 4)}</li>" for _ in range(rng.randint(0, 4))
    )
    return (
        f"<html><head><title>Page {i}</title>"
        f"<style>body {{color: #222}}</style>"
        f"<script>var page={i};</script></head>"
        f"<body><nav><a href='/'>home</a></nav>"
        f"<h1>Heading {i}</h1><h2>{_sentences(rng, 3)}</h2>"
        f"{''.join(paras)}<ul>{items}</ul>"
        f"<aside>sidebar junk</aside>"
        f"<footer>copyright corpus {i}</footer></body></html>"
    ).encode()


def _gen_md(rng, i):
    return (f"---\ntitle: item {i}\n---\n# Item {i}\n\n"
            f"{_sentences(rng, 40)}\n\n{_sentences(rng, 30)}\n").encode()


def _gen_txt(rng, i):
    return f"{_sentences(rng, 50)}\r\n\r\n{_sentences(rng, 20)}\n".encode()


def _gen_csv(rng, i):
    head = "id,name,value"
    rows = "\n".join(f"{j},{rng.choice(_WORDS)},{rng.randint(0, 99)}"
                     for j in range(rng.randint(2, 8)))
    return f"{head}\n{rows}\n".encode()


def _gen_json(rng, i):
    return (f'{{"id": {i}, "name": "{rng.choice(_WORDS)}", '
            f'"tags": ["{rng.choice(_WORDS)}", "{rng.choice(_WORDS)}"]}}'
            ).encode()


def _gen_jsonl(rng, i):
    return "\n".join(
        f'{{"row": {j}, "w": "{rng.choice(_WORDS)}"}}' for j in range(3)
    ).encode()


def _gen_xml(rng, i):
    return (f"<doc><title>Item {i}</title>"
            f"<body>{_sentences(rng, 25)}</body></doc>").encode()


def _gen_yaml(rng, i):
    return (f"count: {rng.randint(1, 99)}\nname: {rng.choice(_WORDS)}\n"
            f"tags:\n  - {rng.choice(_WORDS)}\n  - {rng.choice(_WORDS)}\n"
            ).encode()


def _gen_py(rng, i):
    return (f"# module {i}\n\ndef handler_{i}(x):\n"
            f"    return x + {i}\n\nclass Thing{i}:\n    pass\n").encode()


def _gen_ipynb(rng, i):
    return (
        '{"cells":[{"cell_type":"markdown","source":["# Notebook %d"]},'
        '{"cell_type":"code","source":["x = %d\\n","print(x)"]}]}'
        % (i, i)
    ).encode()


def _gen_tex(rng, i):
    return (f"% fixture {i}\n\\section{{Part {i}}}\n"
            f"{_sentences(rng, 30)}\n\\subsection{{Detail}}\n"
            f"{_sentences(rng, 15)}\n").encode()


def _gen_rtf(rng, i):
    return (r"{\rtf1\ansi " + _sentences(rng, 20) + r"\par " +
            _sentences(rng, 10) + "}").encode()


def _gen_pdf(rng, i):
    from .pdfgen import build_pdf, single_column_page
    lines = [_sentences(rng, 9) for _ in range(6)]
    # alternate raw and FlateDecode streams (both kernel paths live)
    return build_pdf([single_column_page(lines)], compress=(i % 2 == 0))


def _gen_docx(rng, i):
    from . import officegen
    return officegen.make_docx(
        [{"text": f"Report {i}", "style": "Heading1"},
         {"text": _sentences(rng, 30)},
         {"text": _sentences(rng, 5), "num": "1"}],
        title=f"Doc {i}", author="corpus",
    )


def _gen_xlsx(rng, i):
    from . import officegen
    rows = [["id", "word", "n"]] + [
        [str(j), rng.choice(_WORDS), str(rng.randint(0, 9))]
        for j in range(rng.randint(2, 6))
    ]
    return officegen.make_xlsx({"Sheet1": rows})


def _gen_pptx(rng, i):
    from . import officegen
    return officegen.make_pptx(
        [[f"Deck {i}", _sentences(rng, 8)], [_sentences(rng, 12)]],
        notes={1: _sentences(rng, 6)},
    )


def _gen_odt(rng, i):
    from . import officegen
    return officegen.make_odt(
        [{"type": "h", "text": f"Doc {i}", "level": 1},
         {"type": "p", "text": _sentences(rng, 25)},
         {"type": "list", "items": [_sentences(rng, 3) for _ in range(2)]}],
        title=f"ODT {i}",
    )


def _gen_epub(rng, i):
    from . import officegen
    return officegen.make_epub(
        [f"<h1>Chapter</h1><p>{_sentences(rng, 30)}</p>",
         f"<p>{_sentences(rng, 20)}</p>"],
        title=f"Book {i}", author="corpus",
    )
