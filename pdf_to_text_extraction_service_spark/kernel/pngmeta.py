"""PNG textual metadata: tEXt / zTXt / iTXt chunks.

The image-side counterpart of kernel/audiotags.py: provenance
metadata a training-data pipeline wants before an image payload
ships — title/author/copyright rollup keys plus the generator
software string (a strong synthetic-image signal).  The reference's
image leg posts bytes to vision/OCR APIs and never reads PNG
metadata (internal/extractors/image/image.go:38-263); this is
engine-added breadth built from the public PNG specification
(11.3.4 textual information chunks) only.

Subset posture:

- tEXt: latin-1 keyword \\0 latin-1 text.
- zTXt: keyword \\0 method(0) zlib-deflated latin-1 text.
- iTXt: keyword \\0 compflag compmethod langtag \\0 translated-kw \\0
  UTF-8 text (deflated when compflag=1).
- Registered keywords map onto fixed fields (Title/Author/
  Description/Copyright/Software/Source/Comment); other keywords
  only increment ``n_text_chunks``.  First occurrence of a keyword
  wins (duplicate registered keywords are nonconforming).
- Everything is bounded (256 chunks, 1 MiB per chunk, 1 MiB
  inflated text) and malformed structures raise ValueError; the
  operator layer maps that to an error row.  Chunk CRCs are NOT
  verified — metadata extraction should survive a payload whose
  pixel data is damaged.
"""

from __future__ import annotations

import zlib

PNG_TEXT_FIELDS = ("title", "author", "description", "copyright",
                   "software", "source", "comment")

_KEYWORDS = {
    "Title": "title", "Author": "author",
    "Description": "description", "Copyright": "copyright",
    "Software": "software", "Source": "source", "Comment": "comment",
}

MAX_CHUNK_BYTES = 1 << 20
MAX_TEXT_BYTES = 1 << 20
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _inflate(blob: bytes) -> bytes:
    d = zlib.decompressobj()
    try:
        out = d.decompress(blob, MAX_TEXT_BYTES)
    except zlib.error as exc:
        raise ValueError("pngmeta: bad deflate stream") from exc
    if d.unconsumed_tail:
        raise ValueError("pngmeta: inflated text exceeds budget")
    return out


def parse_png_text(data: bytes) -> dict:
    """PNG bytes -> {fields..., n_text_chunks}.  Raises ValueError
    when the payload is not a PNG or a text chunk is malformed; a
    valid PNG with no text chunks returns all-NULL fields with
    n_text_chunks = 0."""
    if data[:8] != _PNG_SIG:
        raise ValueError("pngmeta: not a PNG payload")
    out: dict = {f: None for f in PNG_TEXT_FIELDS}
    out["n_text_chunks"] = 0
    pos = 8
    for _ in range(256):
        if pos + 8 > len(data):
            break
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = bytes(data[pos + 4:pos + 8])
        if ln > MAX_CHUNK_BYTES and typ in (b"tEXt", b"zTXt", b"iTXt"):
            raise ValueError("pngmeta: oversized text chunk")
        if typ == b"IEND":
            break
        end = pos + 8 + ln + 4  # + CRC
        if typ in (b"tEXt", b"zTXt", b"iTXt"):
            if end > len(data):
                raise ValueError("pngmeta: truncated text chunk")
            _read_text_chunk(typ, bytes(data[pos + 8:pos + 8 + ln]),
                             out)
            out["n_text_chunks"] += 1
        pos = end
    return out


def _read_text_chunk(typ: bytes, body: bytes, out: dict) -> None:
    key_raw, sep, rest = body.partition(b"\x00")
    if not sep or not 1 <= len(key_raw) <= 79:
        raise ValueError("pngmeta: bad text-chunk keyword")
    key = key_raw.decode("latin-1")
    if typ == b"tEXt":
        text = rest.decode("latin-1")
    elif typ == b"zTXt":
        if rest[:1] != b"\x00":
            raise ValueError("pngmeta: unknown zTXt method")
        text = _inflate(rest[1:]).decode("latin-1")
    else:  # iTXt
        if len(rest) < 2:
            raise ValueError("pngmeta: truncated iTXt header")
        comp, method = rest[0], rest[1]
        _lang, sep1, rest2 = rest[2:].partition(b"\x00")
        _tkw, sep2, raw = rest2.partition(b"\x00")
        if not sep1 or not sep2:
            raise ValueError("pngmeta: truncated iTXt fields")
        if comp == 1:
            if method != 0:
                raise ValueError("pngmeta: unknown iTXt method")
            raw = _inflate(raw)
        elif comp != 0:
            raise ValueError("pngmeta: unknown iTXt compression flag")
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError as exc:
            raise ValueError("pngmeta: iTXt text is not UTF-8") \
                from exc
    field = _KEYWORDS.get(key)
    if field is not None and out[field] is None and text:
        out[field] = text


# --- fixture-side builders -------------------------------------------


def build_text_chunks(fields: dict, kind: str = "tEXt") -> bytes:
    """Raw chunk bytes carrying ``fields`` as ``kind`` chunks
    (tEXt latin-1 / zTXt deflated / iTXt UTF-8).  Fixture/test use
    only; splice before IEND with inject_before_iend."""
    from . import imgcodec

    rev = {v: k for k, v in _KEYWORDS.items()}
    out = bytearray()
    for f in PNG_TEXT_FIELDS:
        v = fields.get(f)
        if v is None:
            continue
        key = rev[f].encode("latin-1")
        if kind == "tEXt":
            body = key + b"\x00" + str(v).encode("latin-1")
        elif kind == "zTXt":
            body = (key + b"\x00\x00"
                    + zlib.compress(str(v).encode("latin-1")))
        else:
            body = (key + b"\x00\x00\x00en\x00\x00"
                    + str(v).encode("utf-8"))
        out += imgcodec._chunk(kind.encode("latin-1"), bytes(body))
    return bytes(out)


def inject_before_iend(png: bytes, chunks: bytes) -> bytes:
    """Splice raw chunk bytes immediately before IEND of an
    encode_png()-produced stream."""
    i = png.rfind(b"IEND")
    if png[:8] != _PNG_SIG or i < 12:
        raise ValueError("pngmeta: not a PNG stream")
    return png[:i - 4] + chunks + png[i - 4:]
