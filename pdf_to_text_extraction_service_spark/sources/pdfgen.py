"""Deterministic uncompressed-PDF writer for fixtures and corpus.

Emits the exact construct subset the PDF text-layer kernel
(kernel/pdfk.py) reads: one content stream per page, literal strings,
Tm/Td positioning. Multi-column pages place spans at two x origins so
the reader's column detection + reading-order sort is exercised
(north_star: "reading-order sort and column detection").
"""

from __future__ import annotations

Span = tuple[float, float, str]  # (x, y, text)


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def page_content(spans: list[Span]) -> bytes:
    ops = ["BT", "/F1 12 Tf"]
    for x, y, text in spans:
        ops.append(f"1 0 0 1 {x:g} {y:g} Tm")
        ops.append(f"({_escape(text)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1", errors="replace")


def single_column_page(lines: list[str], x: float = 72.0,
                       top: float = 720.0, leading: float = 16.0) -> list[Span]:
    return [(x, top - i * leading, ln) for i, ln in enumerate(lines)]


def two_column_page(left: list[str], right: list[str],
                    top: float = 720.0, leading: float = 16.0) -> list[Span]:
    spans = [(72.0, top - i * leading, ln) for i, ln in enumerate(left)]
    spans += [(320.0, top - i * leading, ln) for i, ln in enumerate(right)]
    return spans


def build_pdf(pages: list[list[Span]], compress: bool = False) -> bytes:
    """Assemble a PDF 1.4 file with correct xref; compress=True emits
    FlateDecode content streams (the realistic CC-PDF case)."""
    import zlib

    n_pages = len(pages)
    # Object numbering: 1 catalog, 2 pages, then per page: page obj,
    # content obj.
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, spans in enumerate(pages):
        content = page_content(spans)
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        page_num = 3 + 2 * i
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             f"/Resources << /Font << /F1 {3 + 2 * n_pages} 0 R >> >> "
             f"/Contents {page_num + 1} 0 R >>").encode()
        )
        objs.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream"
            % (len(content), filt, content)
        )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_pos))
    return bytes(out)


def build_pdf_modern(pages: list[list[Span]],
                     predictor: bool = True,
                     indirect_length: bool = False) -> bytes:
    """PDF 1.5 layout — what today's writers actually emit: the small
    dictionary objects (catalog, pages tree, page dicts, font) packed
    into a FlateDecode OBJECT STREAM, and a cross-reference STREAM
    (binary W-triples, optionally PNG Up-predictor) instead of the
    classic xref table. Content streams stay top-level (spec: streams
    may not live inside an ObjStm). ``indirect_length`` declares each
    content stream's /Length as an indirect reference, another
    modern-writer habit the reader must resolve.
    """
    import zlib

    n = len(pages)
    # Numbering: 1..n content streams; (if indirect_length) n+1..2n
    # their /Length ints; then compressed: catalog, pages, page dicts,
    # font; finally ObjStm and XRef stream objects.
    len_base = n if indirect_length else 0
    catalog_num = n + len_base + 1
    pages_num = catalog_num + 1
    first_page_num = pages_num + 1
    font_num = first_page_num + n
    objstm_num = font_num + 1
    xref_num = objstm_num + 1

    contents = []
    for spans in pages:
        contents.append(zlib.compress(page_content(spans)))

    kids = " ".join(f"{first_page_num + i} 0 R" for i in range(n))
    compressed_members: list[tuple[int, bytes]] = [
        (catalog_num, b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num),
        (pages_num,
         f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()),
    ]
    for i in range(n):
        compressed_members.append((
            first_page_num + i,
            (f"<< /Type /Page /Parent {pages_num} 0 R "
             f"/MediaBox [0 0 612 792] "
             f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
             f"/Contents {i + 1} 0 R >>").encode(),
        ))
    compressed_members.append((
        font_num,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ))

    # ObjStm payload: 'num off' header pairs, then packed bodies.
    bodies = b" ".join(b for _, b in compressed_members)
    offs, pos = [], 0
    for _, b in compressed_members:
        offs.append(pos)
        pos += len(b) + 1  # the single joining space
    header = " ".join(
        f"{num} {off}" for (num, _), off in zip(compressed_members, offs)
    ).encode() + b" "
    objstm_payload = zlib.compress(header + bodies)

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n%s\nendobj\n" % (num, body))

    for i, c in enumerate(contents):
        if indirect_length:
            emit(i + 1,
                 b"<< /Length %d 0 R /Filter /FlateDecode >>\n"
                 b"stream\n%s\nendstream" % (n + i + 1, c))
            emit(n + i + 1, b"%d" % len(c))
        else:
            emit(i + 1,
                 b"<< /Length %d /Filter /FlateDecode >>\n"
                 b"stream\n%s\nendstream" % (len(c), c))
    emit(objstm_num,
         b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode "
         b"/Length %d >>\nstream\n%s\nendstream"
         % (len(compressed_members), len(header), len(objstm_payload),
            objstm_payload))

    # XRef stream: W = [1 4 2]; entries for objects 0..size-1.
    size = xref_num + 1
    xref_off = len(out)
    offsets[xref_num] = xref_off
    rows = []
    for num in range(size):
        if num == 0:
            rows.append((0, 0, 65535))
        elif num in offsets:
            rows.append((1, offsets[num], 0))
        else:  # a compressed member: (objstm, index)
            idx = next(i for i, (m, _) in enumerate(compressed_members)
                       if m == num)
            rows.append((2, objstm_num, idx))
    w1, w2, w3 = 1, 4, 2
    raw = b"".join(
        t.to_bytes(w1, "big") + a.to_bytes(w2, "big") + b.to_bytes(w3, "big")
        for t, a, b in rows
    )
    parms = b""
    if predictor:
        cols = w1 + w2 + w3
        pred_rows = bytearray()
        prev = bytes(cols)
        for r in range(0, len(raw), cols):
            row = raw[r:r + cols]
            pred_rows += b"\x02" + bytes(
                (row[i] - prev[i]) & 0xFF for i in range(cols)
            )  # PNG Up filter
            prev = row
        raw = bytes(pred_rows)
        parms = b" /DecodeParms << /Predictor 12 /Columns %d >>" % cols
    xref_payload = zlib.compress(raw)
    out.extend(
        b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root %d 0 R "
        b"/Filter /FlateDecode%s /Length %d >>\nstream\n%s\nendstream\n"
        b"endobj\n"
        % (xref_num, size, catalog_num, parms, len(xref_payload),
           xref_payload)
    )
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_off)
    return bytes(out)


def build_pdf_with_images(pages: list[list[Span]]) -> bytes:
    """Classic-layout PDF whose content streams interleave the text
    with BI…ID…EI inline images (one raw-binary with hostile bytes,
    one ASCIIHexDecode-filtered) and a /Im0 Do XObject reference to a
    DCTDecode (JPEG) image stream — the shapes poppler's content
    parser skips without corrupting text output (poppler.go behavior:
    non-text streams never affect extracted text)."""
    n_pages = len(pages)
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    font_num = 3 + 2 * n_pages
    xobj_num = font_num + 1
    # raw binary deliberately full of tokenizer bait: parens, hex
    # delimiters, operator lookalikes, an embedded "EI" without the
    # required whitespace delimiters
    hostile = b"\xff(\x00)<<BT(fake) Tj ET>>[0 1]\x00EIX\xfe\x00" * 3
    inline_raw = (b"q\nBI /W 6 /H 4 /CS /G /BPC 8 ID " + hostile
                  + b" EI\nQ\n")
    inline_hex = (b"q\nBI /W 2 /H 2 /CS /G /BPC 8 /F[/AHx]ID "
                  + b"00ff11ee> EI\nQ\n")
    for i, spans in enumerate(pages):
        content = (inline_raw + page_content(spans) + b"\n"
                   + inline_hex + b"/Im0 Do\n")
        page_num = 3 + 2 * i
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             f"/Resources << /Font << /F1 {font_num} 0 R >> "
             f"/XObject << /Im0 {xobj_num} 0 R >> >> "
             f"/Contents {page_num + 1} 0 R >>").encode()
        )
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream"
            % (len(content), content)
        )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    # JPEG-ish garbage the reader must never attempt to decode
    dct = b"\xff\xd8\xff\xe0" + bytes(range(256)) + b"\xff\xd9"
    objs.append(
        b"<< /Type /XObject /Subtype /Image /Width 16 /Height 16 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
        b"/Filter /DCTDecode /Length %d >>\nstream\n%s\nendstream"
        % (len(dct), dct)
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_pos))
    return bytes(out)


def ccitt_image_entry(payload: bytes, width: int, height: int,
                      k: int = -1,
                      byte_align: bool = False) -> tuple[bytes, bytes]:
    """An image entry for :func:`build_pdf_jpeg_pages` wrapping a
    CCITTFaxDecode stream (kernel/ccitt.py encode_g4 / encode_g3_1d
    output) with its /DecodeParms."""
    ba = b" /EncodedByteAlign true" if byte_align else b""
    head = (b"/Width %d /Height %d /BitsPerComponent 1 "
            b"/ColorSpace /DeviceGray /Filter /CCITTFaxDecode "
            b"/DecodeParms << /K %d /Columns %d /Rows %d%s >>"
            % (width, height, k, width, height, ba))
    return head, payload


def build_pdf_jpeg_pages(
        pages: list[tuple[list[Span],
                          list[bytes | tuple[bytes, bytes]]]]) -> bytes:
    """Classic-layout PDF where each page carries optional text spans
    plus zero or more REAL image XObjects: a plain ``bytes`` entry is
    a JPEG (DCTDecode stream the from-spec decoder in
    kernel/imgcodec.py can decode); a ``(dict_params, payload)`` tuple
    is spliced verbatim into the XObject dictionary (CCITTFaxDecode
    fax streams via :func:`ccitt_image_entry`, or any custom filter
    mix).  Image-only pages (no spans) exercise the pixel-driven
    needs-ocr/blank decision in kernel/pdfk.extract_pdf."""
    n_pages = len(pages)
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    font_num = 3 + 2 * n_pages
    img_num = font_num + 1
    img_objs: list[bytes] = []
    for i, (spans, jpegs) in enumerate(pages):
        page_num = 3 + 2 * i
        names = []
        xrefs = []
        for j, payload in enumerate(jpegs):
            num = img_num + len(img_objs)
            name = f"Im{num}"
            names.append(name)
            xrefs.append(f"/{name} {num} 0 R")
            if isinstance(payload, tuple):
                params, payload = payload
                img_objs.append(
                    b"<< /Type /XObject /Subtype /Image %s "
                    b"/Length %d >>\nstream\n%s\nendstream"
                    % (params, len(payload), payload))
                continue
            # width/height from the SOF header so the dict agrees
            # with the stream (decoder trusts the stream)
            import struct as _s
            k = payload.find(b"\xff\xc0")
            if k < 0:
                k = payload.find(b"\xff\xc2")
            fh, fw = _s.unpack(">HH", payload[k + 5:k + 9])
            img_objs.append(
                b"<< /Type /XObject /Subtype /Image /Width %d "
                b"/Height %d /BitsPerComponent 8 "
                b"/ColorSpace /DeviceGray /Filter /DCTDecode "
                b"/Length %d >>\nstream\n%s\nendstream"
                % (fw, fh, len(payload), payload))
        content = page_content(spans) if spans else b""
        for name in names:
            content += b"\nq /%s Do Q" % name.encode()
        res = f"/Font << /F1 {font_num} 0 R >>"
        if xrefs:
            res += " /XObject << " + " ".join(xrefs) + " >>"
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             f"/Resources << {res} >> "
             f"/Contents {page_num + 1} 0 R >>").encode())
        objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(content), content))
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objs.extend(img_objs)

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_pos))
    return bytes(out)


def simple_pdf(page_lines: list[list[str]], modern: bool = False) -> bytes:
    """One single-column page per entry of page_lines; ``modern``
    emits the PDF 1.5 xref-stream + object-stream layout."""
    pages = [single_column_page(lines) for lines in page_lines]
    return build_pdf_modern(pages) if modern else build_pdf(pages)


def build_pdf_cmap(pages: list[list[Span]]) -> bytes:
    """Classic-layout PDF whose text is FONT-ENCODED: content streams
    show hex strings of per-document glyph codes and the font carries
    a /ToUnicode CMap (codespace <00> <ff>, bfchar entries in
    100-entry blocks per the CMap spec) mapping codes back to
    Unicode — the shape real-world subsetted fonts produce. The
    reader must resolve Tf → font → ToUnicode to recover the text."""
    chars = sorted({c for spans in pages for _, _, t in spans for c in t})
    if len(chars) > 255:
        raise ValueError("cmap fixture supports <= 255 distinct chars")
    code_of = {c: i + 1 for i, c in enumerate(chars)}

    def content(spans: list[Span]) -> bytes:
        ops = ["BT", "/F1 12 Tf"]
        for x, y, t in spans:
            hexs = "".join(f"{code_of[c]:02x}" for c in t)
            ops.append(f"1 0 0 1 {x:g} {y:g} Tm")
            ops.append(f"<{hexs}> Tj")
        ops.append("ET")
        return "\n".join(ops).encode("latin-1")

    bf = [f"<{code_of[c]:02x}> <{ord(c):04x}>" for c in chars]
    blocks = []
    for i in range(0, len(bf), 100):
        chunk = bf[i:i + 100]
        blocks.append(f"{len(chunk)} beginbfchar\n"
                      + "\n".join(chunk) + "\nendbfchar")
    cmap = (
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "1 begincodespacerange\n<00> <ff>\nendcodespacerange\n"
        + "\n".join(blocks)
        + "\nendcmap\nCMapName currentdict /CMap defineresource pop\n"
          "end\nend\n"
    ).encode("latin-1")

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    touni_num = font_num + 1
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, spans in enumerate(pages):
        body = content(spans)
        page_num = 3 + 2 * i
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
             f"/Contents {page_num + 1} 0 R >>").encode()
        )
        objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(body), body))
    objs.append(
        (f"<< /Type /Font /Subtype /Type0 /BaseFont /Custom-Identity "
         f"/ToUnicode {touni_num} 0 R >>").encode()
    )
    objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                % (len(cmap), cmap))

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_pos))
    return bytes(out)


def build_pdf_encoded(pages: list[list[Span]], encoding_body: bytes,
                      encode) -> bytes:
    """Classic-layout PDF whose simple font carries an /Encoding (a
    base-encoding name like ``b"/WinAnsiEncoding"`` or an inline
    dict with /BaseEncoding + /Differences) and NO ToUnicode — the
    shape scanned-office and legacy-tool PDFs produce.  ``encode``
    maps each span's text to its code bytes (e.g.
    ``lambda t: t.encode("cp1252")``); content streams show the codes
    as hex strings, so the reader must resolve the encoding table to
    recover the text."""
    def content(spans: list[Span]) -> bytes:
        ops = ["BT", "/F1 12 Tf"]
        for x, y, t in spans:
            ops.append(f"1 0 0 1 {x:g} {y:g} Tm")
            ops.append("<" + encode(t).hex() + "> Tj")
        ops.append("ET")
        return "\n".join(ops).encode("latin-1")

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, spans in enumerate(pages):
        body = content(spans)
        page_num = 3 + 2 * i
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
             f"/Contents {page_num + 1} 0 R >>").encode())
        objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(body), body))
    objs.append(b"<< /Type /Font /Subtype /TrueType /BaseFont "
                b"/Custom-Subset /Encoding " + encoding_body + b" >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_pos))
    return bytes(out)


def encrypt_pdf(pdf: bytes, v: int = 2, r: int = 3,
                bits: int = 128) -> bytes:
    """Re-emit a build_pdf()-produced classic PDF with standard
    security-handler encryption (owner password 'own', EMPTY user
    password — the common "protected" web-PDF shape): every stream
    payload encrypted per object, /Encrypt dict + /ID appended, xref
    rebuilt. v=1/r=2 → RC4-40, v=2/r=3 → RC4-128, v=4/r=4 → AES-128
    (AESV2 crypt filter)."""
    import hashlib
    import re as _re

    from pdf_to_text_extraction_service_spark.kernel.pdfcrypt import (
        make_standard_encrypt_dict,
    )

    id0 = hashlib.md5(pdf).digest()
    enc_dict, enc = make_standard_encrypt_dict(v, r, bits, id0)
    head_re = _re.compile(rb"(\d+) 0 obj\n")
    objs: list[tuple[int, bytes]] = []
    i = 0
    while True:
        m = head_re.search(pdf, i)
        if m is None:
            break
        num = int(m.group(1))
        j = m.end()
        end = pdf.find(b"endobj", j)
        sm = pdf.find(b"stream", j)
        if 0 <= sm < end:
            head = pdf[j:sm]
            lm = _re.search(rb"/Length (\d+)", head)
            length = int(lm.group(1))
            start = sm + len(b"stream\n")
            raw = pdf[start:start + length]
            ct = enc.encrypt(num, raw)
            head = _re.sub(rb"/Length \d+", b"/Length %d" % len(ct),
                           head, count=1)
            body = head + b"stream\n" + ct + b"\nendstream"
            end = pdf.find(b"endobj", start + length)
        else:
            body = pdf[j:end].rstrip(b"\n")
        objs.append((num, body))
        i = end + len(b"endobj")
    enc_no = max(n for n, _ in objs) + 1
    objs.append((enc_no, enc_dict))

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num, body in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n%s\nendobj\n" % (num, body)
    xref_pos = len(out)
    n = max(offsets) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for k in range(1, n):
        out += b"%010d 00000 n \n" % offsets[k]
    idhex = id0.hex().encode()
    out += (b"trailer\n<< /Size %d /Root 1 0 R /Encrypt %d 0 R "
            b"/ID [<%s> <%s>] >>\nstartxref\n%d\n%%%%EOF\n"
            % (n, enc_no, idhex, idhex, xref_pos))
    return bytes(out)
