"""Legacy binary Office extraction (.doc / .xls / .ppt), from scratch.

The reference shells out to LibreOffice for these
(internal/extractors/office/legacy.go:38-59: ``soffice --headless
--convert-to txt``) and returns the trimmed text with BuildCounts.
That subprocess is unavailable offline — and its output is
soffice-version-dependent — so this kernel parses the public binary
formats natively instead (same spirit as kernel/pdfk.py replacing
poppler):

- .doc  (MS-DOC):  FIB → CLX piece table in the 0Table/1Table stream
  → text pieces (cp1252-compressed or UTF-16LE) from WordDocument.
- .xls  (MS-XLS, BIFF8): Workbook record stream — SST (with Continue
  records), LabelSst/Label/Number/RK/MulRk cells, Boundsheet names —
  assembled into the same markdown-table shape the XLSX kernel emits.
- .ppt  (MS-PPT): recursive record walk of the "PowerPoint Document"
  stream collecting TextCharsAtom / TextBytesAtom in order.

Envelope parity with legacy.go: file_type "document/legacy-office",
strings.TrimSpace'd text, BuildCounts word/char counts. ``method`` is
"native" (not "libreoffice") because nothing shells out — a
documented, deliberate divergence.
"""

from __future__ import annotations

import struct

from . import runes
from .cfb import CFB, CFBError
from .result import Result

FILE_TYPE = "document/legacy-office"


# ------------------------------------------------------------------ .doc


def _doc_control_text(raw: str) -> str:
    """Map Word control characters to plain text, the way the
    reference's soffice conversion renders them (office/legacy.go:43):

    - 0x0D paragraph / 0x0B line break → newline
    - fields: 0x13 begin … 0x14 separator … 0x15 end — the
      INSTRUCTION part (begin→separator) is dropped, the RESULT part
      (separator→end) is kept; a field with no separator contributes
      nothing. Nesting suppresses inner results inside an outer
      instruction.
    - tables: each cell ends with a 0x07 cell mark and the row with an
      additional 0x07 row mark — cells join with tabs, rows end with a
      newline (so "a\\x07b\\x07\\x07" renders "a\\tb\\n").
    - other control placeholders (pictures 0x01, anchors 0x08, …)
      dropped."""
    out = []
    field_depth = 0   # nesting depth of open fields
    suppress = 0      # open fields currently in their INSTRUCTION part
    i, n = 0, len(raw)
    while i < n:
        ch = raw[i]
        o = ord(ch)
        i += 1
        if o == 0x13:  # field begin
            field_depth += 1
            suppress += 1
            continue
        if o == 0x14:  # field separator: instruction ends
            if suppress:
                suppress -= 1
            continue
        if o == 0x15:  # field end
            if field_depth:
                field_depth -= 1
            if suppress > field_depth:  # field had no separator
                suppress = field_depth
            continue
        if suppress:
            continue
        if ch in ("\r", "\x0b"):
            out.append("\n")
        elif ch == "\x07":
            # Runs of cell/row marks: a single 0x07 separates cells
            # (tab); a run of k>=2 is read as last-cell mark + row mark
            # preceded by k-2 empty-cell boundaries ((k-2) tabs then a
            # newline). "a\x07\x07b" is textually ambiguous (empty
            # mid-row cell vs row boundary) without paragraph
            # properties; rows are far more common, so runs resolve as
            # row ends — same trade the text-level converters make.
            k = 1
            while i < n and raw[i] == "\x07":
                k += 1
                i += 1
            if k == 1:
                out.append("\t")
            else:
                out.append("\t" * (k - 2) + "\n")
        elif o in (0x01, 0x02, 0x05, 0x08):
            continue  # pictures, embedded-object anchors, footnotes
        elif o < 0x20 and ch not in ("\t", "\n"):
            continue
        else:
            out.append(ch)
    return "".join(out)


def extract_doc_text(container: CFB) -> str:
    word = container.stream("WordDocument")
    if len(word) < 0x20 or struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        raise CFBError("not a Word binary file (bad FIB ident)")
    n_fib = struct.unpack_from("<H", word, 2)[0]
    flags = struct.unpack_from("<H", word, 0x000A)[0]
    if n_fib < 101 or len(word) < 0x01AA:
        # Word95 and earlier (or a truncated FIB): no CLX piece
        # table — the text is the contiguous [fcMin, fcMac) range,
        # single-byte unless fExtChar
        fc_min = struct.unpack_from("<I", word, 0x18)[0]
        fc_mac = struct.unpack_from("<I", word, 0x1C)[0]
        if not (0 <= fc_min <= fc_mac <= len(word)):
            raise CFBError("bad fcMin/fcMac range")
        raw = word[fc_min:fc_mac]
        if flags & 0x1000:  # fExtChar: 16-bit text
            text = raw.decode("utf-16-le", errors="replace")
        else:
            text = raw.decode("cp1252", errors="replace")
        return _doc_control_text(text)
    table_name = "1Table" if flags & 0x0200 else "0Table"
    try:
        table = container.stream(table_name)
    except CFBError:
        # some writers emit only the other table stream
        table = container.stream(
            "0Table" if table_name == "1Table" else "1Table")
    fc_clx = struct.unpack_from("<I", word, 0x01A2)[0]
    lcb_clx = struct.unpack_from("<I", word, 0x01A6)[0]
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise CFBError("missing CLX piece table")
    clx = table[fc_clx:fc_clx + lcb_clx]
    # CLX = (clxt=1 Prc)* then clxt=2 Pcdt
    i = 0
    while i < len(clx) and clx[i] == 0x01:
        if i + 3 > len(clx):
            raise CFBError("truncated Prc in CLX")
        cb = struct.unpack_from("<H", clx, i + 1)[0]
        i += 3 + cb
    if i >= len(clx) or clx[i] != 0x02:
        raise CFBError("CLX has no Pcdt")
    if i + 5 > len(clx):
        raise CFBError("truncated Pcdt header in CLX")
    (lcb_plc,) = struct.unpack_from("<I", clx, i + 1)
    plc = clx[i + 5:i + 5 + lcb_plc]
    if len(plc) < lcb_plc or lcb_plc < 4 or (lcb_plc - 4) % 12 != 0:
        raise CFBError("malformed PlcPcd")
    n = (lcb_plc - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    pieces = []
    for k in range(n):
        pcd = plc[(n + 1) * 4 + k * 8:(n + 1) * 4 + (k + 1) * 8]
        fc = struct.unpack_from("<I", pcd, 2)[0]
        compressed = bool(fc & 0x40000000)
        fc &= 0x3FFFFFFF
        n_chars = cps[k + 1] - cps[k]
        if n_chars <= 0:
            continue
        if compressed:
            start = fc // 2
            raw = word[start:start + n_chars]
            pieces.append(raw.decode("cp1252", errors="replace"))
        else:
            raw = word[fc:fc + 2 * n_chars]
            pieces.append(raw.decode("utf-16-le", errors="replace"))
    return _doc_control_text("".join(pieces))


# ------------------------------------------------------------------ .xls


def _biff_records(stream: bytes):
    i = 0
    while i + 4 <= len(stream):
        rec_id, length = struct.unpack_from("<HH", stream, i)
        body = stream[i + 4:i + 4 + length]
        yield rec_id, body
        i += 4 + length
        if rec_id == 0x000A and i >= len(stream):  # trailing EOF
            break


def _parse_sst(body: bytes, continues: list[bytes]) -> list[str]:
    """XLUnicodeRichExtendedString array; strings may resume in
    Continue records with a fresh grbit byte."""
    (_, unique) = struct.unpack_from("<II", body, 0)
    segs = [body[8:]] + continues
    out: list[str] = []
    seg = 0
    pos = 0

    def remaining() -> int:
        return len(segs[seg]) - pos

    def advance() -> bool:
        nonlocal seg, pos
        if seg + 1 < len(segs):
            seg += 1
            pos = 0
            return True
        return False

    def read(nbytes: int) -> bytes:
        nonlocal pos
        chunks = b""
        need = nbytes
        while need:
            take = min(need, remaining())
            chunks += segs[seg][pos:pos + take]
            pos += take
            need -= take
            if need and not advance():
                raise CFBError("truncated SST")
        return chunks

    for _ in range(unique):
        if remaining() < 3 and not (remaining() == 0 and advance()):
            if remaining() < 3:
                break
        cch = struct.unpack("<H", read(2))[0]
        grbit = read(1)[0]
        c_run = struct.unpack("<H", read(2))[0] if grbit & 0x08 else 0
        cb_ext = struct.unpack("<I", read(4))[0] if grbit & 0x04 else 0
        chars: list[str] = []
        left = cch
        high = bool(grbit & 0x01)
        while left:
            if remaining() == 0:
                if not advance():
                    raise CFBError("truncated SST string")
                high = bool(read(1)[0] & 0x01)  # fresh grbit per segment
                continue
            if high:
                if remaining() == 1:
                    # odd trailing byte in a 16-bit segment (corrupt
                    # record): consume it so the loop always advances
                    read(1)
                    continue
                take = min(left, remaining() // 2)
                chars.append(read(2 * take).decode("utf-16-le",
                                                   errors="replace"))
            else:
                take = min(left, remaining())
                chars.append(read(take).decode("cp1252",
                                               errors="replace"))
            left -= take
        read(4 * c_run + cb_ext)
        out.append("".join(chars))
    return out


def _parse_string_record(body: bytes, continues: list[bytes]) -> str:
    """STRING record (0x0207): an XLUnicodeString ``cch grbit chars``
    whose chars may overflow into Continue records, each of which
    restarts with its own grbit byte."""
    cch, grbit = struct.unpack_from("<HB", body, 0)
    segs = [(grbit, body[3:])]
    for c in continues:
        if c:
            segs.append((c[0], c[1:]))
    parts: list[str] = []
    left = cch
    for g, data in segs:
        if left <= 0:
            break
        if g & 0x01:
            take = min(left, len(data) // 2)
            parts.append(data[:2 * take].decode("utf-16-le",
                                                errors="replace"))
        else:
            take = min(left, len(data))
            parts.append(data[:take].decode("cp1252", errors="replace"))
        left -= take
    return "".join(parts)


# BIFF8 cached-error codes (MS-XLS 2.5.97.2 BErr)
_BIFF_ERRORS = {
    0x00: "#NULL!", 0x07: "#DIV/0!", 0x0F: "#VALUE!", 0x17: "#REF!",
    0x1D: "#NAME?", 0x24: "#NUM!", 0x2A: "#N/A",
}


def _rk_value(rk: int) -> float:
    v: float
    if rk & 0x02:
        v = float(rk >> 2 if not (rk & 0x80000000)
                  else (rk >> 2) - (1 << 30))
    else:
        v = struct.unpack("<d", struct.pack("<Q", (rk & ~0x03) << 32))[0]
    if rk & 0x01:
        v /= 100.0
    return v


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def extract_xls_cells(container: CFB):
    """Returns (sheet_names, {sheet_index: {(row, col): text}})."""
    try:
        wb = container.stream("Workbook")
    except CFBError:
        wb = container.stream("Book")
    recs = list(_biff_records(wb))
    # attach Continue records (0x003C) to their predecessor
    sst: list[str] = []
    sheets: list[str] = []
    for idx, (rid, body) in enumerate(recs):
        if rid == 0x00FC:  # SST
            conts = []
            for rid2, body2 in recs[idx + 1:]:
                if rid2 != 0x003C:
                    break
                conts.append(body2)
            sst = _parse_sst(body, conts)
        elif rid == 0x0085:  # Boundsheet
            if len(body) >= 8:
                cch = body[6]
                grbit = body[7]
                raw = body[8:]
                if grbit & 0x01:
                    sheets.append(raw[:2 * cch].decode(
                        "utf-16-le", errors="replace"))
                else:
                    sheets.append(raw[:cch].decode(
                        "cp1252", errors="replace"))
    cells: dict[int, dict[tuple[int, int], str]] = {}
    sheet_i = -1  # first BOF is the workbook globals substream
    pending_str: tuple[int, int, int] | None = None  # formula → STRING
    for rec_i, (rid, body) in enumerate(recs):
        if rid == 0x0207 and pending_str is not None and len(body) >= 3:
            # STRING: cached string result of the preceding FORMULA;
            # overflow chars continue in 0x003C records, each with a
            # fresh grbit byte (same layout as SST continuations)
            si, row, col = pending_str
            conts = []
            for rid2, body2 in recs[rec_i + 1:]:
                if rid2 != 0x003C:
                    break
                conts.append(body2)
            cells.setdefault(si, {})[(row, col)] = \
                _parse_string_record(body, conts)
            pending_str = None
            continue
        if rid != 0x003C:
            pending_str = None
        if rid == 0x0809:  # BOF
            sheet_i += 1
        elif rid == 0x0006 and sheet_i >= 1 and len(body) >= 14:  # Formula
            row, col, _ = struct.unpack_from("<HHH", body, 0)
            num = body[6:14]
            if num[6:8] == b"\xff\xff":  # non-numeric cached value
                kind = num[0]
                if kind == 0:  # string: a STRING record follows
                    pending_str = (sheet_i - 1, row, col)
                elif kind == 1:  # boolean
                    cells.setdefault(sheet_i - 1, {})[(row, col)] = \
                        "TRUE" if num[2] else "FALSE"
                elif kind == 2:  # error
                    cells.setdefault(sheet_i - 1, {})[(row, col)] = \
                        _BIFF_ERRORS.get(num[2], "#ERR!")
                # kind 3: empty string → no cell
            else:
                (v,) = struct.unpack_from("<d", num, 0)
                cells.setdefault(sheet_i - 1, {})[(row, col)] = \
                    _fmt_num(v)
        elif rid == 0x00FD and sheet_i >= 1 and len(body) >= 10:  # LabelSst
            row, col, _, isst = struct.unpack_from("<HHHI", body, 0)
            if isst < len(sst):
                cells.setdefault(sheet_i - 1, {})[(row, col)] = sst[isst]
        elif rid == 0x0204 and sheet_i >= 1 and len(body) >= 9:  # Label
            row, col, _, cch, grbit = struct.unpack_from("<HHHHB", body, 0)
            raw = body[9:]
            if grbit & 0x01:
                txt = raw[:2 * cch].decode("utf-16-le", errors="replace")
            else:
                txt = raw[:cch].decode("cp1252", errors="replace")
            cells.setdefault(sheet_i - 1, {})[(row, col)] = txt
        elif rid == 0x0203 and sheet_i >= 1 and len(body) >= 14:  # Number
            row, col, _ = struct.unpack_from("<HHH", body, 0)
            (v,) = struct.unpack_from("<d", body, 6)
            cells.setdefault(sheet_i - 1, {})[(row, col)] = _fmt_num(v)
        elif rid == 0x027E and sheet_i >= 1 and len(body) >= 10:  # RK
            row, col, _ = struct.unpack_from("<HHH", body, 0)
            (rk,) = struct.unpack_from("<I", body, 6)
            cells.setdefault(sheet_i - 1, {})[(row, col)] = _fmt_num(
                _rk_value(rk))
        elif rid == 0x00BD and sheet_i >= 1 and len(body) >= 12:  # MulRk
            row, col_first = struct.unpack_from("<HH", body, 0)
            col_last = struct.unpack_from("<H", body, len(body) - 2)[0]
            # clamp to what the body actually carries (4-byte header,
            # 2-byte trailing colLast, 6 bytes per RK field): a corrupt
            # colLast must not drive unpack_from past the record
            n_fields = (len(body) - 6) // 6
            for j in range(max(0, min(col_last - col_first + 1,
                                      n_fields))):
                (rk,) = struct.unpack_from("<I", body, 4 + 6 * j + 2)
                cells.setdefault(sheet_i - 1, {})[
                    (row, col_first + j)] = _fmt_num(_rk_value(rk))
    return sheets, cells


def _xls_markdown(sheets: list[str],
                  cells: dict[int, dict[tuple[int, int], str]]) -> str:
    """Same markdown-table shape as the XLSX kernel (xlsx.go:27-129
    analog): '## Sheet: name' sections, header row + --- separator,
    1000-data-row truncation."""
    sections = []
    for i, name in enumerate(sheets):
        grid = cells.get(i, {})
        if not grid:
            continue
        max_row = max(r for r, _ in grid)
        max_col = max(c for _, c in grid)
        rows = [
            [grid.get((r, c), "") for c in range(max_col + 1)]
            for r in range(max_row + 1)
        ]
        rows = [r for r in rows
                if any(runes.trim_space(c) != "" for c in r)]
        if not rows:
            continue
        truncated = False
        if len(rows) > 1001:
            rows = rows[:1001]
            truncated = True
        out = ["| " + " | ".join(rows[0]) + " |\n"]
        out.append("| " + " | ".join(["---"] * (max_col + 1)) + " |\n")
        for row in rows[1:]:
            out.append("| " + " | ".join(row) + " |\n")
        if truncated:
            out.append("\n... truncated to first 1000 data rows\n")
        sections.append("## Sheet: " + name + "\n\n" + "".join(out))
    return "\n\n---\n\n".join(sections)


# ------------------------------------------------------------------ .ppt


def _ppt_walk(buf: bytes, out: list[str], depth: int = 0) -> None:
    i = 0
    while i + 8 <= len(buf) and depth < 32:
        ver_inst, rec_type, rec_len = struct.unpack_from("<HHI", buf, i)
        body = buf[i + 8:i + 8 + rec_len]
        if (ver_inst & 0x0F) == 0x0F:  # container record
            _ppt_walk(body, out, depth + 1)
        elif rec_type == 0x0FA0:  # TextCharsAtom (UTF-16LE)
            out.append(body.decode("utf-16-le", errors="replace"))
        elif rec_type == 0x0FA8:  # TextBytesAtom (cp1252)
            out.append(body.decode("cp1252", errors="replace"))
        elif rec_type == 0x0FBA:  # CString (UTF-16LE — titles etc.)
            out.append(body.decode("utf-16-le", errors="replace"))
        i += 8 + rec_len


def extract_ppt_text(container: CFB) -> str:
    doc = container.stream("PowerPoint Document")
    frames: list[str] = []
    _ppt_walk(doc, frames)
    cleaned = [_doc_control_text(f) for f in frames]
    return "\n\n".join(c for c in cleaned if runes.trim_space(c) != "")


# ------------------------------------------------------------ dispatcher


def extract_legacy_office(b: bytes, mime: str) -> Result:
    """CFB sniff on stream names — the extension is advisory only
    (real crawls misname legacy files constantly)."""
    try:
        container = CFB(b)
        if "WordDocument" in container.streams:
            text = extract_doc_text(container)
        elif ("Workbook" in container.streams
              or "Book" in container.streams):
            text = _xls_markdown(*extract_xls_cells(container))
        elif "PowerPoint Document" in container.streams:
            text = extract_ppt_text(container)
        else:
            raise CFBError(
                "no WordDocument/Workbook/PowerPoint Document stream")
    except (CFBError, struct.error, IndexError) as exc:
        # struct.error/IndexError: defense in depth for malformed
        # record bodies the per-site bounds checks don't cover — the
        # module's contract is "failure Result, never raise"
        return Result(success=False, file_type=FILE_TYPE,
                      mime_type=mime, error=str(exc))
    text = runes.trim_space(text)
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type=FILE_TYPE, mime_type=mime,
                  word_count=w, char_count=c)
