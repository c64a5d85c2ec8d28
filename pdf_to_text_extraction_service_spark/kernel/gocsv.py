"""Go encoding/csv-compatible reader (strict quoting, no lazy quotes).

The reference parses CSV/TSV with Go's encoding/csv at
internal/extractors/structured/csv.go:57-68 (FieldsPerRecord=-1,
default strict quoting). Python's stdlib csv module is lenient where Go
errors (bare quotes in unquoted fields, stray text after a closing
quote), so delimiter-probing order could diverge — we implement Go's
state machine: blank lines skipped, ``""`` escapes inside quoted
fields, ``\\r\\n`` inside quoted fields normalized to ``\\n``, errors on
bare quotes / malformed quoted fields.
"""

from __future__ import annotations


class CSVError(ValueError):
    pass


def read_all(text: str, delim: str) -> list[list[str]]:
    records: list[list[str]] = []
    i = 0
    n = len(text)
    while i < n:
        # Skip blank lines (Go: a line with no data produces no record).
        if text[i] == "\n":
            i += 1
            continue
        if text[i] == "\r" and i + 1 < n and text[i + 1] == "\n":
            i += 2
            continue
        record: list[str] = []
        while True:
            field, i, ended_line = _read_field(text, i, delim)
            record.append(field)
            if ended_line:
                break
        records.append(record)
    return records


def _read_field(text: str, i: int, delim: str) -> tuple[str, int, bool]:
    """Parse one field starting at i; return (value, next_index,
    record_ended)."""
    n = len(text)
    if i < n and text[i] == '"':
        # Quoted field.
        i += 1
        buf: list[str] = []
        while True:
            if i >= n:
                raise CSVError('extraneous or missing " in quoted-field')
            ch = text[i]
            if ch == '"':
                if i + 1 < n and text[i + 1] == '"':
                    buf.append('"')
                    i += 2
                    continue
                i += 1
                # After the closing quote: delimiter, line end, or EOF.
                if i >= n:
                    return "".join(buf), i, True
                if text[i] == delim:
                    return "".join(buf), i + 1, False
                if text[i] == "\n":
                    return "".join(buf), i + 1, True
                if text[i] == "\r" and i + 1 < n and text[i + 1] == "\n":
                    return "".join(buf), i + 2, True
                raise CSVError('extraneous or missing " in quoted-field')
            if ch == "\r" and i + 1 < n and text[i + 1] == "\n":
                buf.append("\n")
                i += 2
                continue
            buf.append(ch)
            i += 1
    # Unquoted field.
    buf = []
    while i < n:
        ch = text[i]
        if ch == delim:
            return "".join(buf), i + 1, False
        if ch == "\n":
            return "".join(buf), i + 1, True
        if ch == "\r" and i + 1 < n and text[i + 1] == "\n":
            return "".join(buf), i + 2, True
        if ch == '"':
            raise CSVError('bare " in non-quoted field')
        buf.append(ch)
        i += 1
    return "".join(buf), i, True
