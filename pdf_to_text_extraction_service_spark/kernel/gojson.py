"""Go encoding/json MarshalIndent-compatible serializer.

The JSON kernel pretty-prints with Go's json.MarshalIndent(obj, "",
"  ") (reference internal/extractors/structured/json_extract.go:48-58).
Go's output differs from Python json.dumps in: map keys sorted by byte
order, HTML-escaping of ``<``/``>``/``&`` (``\\u003c`` etc.), U+2028/
U+2029 escaped, ``\\f``/``\\b`` emitted as ``\\u000c``/``\\u0008``, and
%g-style shortest float formatting with the exponent switch at 1e21 /
1e-4. We serialize by hand for exact control.
"""

from __future__ import annotations

import math


def marshal_indent(obj: object, indent: str = "  ") -> str:
    out: list[str] = []
    _write(obj, out, indent, "")
    return "".join(out)


def _write(obj: object, out: list[str], indent: str, prefix: str) -> None:
    if obj is None:
        out.append("null")
    elif obj is True:
        out.append("true")
    elif obj is False:
        out.append("false")
    elif isinstance(obj, str):
        out.append(_string(obj))
    elif isinstance(obj, int):
        out.append(str(obj))
    elif isinstance(obj, float):
        out.append(_float(obj))
    elif isinstance(obj, dict):
        if not obj:
            out.append("{}")
            return
        inner = prefix + indent
        out.append("{")
        # Go json.Unmarshal into interface{} produces map[string]any;
        # MarshalIndent sorts keys by byte order.
        keys = sorted(obj.keys(), key=lambda k: str(k).encode("utf-8"))
        for j, k in enumerate(keys):
            out.append("\n" + inner)
            out.append(_string(str(k)))
            out.append(": ")
            _write(obj[k], out, indent, inner)
            if j < len(keys) - 1:
                out.append(",")
        out.append("\n" + prefix + "}")
    elif isinstance(obj, (list, tuple)):
        if not obj:
            out.append("[]")
            return
        inner = prefix + indent
        out.append("[")
        for j, v in enumerate(obj):
            out.append("\n" + inner)
            _write(v, out, indent, inner)
            if j < len(obj) - 1:
                out.append(",")
        out.append("\n" + prefix + "]")
    else:
        raise TypeError(f"unsupported type: {type(obj)!r}")


_ESC = {
    '"': '\\"',
    "\\": "\\\\",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "<": "\\u003c",
    ">": "\\u003e",
    "&": "\\u0026",
    "\u2028": "\\u2028",
    "\u2029": "\\u2029",
}


def _string(s: str) -> str:
    out = ['"']
    for ch in s:
        esc = _ESC.get(ch)
        if esc is not None:
            out.append(esc)
        elif ord(ch) < 0x20:
            out.append("\\u%04x" % ord(ch))
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _float(f: float) -> str:
    """Go encoding/json float formatting (encode.go appendFloat):
    shortest round-trip digits via 'f' when 1e-6 <= |x| < 1e21 (or
    zero), 'e' otherwise — and the 'e' form drops the leading zero of
    a two-digit NEGATIVE exponent ("1e-09" → "1e-9"), exactly like
    Go's post-format fixup. Both engines' shortest-digit algorithms
    produce identical digit strings (the shortest representation is
    unique), so Python repr supplies the digits."""
    if math.isinf(f) or math.isnan(f):
        raise ValueError("unsupported float value")
    if f == 0.0:
        return "-0" if math.copysign(1.0, f) < 0 else "0"
    abs_f = abs(f)
    if abs_f < 1e-6 or abs_f >= 1e21:
        s = repr(f)  # always exponent form in this range
        if "e" not in s:  # defensive: force 'e'
            s = f"{f:e}"
        mant, _, exp_s = s.partition("e")
        exp = int(exp_s)
        sign = "+" if exp >= 0 else "-"
        es = f"{abs(exp):02d}"
        if sign == "-" and len(es) == 2 and es[0] == "0":
            es = es[1]  # Go's e-0X → e-X fixup
        return f"{mant}e{sign}{es}"
    # 'f' range: expand any exponent repr to fixed notation
    if f == int(f):
        return str(int(f))
    s = repr(f)
    if "e" in s or "E" in s:
        import decimal
        s = format(decimal.Decimal(s), "f")
    return s
