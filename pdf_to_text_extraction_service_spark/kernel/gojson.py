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
    """Go strconv.AppendFloat(f, 'g', -1, 64) behavior: shortest
    round-trip digits, scientific notation only when exp < -4 or
    exp >= 21."""
    if math.isinf(f) or math.isnan(f):
        raise ValueError("unsupported float value")
    if f == int(f) and abs(f) < 1e21:
        return str(int(f))
    r = repr(f)
    if "e" not in r and "E" not in r:
        return r
    mant, _, exp_s = r.partition("e")
    exp = int(exp_s)
    if -4 <= exp < 21:
        return f"{f:.{max(0, 17)}g}".rstrip()
    sign = "+" if exp >= 0 else "-"
    return f"{mant}e{sign}{abs(exp):02d}"
