"""Code-family kernels: source files, Jupyter notebooks, LaTeX.

Byte-parity ports of:
- source   reference internal/extractors/code/code.go:34-102
- notebook reference internal/extractors/code/notebook.go:23-65
- latex    reference internal/extractors/code/latex.go:27-51
"""

from __future__ import annotations

import json
import re

from . import runes
from .result import Result

LANGUAGE_BY_EXT = {
    ".py": "python", ".pyw": "python", ".pyi": "python",
    ".js": "javascript", ".jsx": "jsx", ".mjs": "javascript",
    ".cjs": "javascript", ".ts": "typescript", ".tsx": "tsx",
    ".mts": "typescript", ".cts": "typescript",
    ".go": "go", ".java": "java", ".kt": "kotlin", ".kts": "kotlin",
    ".scala": "scala", ".groovy": "groovy", ".c": "c", ".h": "c",
    ".cpp": "cpp", ".hpp": "cpp", ".cc": "cpp", ".cxx": "cpp",
    ".cs": "csharp",
    ".rb": "ruby", ".php": "php", ".swift": "swift",
    ".m": "objective-c", ".mm": "objective-c", ".rs": "rust",
    ".dart": "dart", ".ex": "elixir", ".exs": "elixir",
    ".erl": "erlang", ".hs": "haskell", ".ml": "ocaml", ".mli": "ocaml",
    ".clj": "clojure", ".cljs": "clojure",
    ".lua": "lua", ".r": "r", ".jl": "julia", ".pl": "perl",
    ".pm": "perl", ".zig": "zig", ".nim": "nim", ".v": "v",
    ".cr": "crystal", ".d": "d", ".adb": "ada", ".ads": "ada",
    ".asm": "asm", ".s": "asm", ".cu": "cuda", ".cuh": "cuda",
    ".sh": "bash", ".bash": "bash", ".zsh": "zsh", ".fish": "fish",
    ".ksh": "ksh", ".csh": "csh", ".ps1": "powershell",
    ".psm1": "powershell", ".psd1": "powershell", ".bat": "bat",
    ".cmd": "bat", ".sql": "sql", ".graphql": "graphql",
    ".gql": "graphql", ".proto": "proto", ".tf": "hcl", ".hcl": "hcl",
    ".tfvars": "hcl", ".nix": "nix",
}

# Registration list includes ".S" which lowercases onto ".s" (code.go:29).
SOURCE_EXTENSIONS = frozenset(LANGUAGE_BY_EXT.keys())

_SIG_PREFIXES = ("func ", "class ", "def ", "interface ", "type ")
_DOC_PREFIXES = ("//", "#", '"""', "/*")


def _summarize_large_code(src: str) -> str:
    """code.go:62-87 — first 50 lines + up to 500 signature/doc lines."""
    lines = src.split("\n")
    head = lines[:50]
    sigs: list[str] = []
    for line in lines:
        trim = runes.trim_space(line)
        if trim == "":
            continue
        if trim.startswith(_SIG_PREFIXES):
            sigs.append(line)
            continue
        if trim.startswith(_DOC_PREFIXES):
            sigs.append(line)
        if len(sigs) >= 500:
            break
    return runes.trim_space(
        "\n".join(head) + "\n\n/* signatures + docs */\n" + "\n".join(sigs)
    )


def extract_source(b: bytes, file_name: str, mime: str) -> Result:
    text = runes.trim_space(b.decode("utf-8", errors="replace"))
    ext = _file_ext(file_name)
    lang = LANGUAGE_BY_EXT.get(ext, "text")
    lines = text.count("\n") + 1
    if lines > 10000:
        text = _summarize_large_code(text)
        lines = text.count("\n") + 1
    wrapped = f"<!-- lang: {lang}, lines: {lines} -->\n\n```{lang}\n{text}\n```"
    w, c = runes.build_counts(wrapped)
    return Result(success=True, text=wrapped, method="code",
                  file_type="code/source", mime_type=mime,
                  metadata={"language": lang}, word_count=w, char_count=c)


def _file_ext(file_name: str) -> str:
    """Go filepath.Ext semantics: suffix from the final dot, lowered."""
    base = file_name.rsplit("/", 1)[-1]
    i = base.rfind(".")
    return base[i:].lower() if i >= 0 else ""


def extract_notebook(b: bytes, mime: str) -> Result:
    """notebook.go:23-65 — strict struct decode; code cells fenced
    python, joined with \\n\\n---\\n\\n."""
    try:
        nb = json.loads(b)
        if not isinstance(nb, dict):
            raise ValueError("cannot unmarshal notebook")
        cells = nb.get("cells", [])
        if cells is None:
            cells = []
        if not isinstance(cells, list):
            raise ValueError("cannot unmarshal cells")
        parts: list[str] = []
        for cell in cells:
            if not isinstance(cell, dict):
                raise ValueError("cannot unmarshal cell")
            source = cell.get("source", [])
            if source is None:
                source = []
            if not isinstance(source, list):
                # Go's []string field would error on a string source;
                # the whole extraction fails (notebook.go:44-47).
                raise ValueError("cannot unmarshal cell source")
            src = runes.trim_space("".join(source))
            if src == "":
                continue
            if cell.get("cell_type") == "code":
                parts.append("```python\n" + src + "\n```")
            else:
                parts.append(src)
    except Exception as exc:  # json error → failed result
        return Result(success=False, file_type="code/notebook",
                      mime_type=mime, error=str(exc))
    text = "\n\n---\n\n".join(parts)
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type="code/notebook", mime_type=mime,
                  word_count=w, char_count=c)


_LATEX_COMMENT = re.compile(r"^%.*$", re.MULTILINE)
_LATEX_SECTION = re.compile(r"\\section\{([^}]+)\}")
_LATEX_SUBSECTION = re.compile(r"\\subsection\{([^}]+)\}")
_LATEX_SUBSUBSECTION = re.compile(r"\\subsubsection\{([^}]+)\}")
_LATEX_CMD = re.compile(r"\\[a-zA-Z]+\*?(\[[^\]]*\])?(\{[^}]*\})?")


def extract_latex(b: bytes, mime: str) -> Result:
    """latex.go:27-51 — regex pipeline in exact order."""
    s = b.decode("utf-8", errors="replace")
    s = _LATEX_COMMENT.sub("", s)
    s = _LATEX_SECTION.sub(r"# \1", s)
    s = _LATEX_SUBSECTION.sub(r"## \1", s)
    s = _LATEX_SUBSUBSECTION.sub(r"### \1", s)
    s = _LATEX_CMD.sub("", s)
    s = s.replace("{", "").replace("}", "")
    s = runes.trim_space(s)
    w, c = runes.build_counts(s)
    return Result(success=True, text=s, method="native",
                  file_type="code/latex", mime_type=mime,
                  word_count=w, char_count=c)
