"""strptime → java.time (Spark datetime pattern) translator.

The mapping language's ``date_format`` transform and the typed-path date
parsers are specified with Python ``strptime`` patterns (reference
``dynamic.py:105-124``, ``revolut_stocks.py:86-102``).  Spark's
``to_timestamp``/``date_format`` take java.time ``DateTimeFormatter`` patterns,
so mappings are translated once at compile time — never per row.

Unsupported directives raise at compile time (fail-fast beats silently wrong
dates at 100 TB).
"""

from __future__ import annotations

# For *formatting* (strftime parity): zero-padded, like strftime.
_DIRECTIVES: dict[str, str] = {
    "Y": "yyyy",
    "y": "yy",
    "m": "MM",
    "d": "dd",
    "H": "HH",
    "I": "hh",
    "M": "mm",
    "S": "ss",
    "p": "a",
    "b": "MMM",
    "B": "MMMM",
    "a": "EEE",
    "A": "EEEE",
    "f": "SSSSSS",
    "j": "DDD",
    "z": "xx",
    "Z": "zz",
    "G": "YYYY",  # ISO year
    "V": "ww",  # ISO week (approximate: java 'ww' is locale week)
    "u": "e",  # ISO weekday 1-7
}

# For *parsing* (strptime parity): strptime accepts non-zero-padded numbers
# ("Feb 3, 2020, 9:18:39 AM" parses with %d/%I), so numeric fields translate
# to single-letter java patterns, which accept 1-2 digits.
_PARSE_OVERRIDES: dict[str, str] = {
    "m": "M",
    "d": "d",
    "H": "H",
    "I": "h",
    "M": "m",
    "S": "s",
    "j": "D",
}

# %-d style (non-padded, glibc extension) → single-letter java pattern
_NONPADDED: dict[str, str] = {
    "d": "d",
    "m": "M",
    "H": "H",
    "I": "h",
    "M": "m",
    "S": "s",
    "j": "D",
}


def strptime_to_java(fmt: str, mode: str = "parse") -> str:
    """Translate a strptime pattern to a java.time pattern.

    ``mode="parse"`` mirrors strptime's leniency (single-letter numeric
    patterns accept non-zero-padded digits); ``mode="format"`` mirrors
    strftime's zero-padding.  Literal text is single-quoted where it could
    collide with java pattern letters; embedded quotes are escaped by
    doubling (java.time rules).
    """
    out: list[str] = []
    literal: list[str] = []

    def flush_literal() -> None:
        if not literal:
            return
        text = "".join(literal)
        if any(c.isalpha() or c == "'" for c in text):
            out.append("'" + text.replace("'", "''") + "'")
        else:
            out.append(text)
        literal.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            if i + 1 >= len(fmt):
                raise ValueError(f"dangling %% at end of strptime pattern: {fmt!r}")
            nxt = fmt[i + 1]
            if nxt == "%":
                literal.append("%")
                i += 2
                continue
            if nxt == "-":
                if i + 2 >= len(fmt) or fmt[i + 2] not in _NONPADDED:
                    raise ValueError(f"unsupported strptime directive %-{fmt[i+2:i+3]} in {fmt!r}")
                flush_literal()
                out.append(_NONPADDED[fmt[i + 2]])
                i += 3
                continue
            if nxt not in _DIRECTIVES:
                raise ValueError(f"unsupported strptime directive %{nxt} in {fmt!r}")
            flush_literal()
            if mode == "parse" and nxt in _PARSE_OVERRIDES:
                out.append(_PARSE_OVERRIDES[nxt])
            else:
                out.append(_DIRECTIVES[nxt])
            i += 2
        else:
            literal.append(ch)
            i += 1
    flush_literal()
    return "".join(out)
