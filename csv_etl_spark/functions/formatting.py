"""Output formatting (C11-C13).

C11 is load-bearing for golden-file parity: the reference renders every
number as ``f"{v:.8f}"`` with trailing zeros and a trailing dot stripped
(``models/ghostfolio.py:48-51``) — ``0.5`` → ``"0.5"``, ``3.0`` → ``"3"``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_number_trimmed(col: Column) -> Column:
    """C11 — ``f"{v:.8f}"`` then strip trailing zeros then a trailing dot.

    ``format_number`` adds thousands separators, which Python's ``:.8f``
    does not — so use ``format_string('%.8f', ...)`` (JVM printf, matches
    Python's half-even rounding for doubles since both go through IEEE-754
    formatting of the rounded value).
    """
    fixed = F.format_string("%.8f", col.cast("double"))
    no_zeros = F.regexp_replace(fixed, "0+$", "")
    return F.regexp_replace(no_zeros, r"\.$", "")
