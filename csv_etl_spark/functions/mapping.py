"""Symbol/type mapping functions (C7-C10) — literal broadcast tables as
chained ``when`` expressions.  Tables are ≤40 entries (reference
``revolut_crypto.py:21-61``), so inlining into the plan is strictly better
than a join: zero shuffle, constant-folded, codegen'd.  If a lookup table
ever outgrew literal size, the same call sites would switch to
``df.join(broadcast(table_df))``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference transformers/revolut_stocks.py:13-19
STOCKS_TYPE_MAP = {
    "BUY - MARKET": "BUY",
    "BUY - LIMIT": "BUY",
    "SELL - MARKET": "SELL",
    "SELL - LIMIT": "SELL",
    "DIVIDEND": "DIVIDEND",
}

# reference transformers/revolut_stocks.py:21
STOCKS_SKIP_TYPES = ["CASH TOP-UP", "CASH WITHDRAWAL", "CUSTODY FEE", "STOCK SPLIT"]

# reference transformers/revolut_stocks.py:24-28
CURRENCY_TO_SUFFIX = {"EUR": ".DE", "GBP": ".L", "GBX": ".L"}

# reference transformers/revolut_stocks.py:31-33
STOCKS_SYMBOL_MAP = {"4P41": "P911.DE"}

# reference transformers/revolut_crypto.py:13-18
CRYPTO_TYPE_MAP = {"BUY": "BUY", "SELL": "SELL"}
CRYPTO_SKIP_TYPES = ["PAYMENT", "STAKE", "UNSTAKE", "SEND", "RECEIVE"]

# reference transformers/revolut_crypto.py:21-61 (39 entries; default for
# unknowns is f"{sym}-USD", which the table values all coincide with)
CRYPTO_SYMBOL_MAP = {
    s: f"{s}-USD"
    for s in [
        "BTC", "ETH", "DOGE", "SHIB", "XRP", "DOT", "ADA", "SOL", "MATIC", "LINK",
        "UNI", "AVAX", "ATOM", "LTC", "XLM", "ALGO", "VET", "FIL", "AAVE", "GRT",
        "SAND", "MANA", "AXS", "ENJ", "CHZ", "GALA", "PEPE", "SPELL", "SUSHI",
        "ANKR", "SKL", "ACH", "AMP", "OGN", "REN", "CTSI", "FIDA", "BLZ", "XCN",
    ]
}


def _when_chain(col: Column, table: dict[str, str], otherwise: Column) -> Column:
    expr = None
    for k, v in table.items():
        clause = col.eqNullSafe(F.lit(k))
        expr = F.when(clause, F.lit(v)) if expr is None else expr.when(clause, F.lit(v))
    return otherwise if expr is None else expr.otherwise(otherwise)


def map_stock_type(type_col: Column) -> Column:
    """C7 — exact map on UPPER(type), else prefix fallback BUY*/SELL*, else
    null (row to be dropped) — reference ``revolut_stocks.py:77-84``.
    Expects an already-uppercased column (C10 applied by caller)."""
    exact = _when_chain(type_col, STOCKS_TYPE_MAP, F.lit(None).cast("string"))
    return F.coalesce(
        exact,
        F.when(type_col.startswith("BUY"), F.lit("BUY")),
        F.when(type_col.startswith("SELL"), F.lit("SELL")),
    )


def map_stock_symbol(ticker: Column, currency: Column) -> Column:
    """C8 — override table first; USD → bare ticker; else append the
    currency's exchange suffix unless already present
    — reference ``revolut_stocks.py:63-75``."""
    suffix = _when_chain(currency, CURRENCY_TO_SUFFIX, F.lit(""))
    suffixed = F.when(
        (suffix != "") & ~ticker.endswith(suffix), F.concat(ticker, suffix)
    ).otherwise(ticker)
    plain = F.when(currency.eqNullSafe(F.lit("USD")), ticker).otherwise(suffixed)
    return _when_chain(ticker, STOCKS_SYMBOL_MAP, plain)


def map_crypto_symbol(symbol: Column) -> Column:
    """C9 — 39-entry table with default ``{SYM}-USD`` (table and default
    coincide; the coalesce keeps table fidelity if entries ever diverge)
    — reference ``revolut_crypto.py:85``.  Expects uppercased input."""
    table = _when_chain(symbol, CRYPTO_SYMBOL_MAP, F.lit(None).cast("string"))
    return F.coalesce(table, F.concat(symbol, F.lit("-USD")))
