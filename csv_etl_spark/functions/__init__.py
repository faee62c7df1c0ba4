"""Scalar function library — Column builders mirroring the reference's
typed-path helpers (C1-C13 in SURVEY §2.4).  All pure built-in expressions:
JVM-side, codegen-able, no Python UDFs.
"""

from csv_etl_spark.functions.parsing import (
    detect_currency,
    parse_date_chain,
    parse_float,
    parse_money,
    parse_price,
)
from csv_etl_spark.functions.mapping import (
    map_crypto_symbol,
    map_stock_symbol,
    map_stock_type,
)
from csv_etl_spark.functions.formatting import format_number_trimmed

__all__ = [
    "parse_date_chain",
    "parse_float",
    "parse_price",
    "parse_money",
    "detect_currency",
    "map_stock_type",
    "map_stock_symbol",
    "map_crypto_symbol",
    "format_number_trimmed",
]
