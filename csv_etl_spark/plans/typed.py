"""Typed-path pipelines: Revolut stocks / crypto → Ghostfolio.

The reference implements these as per-row dataclass transformers
(``transformers/revolut_stocks.py:38-61``, ``revolut_crypto.py:68-97``).
Here each is ONE declarative filter+select over an all-string DataFrame —
the entire pipeline (filters F8-F11, functions C1-C13) is a single
WholeStageCodegen stage with no shuffle at all: it scales linearly with
input splits on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from csv_etl_spark.functions.formatting import format_number_trimmed
from csv_etl_spark.functions.mapping import (
    CRYPTO_SKIP_TYPES,
    CRYPTO_TYPE_MAP,
    STOCKS_SKIP_TYPES,
    map_crypto_symbol,
    map_stock_symbol,
    map_stock_type,
)
from csv_etl_spark.functions.parsing import (
    CRYPTO_DATE_FORMATS,
    STOCKS_DATE_FORMATS,
    detect_currency,
    parse_date_chain,
    parse_float,
    parse_money,
    parse_price,
)

# Ghostfolio CSV column order — reference models/ghostfolio.py:53-66
GHOSTFOLIO_FIELDS = [
    "date", "symbol", "type", "quantity", "unitPrice", "fee", "currency", "account", "dataSource",
]


def revolut_stocks_plan(df: DataFrame, account_name: str = "Revolut Stocks") -> DataFrame:
    """Input columns (reference models/revolut_stocks.py:6-16, all string):
    Date, Ticker, Type, Quantity, ``Price per share``, ``Total Amount``,
    Currency.  Mirrors reference ``RevolutStocksTransformer.transform``
    (revolut_stocks.py:38-61) incl. the extractor's strip + USD default
    (extractors/revolut_stocks.py:20-26)."""
    # S4: extractor strips whitespace; empty currency defaults to USD
    date = F.trim(F.coalesce(F.col("Date"), F.lit("")))
    ticker = F.trim(F.coalesce(F.col("Ticker"), F.lit("")))
    type_col = F.trim(F.coalesce(F.col("Type"), F.lit("")))
    quantity = F.trim(F.coalesce(F.col("Quantity"), F.lit("")))
    price = F.trim(F.coalesce(F.col("`Price per share`"), F.lit("")))
    currency_raw = F.trim(F.coalesce(F.col("Currency"), F.lit("")))
    currency = F.when(currency_raw == "", F.lit("USD")).otherwise(currency_raw)

    type_upper = F.upper(type_col)  # C10
    gf_type = map_stock_type(type_upper)  # C7

    out = (
        df.filter(~type_upper.isin(STOCKS_SKIP_TYPES))  # F8
        .filter(gf_type.isNotNull())  # F9 (unmappable type → drop)
        .filter(ticker != "")  # F10
        .select(
            parse_date_chain(date, STOCKS_DATE_FORMATS).alias("date"),  # C1
            map_stock_symbol(ticker, currency).alias("symbol"),  # C8
            gf_type.alias("type"),
            parse_float(quantity).alias("quantity"),  # C3
            parse_price(price).alias("unitPrice"),  # C4
            F.lit(0.0).alias("fee"),
            currency.alias("currency"),
            F.lit(account_name).alias("account"),
            F.lit("").alias("dataSource"),  # C13: typed path omits when empty; we emit "" (documented divergence)
        )
    )
    return out


def revolut_crypto_plan(df: DataFrame, account_name: str = "Revolut Crypto") -> DataFrame:
    """Input columns (reference models/revolut_crypto.py:6-16, all string):
    Symbol, Type, Quantity, Price, Value, Fees, Date.  Mirrors reference
    ``RevolutCryptoTransformer.transform`` (revolut_crypto.py:68-97)."""
    symbol = F.trim(F.coalesce(F.col("Symbol"), F.lit("")))
    type_col = F.trim(F.coalesce(F.col("Type"), F.lit("")))
    quantity = F.trim(F.coalesce(F.col("Quantity"), F.lit("")))
    price = F.trim(F.coalesce(F.col("Price"), F.lit("")))
    value = F.trim(F.coalesce(F.col("Value"), F.lit("")))
    fees = F.trim(F.coalesce(F.col("Fees"), F.lit("")))
    date = F.trim(F.coalesce(F.col("Date"), F.lit("")))

    type_upper = F.upper(type_col)
    symbol_upper = F.upper(symbol)
    # `source.price or source.value`: empty price falls back to value (C6)
    price_or_value = F.when(price == "", value).otherwise(price)
    gf_type = F.when(type_upper == "BUY", F.lit(CRYPTO_TYPE_MAP["BUY"])).when(
        type_upper == "SELL", F.lit(CRYPTO_TYPE_MAP["SELL"])
    )

    out = (
        df.filter(~type_upper.isin(CRYPTO_SKIP_TYPES))  # F11
        .filter(gf_type.isNotNull())  # F9
        .filter(symbol != "")  # F10
        .select(
            parse_date_chain(date, CRYPTO_DATE_FORMATS).alias("date"),  # C2
            map_crypto_symbol(symbol_upper).alias("symbol"),  # C9
            gf_type.alias("type"),
            parse_float(quantity).alias("quantity"),  # C3
            parse_money(price).alias("unitPrice"),  # C5
            parse_money(fees).alias("fee"),  # C5
            detect_currency(price_or_value).alias("currency"),  # C6
            F.lit(account_name).alias("account"),
            F.lit("YAHOO").alias("dataSource"),
        )
    )
    return out


def format_ghostfolio_for_csv(df: DataFrame) -> DataFrame:
    """Apply C11 number formatting (``%.8f`` trim) to the numeric fields and
    fix column order for golden-file CSV parity."""
    return df.select(
        "date",
        "symbol",
        "type",
        format_number_trimmed(F.col("quantity")).alias("quantity"),
        format_number_trimmed(F.col("unitPrice")).alias("unitPrice"),
        format_number_trimmed(F.col("fee")).alias("fee"),
        "currency",
        "account",
        "dataSource",
    )
