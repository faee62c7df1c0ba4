from datetime import datetime

import pytest

from csv_etl_spark.datefmt import strptime_to_java


@pytest.mark.parametrize(
    "fmt,expected",
    [
        ("%Y-%m-%d", "yyyy-MM-dd"),
        ("%Y-%m-%dT%H:%M:%S", "yyyy-MM-dd'T'HH:mm:ss"),
        ("%Y-%m-%dT%H:%M:%S.%fZ", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        ("%b %d, %Y, %I:%M:%S %p", "MMM dd, yyyy, hh:mm:ss a"),
        ("%B %d, %Y, %I:%M:%S %p", "MMMM dd, yyyy, hh:mm:ss a"),
        ("%d/%m/%Y", "dd/MM/yyyy"),
        ("%Y%m%d", "yyyyMMdd"),
        ("100%% %Y", "100% yyyy"),
        ("%-d.%-m.%Y", "d.M.yyyy"),
    ],
)
def test_translation_format_mode(fmt, expected):
    assert strptime_to_java(fmt, mode="format") == expected


@pytest.mark.parametrize(
    "fmt,expected",
    [
        ("%Y-%m-%d", "yyyy-M-d"),
        ("%b %d, %Y, %I:%M:%S %p", "MMM d, yyyy, h:m:s a"),
        ("%Y-%m-%dT%H:%M:%S", "yyyy-M-d'T'H:m:s"),
    ],
)
def test_translation_parse_mode(fmt, expected):
    assert strptime_to_java(fmt, mode="parse") == expected


def test_literal_letters_are_quoted():
    assert strptime_to_java("%Y at %H", mode="format") == "yyyy' at 'HH"


def test_unsupported_directive_raises():
    with pytest.raises(ValueError):
        strptime_to_java("%Q")
    with pytest.raises(ValueError):
        strptime_to_java("trailing %")


def test_roundtrip_parse_against_spark(spark):
    """Patterns translated from strptime parse the same instants in Spark
    that strptime parses in Python."""
    from pyspark.sql import functions as F

    cases = [
        ("2024-01-15T10:30:00", "%Y-%m-%dT%H:%M:%S"),
        ("2024-01-15", "%Y-%m-%d"),
        ("15/03/2024", "%d/%m/%Y"),
        ("Feb 3, 2020, 9:18:39 AM", "%b %d, %Y, %I:%M:%S %p"),
        ("February 3, 2020, 9:18:39 PM", "%B %d, %Y, %I:%M:%S %p"),
    ]
    df = spark.createDataFrame([(v, f) for v, f in cases], ["value", "fmt"])
    for value, fmt in cases:
        java = strptime_to_java(fmt)
        got = (
            df.filter(F.col("value") == value)
            .select(F.date_format(F.try_to_timestamp("value", F.lit(java)), "yyyy-MM-dd HH:mm:ss").alias("ts"))
            .collect()[0]["ts"]
        )
        expected = datetime.strptime(value, fmt).strftime("%Y-%m-%d %H:%M:%S")
        assert got == expected, (value, fmt, java)
