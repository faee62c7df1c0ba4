"""as-of join, range join, point row-update (S9), template generation (S7),
errors-by-line (V4)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from csv_etl_spark.operators.joins import asof_join, range_join_buckets
from csv_etl_spark.plans import transform, errors_by_line
from csv_etl_spark.sources.csv_source import LINE_COL, read_spec_csv, with_line_numbers
from csv_etl_spark.sources.edits import update_csv_row
from csv_etl_spark.sources.sinks import template_dataframe
from csv_etl_spark.specs import ColumnSpec, ColumnType, FileSpec


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts("2024-01-01 10:00:00")),
         (2, "u1", ts("2024-01-01 12:00:00")),
         (3, "u2", ts("2024-01-01 09:00:00"))],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [(100, "u1", ts("2024-01-01 09:30:00")),
         (101, "u1", ts("2024-01-01 11:00:00")),
         (102, "u2", ts("2024-01-01 09:00:00"))],  # exact tie: counts (>=)
        "rid long, k string, t timestamp",
    )
    out = {r["id"]: r["asof_rid"] for r in
           asof_join(left, right, on="k", left_time="t", right_time="t",
                     right_values=["rid"]).collect()}
    assert out == {1: 100, 2: 101, 3: 102}


def test_asof_join_tolerance_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts("2024-01-01 10:00:00")), (2, "u3", ts("2024-01-01 10:00:00"))],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [(100, "u1", ts("2024-01-01 06:00:00"))], "rid long, k string, t timestamp"
    )
    no_tol = {r["id"]: r["asof_rid"] for r in
              asof_join(left, right, "k", "t", "t", ["rid"]).collect()}
    assert no_tol == {1: 100, 2: None}  # u3 has no right rows at all
    with_tol = {r["id"]: r["asof_rid"] for r in
                asof_join(left, right, "k", "t", "t", ["rid"], tolerance="1 HOUR").collect()}
    assert with_tol == {1: None, 2: None}  # 4h-old match exceeds 1h tolerance


def test_range_join(spark):
    facts = spark.createDataFrame([(1, 3.0), (2, 7.5), (3, 50.0), (4, -1.0)], ["id", "v"])
    buckets = spark.createDataFrame(
        [(0.0, 5.0, "low"), (5.0, 20.0, "mid"), (20.0, 100.0, "high")], ["lo", "hi", "label"]
    )
    out = {r["id"]: r["label"] for r in range_join_buckets(facts, buckets, "v").collect()}
    assert out == {1: "low", 2: "mid", 3: "high", 4: None}


def test_update_csv_row(spark, tmp_path):
    p = tmp_path / "f.csv"
    p.write_text("a,b\n1,x\n2,y\n3,z\n")
    update_csv_row(spark, str(p), line_number=3, new_values={"b": "EDITED"})
    content = p.read_text()
    assert content.splitlines() == ["a,b", "1,x", "2,EDITED", "3,z"]


def test_template_dataframe(spark):
    spec = FileSpec(
        id="t", name="t",
        columns=[ColumnSpec("name"), ColumnSpec("n", ColumnType.INTEGER),
                 ColumnSpec("price", ColumnType.MONEY), ColumnSpec("when", ColumnType.DATETIME)],
    )
    row = template_dataframe(spark, spec).collect()[0]
    assert row["name"] == "example_name"
    assert row["n"] == "123"
    assert row["price"] == "99.99"
    assert row["when"] == "2024-01-15T10:30:00"


def test_errors_by_line_v4(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "f.csv").write_text("Date,Type\nbad,BUY\nalso-bad,NOPE\n2024-01-15T00:00:00,BUY\n")
    mapping = {
        "id": "m", "name": "m", "filter_rules": [],
        "field_mappings": [
            {"destination_field": "date", "source_field": "Date", "transform_type": "date_format",
             "transform_config": {"input_format": "%Y-%m-%dT%H:%M:%S", "output_format": "%Y-%m-%d"}},
            {"destination_field": "type", "source_field": "Type", "transform_type": "lookup",
             "transform_config": {"BUY": "BUY", "_default": None}},
        ],
    }
    df = with_line_numbers(read_spec_csv(spark, str(d)))
    result = transform(df, mapping, dry_run=True, line_col=LINE_COL)
    grouped = {r[LINE_COL]: sorted(e["field"] for e in r["errors"])
               for r in errors_by_line(result.errors).collect()}
    assert grouped == {2: ["date"], 3: ["date", "type"]}


# ---------------------------------------------------------------------------
# fuzzy_string_join (round 8)
# ---------------------------------------------------------------------------


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _naive_fuzzy(lrows, rrows, d):
    return {
        (li, ri, lv, rv, _lev(lv, rv))
        for li, lv in lrows
        for ri, rv in rrows
        if _lev(lv, rv) <= d
    }


def test_fuzzy_string_join_matches_naive(spark):
    """Blocking must be SOUND: every pair the naive cross-join-with-
    levenshtein finds must come out, nothing else."""
    from csv_etl_spark.operators.joins import fuzzy_string_join

    lrows = [
        (1, "abcdef"), (2, "zzzzzz"), (3, "abcdeg"), (4, "kitten"),
        (5, "a"), (6, ""), (7, "ab"),
    ]
    rrows = [
        (10, "abcdef"),   # exact
        (11, "abcdxf"),   # sub mid
        (12, "abcdefg"),  # insert at end
        (13, "bcdef"),    # delete at front (position shift)
        (14, "sitten"),   # kitten d=1
        (15, "b"), (16, ""), (17, "abc"),
        (18, "totally-different"),
    ]
    left = spark.createDataFrame(lrows, ["lid", "s"])
    right = spark.createDataFrame(rrows, ["rid", "t"])
    for d in (0, 1, 2):
        got = {
            (r["lid"], r["rid"], r["left_val"], r["right_val"], r["dist"])
            for r in fuzzy_string_join(
                left, right, "s", "t", "lid", "rid", max_dist=d
            ).collect()
        }
        assert got == _naive_fuzzy(lrows, rrows, d), d


def test_fuzzy_string_join_shared_template_worst_case(spark):
    """The documented hot-segment worst case (uniform prefix) still
    produces exactly the naive result — degraded cost, same answer."""
    from csv_etl_spark.operators.joins import fuzzy_string_join

    lrows = [(i, f"Customer#{i:04d}") for i in range(30)]
    rrows = [(100 + i, f"Customer#{i:04d}"[:-1] + "X") for i in range(30)]
    left = spark.createDataFrame(lrows, ["lid", "s"])
    right = spark.createDataFrame(rrows, ["rid", "t"])
    got = {
        (r["lid"], r["rid"], r["dist"])
        for r in fuzzy_string_join(
            left, right, "s", "t", "lid", "rid", max_dist=1
        ).collect()
    }
    exp = {(li, ri, _lev(lv, rv))
           for li, lv, ri, rv in (
               (li, lv, ri, rv) for li, lv in lrows for ri, rv in rrows)
           if _lev(lv, rv) <= 1}
    assert got == exp
    # every planted (i, 100+i) pair found: last digit -> X is distance 1
    # EXCEPT ids whose last digit already... X never collides with digits
    assert all((i, 100 + i, 1) in got for i in range(30))


def test_fuzzy_string_join_fuzz(spark):
    """Random corpora across alphabets/lengths vs the naive reference."""
    import random

    from csv_etl_spark.operators.joins import fuzzy_string_join

    rng = random.Random(8)
    for trial in range(3):
        alpha = "ab" if trial == 0 else "abcde"
        lrows = [
            (i, "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 9))))
            for i in range(25)
        ]
        rrows = [
            (i, "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 9))))
            for i in range(25)
        ]
        d = rng.choice([1, 2])
        left = spark.createDataFrame(lrows, ["lid", "s"])
        right = spark.createDataFrame(rrows, ["rid", "t"])
        got = {
            (r["lid"], r["rid"], r["left_val"], r["right_val"], r["dist"])
            for r in fuzzy_string_join(
                left, right, "s", "t", "lid", "rid", max_dist=d
            ).collect()
        }
        assert got == _naive_fuzzy(lrows, rrows, d), (trial, d)
