"""Batch ≡ streaming under fuzzing: random mappings (reusing the mapping
fuzzer's strategies) run through the SAME compiled plan as a batch job and
as an availableNow stream — output multisets must match.  This is the
'compile once, run anywhere' claim tested broadly, not on one example."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_etl_spark.compiler import ERRORS_COL, compile_mapping

from tests.test_mapping_fuzz import COLS, mapping_st, row

_COUNTER = {"n": 0}


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(mapping_st, st.lists(row, min_size=1, max_size=8))
def test_stream_matches_batch_for_random_mappings(spark, tmp_path_factory, mapping, rows):
    _COUNTER["n"] += 1
    d = tmp_path_factory.mktemp(f"sfuzz{_COUNTER['n']}")
    src = str(d / "in")
    df = spark.createDataFrame([tuple(r) for r in rows], COLS)
    df.coalesce(2).write.parquet(src)

    compiled = compile_mapping(mapping, COLS)
    batch_out = compiled.apply(spark.read.parquet(src), with_errors=True)

    schema = ", ".join(f"{c} string" for c in COLS)
    stream = spark.readStream.schema(schema).parquet(src)
    name = f"sfuzz_q{_COUNTER['n']}"
    q = (
        compiled.apply(stream, with_errors=True)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    stream_out = spark.sql(f"SELECT * FROM {name}")

    def canon(frame):
        out = []
        for r in frame.collect():
            dd = r.asDict(recursive=True)
            errs = tuple(sorted(e["field"] for e in dd.pop(ERRORS_COL)))
            out.append((tuple(sorted((k, str(v)) for k, v in dd.items())), errs))
        return Counter(out)

    assert canon(batch_out) == canon(stream_out), f"mapping={mapping}"
