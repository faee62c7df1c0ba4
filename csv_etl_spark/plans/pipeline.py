"""Pipeline runner — the reference's transform/validate lifecycle (V1-V5)
re-expressed for distributed execution.

Reference model (``dynamic.py:259-348``): interpret mapping per row, collect
``RowError`` objects + per-row log lines in driver memory, then write unless
``fail_on_error`` and any error occurred.

Scale redesign (SURVEY §2.8/§4): errors are DATA (a DataFrame), counters
come from one aggregation pass over the persisted transform output (the
fail-on-error gate needs the error count before writing anyway — the
reference buffers the whole output in RAM for the same reason; we persist
to executor storage instead).  Per-row log lines (V6) are deliberately NOT
replicated — at 100 TB that's a driver OOM; the errors DF + counters carry
the same information, and ``errors.limit(n)`` reproduces every UI view the
reference builds from its error list.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_etl_spark.compiler import ERRORS_COL, CompiledMapping, compile_mapping
from csv_etl_spark.specs import ETLMapping


@dataclass
class TransformResult:
    """Counts follow the reference exactly (``dynamic.py:26-29,304-318``):
    ``success_count`` = rows with zero errors, ``error_count`` = number of
    ERRORS (a row can contribute several), ``skipped_count`` = filtered rows
    (all rows when the mapping has no field_mappings — `{}` is falsy in the
    interpreter, dynamic.py:309)."""

    success_count: int = 0
    skipped_count: int = 0
    error_count: int = 0
    error_row_count: int = 0
    output: DataFrame | None = None  # destination fields only
    errors: DataFrame | None = None  # field, message, source_value [, _line]
    output_written: bool = False
    log_messages: list[str] = field(default_factory=list)

    def add_log(self, message: str) -> None:
        self.log_messages.append(message)


def run_mapping(
    df: DataFrame,
    mapping: ETLMapping | dict,
    line_col: str | None = None,
    with_errors: bool = True,
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Lazy: compile + apply, no action.  Use for composing with further
    Spark transformations.  ``tables`` resolves ``lookup_table`` fields."""
    source_columns = [c for c in df.columns if c != line_col]
    compiled = compile_mapping(mapping, source_columns)
    return compiled.apply(df, with_errors=with_errors, line_col=line_col, tables=tables)


def chain_mappings(
    df: DataFrame,
    mappings: list[ETLMapping | dict],
    with_errors: bool = True,
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Multi-step pipeline (extension; reference ROADMAP.md:52 plans
    "multi-step pipelines"): the destination fields of stage *i* are the
    source columns of stage *i+1* — each stage is the same compiled
    filter+project, so the whole chain stays one Catalyst plan (collapsed
    projections, pushed filters), not N materialized passes.

    ``_errors`` accumulates across stages: a row that survives every
    stage's filters carries the concatenation of all its field errors.
    A stage that aggregates ends error tracking (its output rows are no
    longer the input rows)."""
    cur = df
    for m in mappings:
        carry_errors = with_errors and ERRORS_COL in cur.columns
        source_columns = [c for c in cur.columns if c != ERRORS_COL]
        compiled = compile_mapping(m, source_columns)
        if carry_errors and not compiled.mapping.aggregations:
            cur = cur.withColumnRenamed(ERRORS_COL, "__prev_errors")
            out = compiled.apply(
                cur, with_errors=True, tables=tables, carry=["__prev_errors"]
            )
            cur = out.withColumn(
                ERRORS_COL, F.concat(F.col("__prev_errors"), F.col(ERRORS_COL))
            ).drop("__prev_errors")
        else:
            cur = compiled.apply(cur, with_errors=with_errors, tables=tables)
    return cur


def transform(
    df: DataFrame,
    mapping: ETLMapping | dict,
    output_path: str | None = None,
    fail_on_error: bool = True,
    dry_run: bool = False,
    line_col: str | None = None,
    write=None,
) -> TransformResult:
    """Reference ``transform_file``/``validate_file`` semantics
    (``dynamic.py:267-348``) over a DataFrame.

    ONE scan computes everything: the input-row total rides along as an
    ``observe`` metric on the source (collected as a side-effect of the
    counter aggregation over the persisted transform output), so the source
    is never scanned a second time just to count it — at 100 TB the old
    separate ``df.count()`` was a full extra pass.  ``write`` is an optional
    callable ``(DataFrame) -> None`` that replaces the default CSV write —
    lets callers target parquet/Delta without changing gate semantics.
    """
    from pyspark.sql import Observation

    result = TransformResult()
    if isinstance(mapping, dict):
        mapping = ETLMapping.from_dict(mapping)
    source_columns = [c for c in df.columns if c != line_col]
    compiled: CompiledMapping = compile_mapping(mapping, source_columns)

    mode = "Validating" if dry_run else "Transforming"
    result.add_log(f"{mode} with mapping: {mapping.name}")
    result.add_log(
        f"Field mappings: {len(mapping.field_mappings)}, Filter rules: {len(mapping.filter_rules)}"
    )

    # CollectMetrics sits UPSTREAM of the mapping's skip-filter, so it sees
    # every input row; it cannot be optimized away because the filter is
    # never a constant (rules always reference source columns).
    obs = Observation()
    projected = compiled.apply(
        df.observe(obs, F.count(F.lit(1)).alias("total")),
        with_errors=True,
        line_col=line_col,
    )
    projected = projected.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        agg = projected.agg(
            F.count(F.lit(1)).alias("kept"),
            F.coalesce(F.sum(F.size(F.col(ERRORS_COL))), F.lit(0)).alias("errors"),
            F.coalesce(
                F.sum(F.when(F.size(F.col(ERRORS_COL)) > 0, 1).otherwise(0)), F.lit(0)
            ).alias("error_rows"),
        ).collect()[0]
        kept, error_count, error_rows = agg["kept"], int(agg["errors"]), int(agg["error_rows"])
        total = int(obs.get["total"])

        if not mapping.field_mappings:
            # `{}` is falsy: every row counts as skipped, nothing is written
            result.skipped_count = total
            result.success_count = 0
        else:
            result.skipped_count = total - kept
            result.success_count = kept - error_rows
        result.error_count = error_count
        result.error_row_count = error_rows

        err_cols = [F.explode(F.col(ERRORS_COL)).alias("error")]
        if line_col and line_col in projected.columns:
            err_cols.insert(0, F.col(line_col))
        errors_df = projected.select(*err_cols).select(
            *([line_col] if line_col and line_col in projected.columns else []),
            F.col("error.field").alias("field"),
            F.col("error.message").alias("message"),
            F.col("error.source_value").alias("source_value"),
        )
        result.errors = errors_df
        output_df = projected.drop(ERRORS_COL, *( [line_col] if line_col else [] ))
        result.output = output_df

        # V5/S6: gate — write only when not dry-run, rows exist, and either
        # error-free or fail_on_error=False (dynamic.py:333-343)
        if not dry_run and (output_path or write) and mapping.field_mappings and kept > 0:
            if error_count > 0 and fail_on_error:
                result.add_log(
                    f"OUTPUT SKIPPED: {error_count} errors found. Fix errors before converting."
                )
            else:
                if write is not None:
                    write(output_df)
                else:
                    output_df.write.mode("overwrite").option("header", "true").csv(output_path)
                result.output_written = True
                result.add_log(f"Output written to {output_path or 'custom sink'}")

        status = "Validation" if dry_run else "Transformation"
        result.add_log(
            f"{status} complete: {result.success_count} valid, "
            f"{result.skipped_count} skipped, {result.error_count} errors"
        )
        return result
    finally:
        # Unpersist before returning: counters and the gated write all ran
        # against the cached data above.  Leaving it cached poisons later
        # reads — CacheManager matches on the PLAN, so re-reading a file
        # that was edited in between (the preview → fix-row → convert loop)
        # would silently serve the stale pre-edit rows.  result.errors /
        # result.output stay valid and recompute from source on access;
        # callers wanting them hot can persist them explicitly.
        projected.unpersist()


def validate(df: DataFrame, mapping: ETLMapping | dict, line_col: str | None = None) -> TransformResult:
    """V3: dry-run — full transform pass, metrics + errors, no write
    (reference ``validate_file``, dynamic.py:259-265)."""
    return transform(df, mapping, dry_run=True, line_col=line_col)


def errors_by_line(errors_df: DataFrame, line_col: str = "_line") -> DataFrame:
    """V4: ``{line: [errors…]}`` grouping for UI highlighting
    (reference ``app.py:560-567``)."""
    return errors_df.groupBy(line_col).agg(
        F.collect_list(F.struct("field", "message", "source_value")).alias("errors")
    )
