from csv_etl_spark.plans.pipeline import (
    TransformResult,
    chain_mappings,
    errors_by_line,
    run_mapping,
    transform,
    validate,
)
from csv_etl_spark.plans.typed import revolut_crypto_plan, revolut_stocks_plan

__all__ = [
    "run_mapping",
    "chain_mappings",
    "transform",
    "validate",
    "errors_by_line",
    "TransformResult",
    "revolut_stocks_plan",
    "revolut_crypto_plan",
]
