from csv_etl_spark.sources.csv_source import read_spec_csv, with_line_numbers
from csv_etl_spark.sources.sinks import template_dataframe, write_spec_csv
from csv_etl_spark.sources.tables import load_events, load_table

__all__ = [
    "read_spec_csv",
    "with_line_numbers",
    "write_spec_csv",
    "template_dataframe",
    "load_table",
    "load_events",
]
