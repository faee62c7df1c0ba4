from csv_etl_spark.sources.csv_source import read_spec_csv, with_line_numbers
from csv_etl_spark.sources.sinks import template_dataframe, write_spec_csv

__all__ = ["read_spec_csv", "with_line_numbers", "write_spec_csv", "template_dataframe"]
