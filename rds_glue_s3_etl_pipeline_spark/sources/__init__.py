from .readers import read_json_records, read_parquet, read_csv, jdbc_reader  # noqa: F401
from .sinks import write_single_csv, write_parquet  # noqa: F401
