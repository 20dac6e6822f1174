from censo_escolar_spark.sources.readers import (
    load_csv_with_schema,
    load_json_sidecar,
    load_schema_sidecar,
    load_table,
    register_views,
)
from censo_escolar_spark.sources.writers import (
    write_partitioned_parquet,
    write_single_file,
)

__all__ = [
    "load_csv_with_schema",
    "load_json_sidecar",
    "load_schema_sidecar",
    "load_table",
    "register_views",
    "write_partitioned_parquet",
    "write_single_file",
]
