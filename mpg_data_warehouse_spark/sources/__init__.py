"""Sources & sinks: schema-on-write readers, append/overwrite writers,
catalog helpers, and the testdata loader used by the driver contract."""

from mpg_data_warehouse_spark.sources.readers import (
    load_testdata,
    read_csv,
    read_table,
)
from mpg_data_warehouse_spark.sources.writers import (
    backup_csv,
    write_append,
    write_overwrite,
)

__all__ = [
    "load_testdata",
    "read_csv",
    "read_table",
    "backup_csv",
    "write_append",
    "write_overwrite",
]
