from energydatalake_spark.io.readers import read_csv_folder, read_table, folder_has_files
from energydatalake_spark.io.writers import append_table, overwrite_table, write_csv
from energydatalake_spark.io.archive import archive_folder

__all__ = [
    "read_csv_folder",
    "read_table",
    "folder_has_files",
    "append_table",
    "overwrite_table",
    "write_csv",
    "archive_folder",
]
