from .io import FORMATS, read_files, write_files
from .tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "FORMATS",
    "TABLES",
    "load_table",
    "load_tables",
    "read_files",
    "register_views",
    "write_files",
]
