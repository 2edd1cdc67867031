from .io import read_table, write_table  # noqa: F401
