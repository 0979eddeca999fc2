from .catalog import TABLES, load, load_all  # noqa: F401
