from .inspect import explain_str, has_broadcast_join, pushed_filters, scan_columns  # noqa: F401
