from .edgar_index import (
    INDEX_COLUMNS,
    load_index,
    resolve_seeds,
    select_filings,
    write_synthetic_index,
)

__all__ = [
    "INDEX_COLUMNS",
    "load_index",
    "resolve_seeds",
    "select_filings",
    "write_synthetic_index",
]
