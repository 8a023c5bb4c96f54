"""DuckDB oracle SQL for every oracle-checkable query (driver contract).

Each string is ANSI SQL runnable by DuckDB over the pre-registered testdata
views (region nation customer supplier part orders lineitem events documents
embeddings). The WITH-clause mapping fragments in ``mappings`` mirror
``catalog.py`` exactly — any change must land in both places.
"""

from .mappings import (
    DIM_DATES_SQL,
    DIM_PRODUCTS_SQL,
    REF_ORDERS_SQL,
    REF_REVIEWS_SQL,
    REF_SHIPMENTS_SQL,
    TRIPDATA_SQL,
)

__all__ = [
    "DIM_DATES_SQL",
    "DIM_PRODUCTS_SQL",
    "REF_ORDERS_SQL",
    "REF_REVIEWS_SQL",
    "REF_SHIPMENTS_SQL",
    "TRIPDATA_SQL",
]
