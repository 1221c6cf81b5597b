from mahout_samsara_book_spark.sources.tables import (
    TABLES,
    lineitem_drm,
    load_table,
)

__all__ = ["TABLES", "lineitem_drm", "load_table"]
