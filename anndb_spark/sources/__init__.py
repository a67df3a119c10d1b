from anndb_spark.sources.tables import (  # noqa: F401
    TABLES,
    lineitem_vec,
    lineitem_vec_components,
    load_tables,
    register_views,
    to_dialect,
)
