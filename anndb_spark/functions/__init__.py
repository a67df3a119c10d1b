from anndb_spark.functions.spaces import (  # noqa: F401
    SPACES,
    distance_col,
    distance_sql,
    pairwise_distances_udf,
)
