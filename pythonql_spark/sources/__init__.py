from pythonql_spark.sources.catalog import (
    TABLES,
    from_collection,
    jdbc_catalog,
    jdbc_table,
    load_sf,
    load_table,
    read_files,
    write_bucketed,
    write_zordered,
    zorder_expr,
    write_compacted,
    write_partitioned,
    write_range_sorted,
)

__all__ = ["TABLES", "from_collection", "jdbc_catalog", "jdbc_table", "load_sf",
           "load_table", "read_files", "write_bucketed",
           "write_compacted", "write_partitioned", "write_range_sorted",
           "write_zordered", "zorder_expr"]
