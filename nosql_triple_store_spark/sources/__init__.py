"""Source/sink layer: bulk loads, sharded writes, external connectors."""

from .readers import (  # noqa: F401
    read_jdbc_table,
    read_mongo_collection,
    read_triples_tsv,
    write_predicate_partitioned,
    write_range_sharded,
)
