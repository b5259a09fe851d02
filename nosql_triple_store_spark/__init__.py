"""PySpark-native analytics engine.

A Spark-first re-expression of the query & data-processing capabilities of the
reference NoSQL triple store (see SURVEY.md): a distributed LWW-register map
over timestamped keyed rows (reference: dbQueryConnector.py:4-63 — point scan,
keyed upsert, LWW merge, changelog extraction; MasterServer.py:59-87 — range
sharding/routing), generalized into a full relational / event-time / text /
vector / graph analytics surface.

Architecture: all operators are declarative DataFrame/SQL plans so Catalyst
supplies predicate pushdown, column pruning, partition pruning, join selection
(broadcast vs sort-merge via AQE), and whole-stage codegen. Python-side
execution (Pandas UDFs / mapInPandas) is reserved for semantics the built-in
operators cannot express (multimodal byte decoding).
"""

__version__ = "0.1.0"

from .registry import all_specs, oracle_sql, queries, register  # noqa: F401
from .session import get_spark  # noqa: F401
