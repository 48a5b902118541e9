"""tera_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of BaiduPS/tera (BigTable-style versioned
cell store), rebuilt Spark-first.

The reference (read-only at /root/reference) is a C++ tablet-server
stack; this package re-expresses its *semantics* — the versioned cell
map, tombstones, merge-on-read atomic ops, typed filters, scans,
observers — as composable DataFrame transforms, and supplies the full
relational layer (joins/aggs/windows/sorts) via Spark SQL, which the
reference delegates to MySQL (see SURVEY.md §2.4).
"""

from tera_spark.access import AccessControl
from tera_spark.catalog import Catalog
from tera_spark.client import Client, KvTable, Table
from tera_spark.model import CellOp, CELL_SCHEMA, KV_SCHEMA
from tera_spark.operators.vector_index import VectorIndex
from tera_spark.registry import ColumnFamilySchema, LocalityGroupSchema, TableSchema
from tera_spark.session import get_spark

__all__ = [
    "AccessControl",
    "Catalog",
    "Client",
    "KvTable",
    "Table",
    "CellOp",
    "CELL_SCHEMA",
    "KV_SCHEMA",
    "ColumnFamilySchema",
    "LocalityGroupSchema",
    "TableSchema",
    "VectorIndex",
    "get_spark",
]

__version__ = "0.1.0"
