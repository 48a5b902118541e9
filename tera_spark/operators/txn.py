"""Single-row transactions: snapshot-isolated read-modify-write.

Reference: ``Table::StartRowTransaction`` (include/tera/table.h:102-104,
SDK src/sdk/single_row_txn.cc) gives the caller a snapshot of one row;
at commit the server rejects the write if the row changed since the
snapshot (``TabletWriter::CheckSingleRowTxnConflict``,
src/io/tablet_writer.h:62-64).

Spark-native re-expression: the snapshot is the row's max op sequence
number at txn start; commit re-reads it and refuses the mutation batch
if any later op on the row exists. The check + append must be driven
by a single writer per table (Spark jobs are single-driver, and the
catalog's append is one atomic job) — the same serialization point the
reference gets from the tablet server's writer thread.

Percolator-style cross-row transactions (src/sdk/global_txn.cc) remain
a documented non-goal (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tera_spark.operators.mutation import MutationBatch
from tera_spark.operators.scan import get
from tera_spark.registry import TableSchema


class RowTxnConflict(Exception):
    """Row changed between txn start and commit."""


class SingleRowTransaction:
    def __init__(
        self,
        cells: DataFrame,
        schema: TableSchema | None,
        row_key: str,
        *,
        now_us: int | None = None,
    ):
        self._cells = cells
        self._schema = schema
        self._row_key = row_key
        self._now_us = now_us
        self._snapshot_seq = self._row_max_seq(cells)
        self.batch = MutationBatch(base_seq=(self._snapshot_seq or 0) + 1)

    def _row_max_seq(self, cells: DataFrame) -> int | None:
        row = (
            cells.filter(F.col("row_key") == self._row_key)
            .agg(F.max("seq").alias("mx"))
            .collect()
        )
        return row[0].mx if row and row[0].mx is not None else None

    # --- reads inside the txn (snapshot-bounded) ----------------------
    def read(self, cf: str, qualifier: str) -> bytes | None:
        rows = get(
            self._cells,
            self._schema,
            self._row_key,
            columns={cf: [qualifier]},
            now_us=self._now_us,
        ).collect()
        return bytes(rows[0].value) if rows and rows[0].value is not None else None

    # --- writes accumulate on self.batch ------------------------------
    def put(self, cf: str, qualifier: str, value, ts: int | None = None):
        self.batch.put(self._row_key, cf, qualifier, value, ts=ts)
        return self

    def delete_column(self, cf: str, qualifier: str, ts: int | None = None):
        self.batch.delete_column(self._row_key, cf, qualifier, ts=ts)
        return self

    def commit(self, current_cells: DataFrame | None = None) -> DataFrame:
        """Conflict-check against the table's current state and return
        the mutation DataFrame to append. Raises RowTxnConflict if the
        row gained ops since the snapshot."""
        latest = self._row_max_seq(
            current_cells if current_cells is not None else self._cells
        )
        if latest != self._snapshot_seq:
            raise RowTxnConflict(
                f"row {self._row_key!r}: seq {self._snapshot_seq} -> {latest}"
            )
        return self.batch.to_df(self._cells.sparkSession, now_us=self._now_us)


def start_row_transaction(
    cells: DataFrame, schema: TableSchema | None, row_key: str, **kw
) -> SingleRowTransaction:
    """Table::StartRowTransaction analog."""
    return SingleRowTransaction(cells, schema, row_key, **kw)
