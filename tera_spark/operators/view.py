"""Current-view builder: op-log cells → visible cells.

This is the Spark re-expression of the reference's merge-on-read scan
path (`TabletIO::LowLevelScan` src/io/tablet_io.cc:939-1137 +
`DefaultCompactStrategy::ScanDrop` src/io/default_compact_strategy.cc:275-402
+ `AtomicMergeStrategy` src/io/atomic_merge_strategy.cc:59-109).

Semantics implemented, in order:

1. Illegal-CF drop — cells whose cf is not in the table schema vanish
   (ScanDrop → DropIllegalColumnFamily; row-delete marks exempt).
2. TTL — data ops (PUT/atomics) older than now - cf.ttl vanish
   (DropByLifeTime); delete marks never expire.
3. Tombstone masking, hierarchical and ts-inclusive: DEL_ROW masks the
   row, DEL_FAMILY masks (row, cf), DEL_QUALIFIERS masks
   (row, cf, qualifier), each masking every entry with ts <= mark.ts
   (the reference's `del_*_ts_ >= ts` checks). The mask of a masked
   mark is subsumed by its masker, so `max(mark ts)` per granularity
   is exact — no cascade needed.
4. DEL_QUALIFIER (single-version delete): the mark deletes the next
   surviving entry in (ts desc, op asc, seq desc) order. In the
   reference this is `last_type_ == TKT_DEL_QUALIFIER → skip`; since
   `last_type_` is updated for every surviving same-qualifier entry,
   "previous surviving entry is a mark" (a pure lag) is exact,
   including chained marks. A deleted PUT still counts against
   max_versions (ScanDrop increments version_num_ on the skip).
5. Atomic merge-on-read: only the *leading* run of atomic ops in a
   qualifier merges (any atomic op older than a PUT is dropped —
   "IsAtomicOP && has_put_"). The run plus the immediately following
   PUT (merge base, `merge_put_flag`) folds into ONE cell at the
   newest ts: ADD = big-endian int64 sum, ADDINT64 = little-endian
   sum, APPEND = ts-ascending concat, PUT_IFABSENT = oldest wins.
   Consecutive same-ts atomic entries dedupe (`ts != last_ts_atomic`);
   ops of a different atomic kind inside the run are consumed but
   ignored (AtomicMergeStrategy::MergeStep's type checks). The merged
   cell is version 1.
6. max_versions per cf: newest K visible versions survive.

Documented divergence: when max_versions > 1 the reference can emit a
*raw* atomic delta as an extra version (its merge only fires on the
first entry of a qualifier and ScanDrop lets orphan atomics through
when no newer PUT exists). We define the cleaner semantics — atomic
ops below the head run are never visible raw — and pin it in tests.

Plan shape: ONE full-size hash shuffle total, and NO cell-level sort.
A single hash aggregation on (row_key, cf, qualifier) collects each
column's ops and its qualifier-level delete maxima; row/cf-level
masks arrive by LEFT JOIN of two tiny mark aggregates (delete marks
are rare by construction, so AQE broadcasts them — zero extra
exchanges, zero sorts; mass-delete pathologies degrade to a keyed
join). Masking filters the collected arrays. All sequential
per-qualifier logic runs JVM-side over those arrays via higher-order
functions; no Python UDFs. PUT-only and pure-counter op mixes route
to cheaper specialized folds (put_only / counter_only below). This
is the property set that keeps the view viable at 100 TB.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tera_spark.functions.codecs import (
    be_i64_decode,
    be_i64_encode,
    le_i64_decode,
    le_i64_encode,
)
from tera_spark.model import CellOp
from tera_spark.registry import TableSchema

_ENTRY_T = "array<struct<ts:bigint,value:binary>>"


def _is_atomic(op: Column) -> Column:
    return op.isin(*CellOp.ATOMIC)


def _cf_prop_map(schema: TableSchema | None, prop: str, default: int) -> Column:
    if schema is None or not schema.column_families:
        return F.lit(None).cast("map<string,int>")
    pairs = []
    for cf in schema.column_families.values():
        pairs += [F.lit(cf.name), F.lit(int(getattr(cf, prop)))]
    return F.create_map(*pairs)


def current_view(
    cells: DataFrame,
    schema: TableSchema | None = None,
    *,
    now_us: int | None = None,
    default_max_versions: int = 1,
    snapshot_seq: int | None = None,
    put_only: bool = False,
    counter_only: int | None = None,
    no_atomics: bool = False,
) -> DataFrame:
    """Fold an op-log cell DataFrame into the visible-cell view.

    Columns in: row_key, cf, qualifier, ts, op (int code), value
    [, seq]. Columns out: row_key, cf, qualifier, ts, value.

    ``snapshot_seq`` reads the table as of a write sequence (reference:
    snapshot reads, SnapshotIDToSeq src/io/tablet_io.cc:698-706).

    ``put_only=True`` is a caller PROMISE that the op-log contains
    only PUT ops (no tombstones, no atomic merges) — the dominant
    case (tera defaults to maxversions=1 tables written by plain
    Puts; the reference's compact strategy likewise short-circuits
    when no merge/delete records exist). The fold then skips the
    delete-mask/merge machinery: maxversions=1 collapses to one
    map-side-partial ``max_by`` hash aggregation (no arrays, no
    windows); K>1 keeps the collect but slices the sorted entries
    directly. Catalog-managed tables set this automatically from the
    op kinds recorded at commit time (Catalog.append); hand-built
    op-logs may declare it. Results are identical to the general
    path on any PUT-only log (property-tested).

    ``counter_only=CellOp.ADD`` (or ``CellOp.ADDINT64``) promises the
    log holds ONLY that atomic op — the pure-counter table, tera's
    canonical Add workload. The merge then runs as two stacked hash
    aggregations on the same key prefix (same-ts dedup by max seq,
    then SUM of decoded deltas — one exchange total, both
    map-side-partial) instead of collecting per-column arrays.
    Identical to the general fold on any such log (property-tested);
    the catalog derives it from commit records like put_only.

    ``no_atomics=True`` promises the log holds only PUTs and delete
    marks (no ADD/ADDINT64/APPEND/PUT_IFABSENT) — the common
    tombstone-heavy shape. The fold keeps the full mask machinery but
    skips merge-run detection and the four merge folds: every group is
    one sequential pass (DEL_QUALIFIER arming + version cap). Same
    results as the general path on any such log (run_len would be 0
    in every group); the catalog derives it from commit records."""
    if now_us is None:
        now_us = int(time.time() * 1_000_000)
    df = cells
    if "seq" not in df.columns:
        df = df.withColumn("seq", F.lit(0).cast("long"))
    if snapshot_seq is not None:
        df = df.filter(F.col("seq") <= F.lit(snapshot_seq))
    if "expire_ts" in df.columns:
        # per-cell TTL (RowMutation::Put(value, ttl), mutation.h:30-33):
        # only puts carry it; NULL/0 = eternal
        df = df.filter(
            F.col("expire_ts").isNull()
            | (F.col("expire_ts") <= 0)
            | (F.col("expire_ts") > F.lit(now_us))
        ).drop("expire_ts")

    op, ts = F.col("op"), F.col("ts")

    # --- phase A: cheap row-local pre-filters (TTL, illegal cf) --------
    # Delete *marks* must survive to the aggregation: row-delete marks
    # carry cf="" (exempt from cf legality), family/qualifiers marks for
    # legal cfs pass the filter, and TTL only applies to data ops.
    if schema is not None and schema.column_families:
        legal = [cf.name for cf in schema.column_families.values()]
        df = df.filter(F.col("cf").isin(legal) | (op == CellOp.DEL_ROW))
        ttl_map = _cf_prop_map(schema, "ttl", 0)
        ttl_s = F.coalesce(ttl_map[F.col("cf")], F.lit(0))
        expired = (op >= CellOp.PUT) & (ttl_s > 0) & (ts < F.lit(now_us) - ttl_s.cast("long") * 1_000_000)
        df = df.filter(~expired)

    maxv_map = _cf_prop_map(schema, "max_versions", default_max_versions)

    if put_only:
        return _put_only_fold(df, schema, maxv_map, default_max_versions)
    if counter_only is not None:
        return _counter_only_fold(df, counter_only)

    # --- phase B: one hash aggregation collects each qualifier's ops
    # AND its delete-mark maxima; row/cf-granularity masks then spread
    # via windows over the *aggregated* rows (one per qualifier — orders
    # of magnitude smaller than the cell count, and clustered by the
    # same hash partitioning, so no extra exchange and no cell-level
    # sort). Masking happens on the collected arrays.
    # hot builders below are SQL-text expressions (F.expr): a Column
    # composed node-by-node costs one py4j round-trip per node, and this
    # fold is rebuilt per query invocation — measured ~0.5 s of driver
    # construction latency at steady state, more than the fold's sf0.1
    # execution. Same analyzed operators either way (oracle-pinned).
    # Row/cf-granularity delete marks never appear in `entries` (the
    # mask filter below drops them wholesale — their ts maxima reach
    # the mask via the mark joins), so keep them out of the collect
    # stream entirely: the big aggregation and its full-size exchange
    # then carry only ops that can survive. On a union-built op-log a
    # constant-op delete branch constant-folds to nothing (one fewer
    # scan); on a parquet op-log the `op` predicate pushes to the
    # reader. DEL_QUALIFIERS stays in-stream (it feeds _del_qu), as
    # does DEL_QUALIFIER (it arms the sequential pass).
    data = df.filter(~op.isin(CellOp.DEL_ROW, CellOp.DEL_FAMILY))
    grouped = (
        data.groupBy("row_key", "cf", "qualifier")
        .agg(
            # slim 4-field entry: ts/op ride inside the negated
            # sort keys (ts = -nts, op = sop) — 25% less agg
            # buffer + shuffle width than duplicating them.
            # DEL_QUALIFIERS rows stay in the stream only for the
            # _del_qu max below: collect_list skips the NULL the CASE
            # yields for them, so their structs never enter the agg
            # buffer or the exchange (like DEL_ROW/DEL_FAMILY above,
            # they could never survive the mask filter; the kept
            # subset of a sorted array is the same either way).
            F.expr(
                f"sort_array(collect_list(case when op <> {CellOp.DEL_QUALIFIERS} "
                "then named_struct("
                "'nts', -ts, 'sop', op, 'nseq', -seq, 'value', value) end))"
            ).alias("entries_raw"),
            F.expr(
                f"max(case when op = {CellOp.DEL_QUALIFIERS} then ts end)"
            ).alias("_del_qu"),
        )
        .withColumn("maxv", F.coalesce(maxv_map[F.col("cf")], F.lit(default_max_versions)))
    )
    # row/cf-granularity masks arrive by LEFT JOIN of two tiny mark
    # aggregates, not by windows over the grouped rows: delete marks
    # are rare by construction (they exist to be compacted away), so
    # AQE broadcasts the mark sides and the plan keeps ONE full-size
    # exchange — the window form forced a second exchange on row_key
    # plus two sorts of every aggregated row. Mass-delete pathologies
    # degrade gracefully to a keyed join on the same row_key prefix.
    # Both mark granularities extract from ONE shared scan (column-
    # pruned to row_key/cf/ts/op with `op IN (...)` pushed to the
    # parquet reader — row-group op min/max stats skip delete-free
    # files entirely); the per-granularity re-aggregates run over the
    # tiny grouped mark set and reuse its exchange.
    mk = (
        df.filter(op.isin(CellOp.DEL_ROW, CellOp.DEL_FAMILY))
        .groupBy("row_key", "cf", "op")
        .agg(F.max("ts").alias("_mts"))
    )
    row_marks = (
        mk.filter(F.col("op") == CellOp.DEL_ROW)
        .groupBy("row_key")
        .agg(F.max("_mts").alias("_del_row"))
    )
    cf_marks = mk.filter(F.col("op") == CellOp.DEL_FAMILY).select(
        "row_key", "cf", F.col("_mts").alias("_del_cf")
    )
    grouped = grouped.join(row_marks, "row_key", "left").join(
        cf_marks, ["row_key", "cf"], "left"
    )
    neg = -(1 << 62)
    dels = f"{CellOp.DEL_ROW}, {CellOp.DEL_FAMILY}, {CellOp.DEL_QUALIFIERS}"
    mask = (
        f"greatest(coalesce(_del_row, {neg}L), coalesce(_del_cf, {neg}L), "
        f"coalesce(_del_qu, {neg}L))"
    )
    grouped = grouped.withColumn(
        "entries",
        F.expr(
            f"filter(entries_raw, x -> (not (x.sop in ({dels}))) and (-x.nts > {mask}))"
        ),
    ).drop("entries_raw", "_del_qu", "_del_row", "_del_cf")

    e = F.col("entries")
    maxv_c = F.col("maxv")

    def _seq_pass(arr_sql: str, init_vnum_sql: str) -> Column:
        # sequential per-group pass: DEL_QUALIFIER arming + version cap.
        # arr_sql / init_vnum_sql are SQL fragments over the grouped
        # columns (entries/rest/run_len/maxv).
        put, dq = CellOp.PUT, CellOp.DEL_QUALIFIER
        vnum2 = f"(acc.vnum + (case when x.sop = {put} then 1 else 0 end))"
        emit = f"((x.sop = {put}) and (not (acc.prev = {dq})) and ({vnum2} <= maxv))"
        return F.expr(
            "aggregate("
            f"{arr_sql}, "
            f"named_struct('out', cast(array() as {_ENTRY_T}), "
            f"'vnum', {init_vnum_sql}, 'prev', 0), "
            "(acc, x) -> named_struct("
            f"'out', case when {emit} then "
            "concat(acc.out, array(named_struct('ts', -x.nts, 'value', x.value))) "
            "else acc.out end, "
            f"'vnum', {vnum2}, "
            "'prev', x.sop)"
            ").out"
        )

    if no_atomics:
        # PUTs + deletes only: every merge run would be empty, so the
        # whole group is one sequential pass — no run detection, no
        # dedup/merge folds (the expression tree the hot loop skips)
        versions = _seq_pass("entries", "0")
        return (
            grouped.select("row_key", "cf", "qualifier", F.explode(versions).alias("v"))
            .select(
                "row_key", "cf", "qualifier",
                F.col("v.ts").alias("ts"), F.col("v.value").alias("value"),
            )
        )

    # head run of atomic ops (merge candidates)
    run = F.aggregate(
        e,
        F.struct(F.lit(0).alias("n"), F.lit(False).alias("stop")),
        lambda acc, x: F.struct(
            F.when(~acc["stop"] & _is_atomic(x["sop"]), acc["n"] + 1)
            .otherwise(acc["n"])
            .alias("n"),
            (acc["stop"] | ~_is_atomic(x["sop"])).alias("stop"),
        ),
    )["n"]
    grouped = grouped.withColumn("run_len", run)
    run_len = F.col("run_len")
    base_is_put = (run_len > 0) & (F.size(e) > run_len) & (F.get(e, run_len)["sop"] == CellOp.PUT)
    group_len = run_len + F.when(base_is_put, 1).otherwise(0)
    grouped = grouped.withColumn("group_len", group_len)
    group_len = F.col("group_len")

    grp = F.slice(e, 1, group_len)
    rest = F.when(F.size(e) > group_len, F.slice(e, group_len + 1, F.size(e) - group_len)).otherwise(
        F.expr(f"cast(array() as {_spark_entry_type()})")
    )
    grouped = grouped.withColumn("grp", grp).withColumn("rest", rest)
    grp, rest = F.col("grp"), F.col("rest")

    # same-ts dedup inside the merge group (ts != last_ts_atomic || VALUE)
    kind = F.get(e, 0)["sop"]
    deduped = F.filter(
        grp,
        lambda x, i: (x["sop"] == CellOp.PUT)
        | (i == 0)
        | (x["nts"] != F.get(grp, i - 1)["nts"]),
    )
    # entries the merge kind actually folds (matching atomic kind or PUT
    # base) — staged as a column so the fold below runs once per group,
    # not once per reference (the little-endian encoder alone references
    # its input 8×, one per byte pair; inlined, each re-ran the fold)
    grouped = grouped.withColumn(
        "mergeable", F.filter(deduped, lambda x: (x["sop"] == kind) | (x["sop"] == CellOp.PUT))
    )
    mergeable = F.col("mergeable")

    # ADDINT64 decodes little-endian for deltas AND the PUT base alike
    # (MergeStep: `int64_ += *(int64_t*)value.data()` for both types).
    sum_long = F.when(
        kind == CellOp.ADD,
        F.aggregate(mergeable, F.lit(0).cast("long"), lambda acc, x: acc + be_i64_decode(x["value"])),
    ).when(
        kind == CellOp.ADDINT64,
        F.aggregate(mergeable, F.lit(0).cast("long"), lambda acc, x: acc + le_i64_decode(x["value"])),
    )
    grouped = grouped.withColumn("sum_long", sum_long)

    concat_asc = F.aggregate(
        F.reverse(mergeable), F.lit(b""), lambda acc, x: F.concat(acc, x["value"])
    )
    oldest_wins = F.element_at(mergeable, -1)["value"]

    merged_value = (
        F.when(kind == CellOp.ADD, be_i64_encode(F.col("sum_long")))
        .when(kind == CellOp.ADDINT64, le_i64_encode(F.col("sum_long")))
        .when(kind == CellOp.APPEND, concat_asc)
        .otherwise(oldest_wins)
    )
    merged_cell = F.when(
        (run_len > 0) & (maxv_c >= 1),
        F.array(F.struct((-F.get(e, 0)["nts"]).alias("ts"), merged_value.alias("value"))),
    ).otherwise(F.expr(f"cast(array() as {_ENTRY_T})"))

    # sequential pass over the remainder: DEL_QUALIFIER arming + version cap
    rest_out = _seq_pass("rest", "(case when run_len > 0 then 1 else 0 end)")

    versions = F.concat(merged_cell, rest_out)
    return (
        grouped.select("row_key", "cf", "qualifier", F.explode(versions).alias("v"))
        .select("row_key", "cf", "qualifier", F.col("v.ts").alias("ts"), F.col("v.value").alias("value"))
    )


def _put_only_fold(
    df: DataFrame,
    schema: TableSchema | None,
    maxv_map: Column,
    default_max_versions: int,
) -> DataFrame:
    """Visible view of a PUT-only op-log (pre-filtered by phase A).

    K=1 everywhere → one hash aggregation with map-side partial
    ``max_by(struct(ts,value), struct(ts,seq))`` — the newest write
    wins, ties by seq, exactly the general path's sort order with sop
    constant. No per-group arrays, no windows: at 100 TB this is the
    same shape as any partial+final agg and the map-side combine
    collapses hot qualifiers before the exchange.

    Mixed/larger K → collect+sort as the general path does, but slice
    the top-K entries directly (no delete masks, no merge-run
    scanning)."""
    all_k1 = (
        all(cf.max_versions == 1 for cf in schema.column_families.values())
        if schema is not None and schema.column_families
        else default_max_versions == 1
    )
    if all_k1:
        best = F.max_by(
            F.struct(F.col("ts").alias("ts"), F.col("value").alias("value")),
            F.struct(F.col("ts"), F.col("seq")),
        )
        return (
            df.groupBy("row_key", "cf", "qualifier")
            .agg(best.alias("_b"))
            .select(
                "row_key", "cf", "qualifier",
                F.col("_b.ts").alias("ts"), F.col("_b.value").alias("value"),
            )
        )
    entries = F.slice(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("ts")).alias("nts"),
                    (-F.col("seq")).alias("nseq"),
                    F.col("value").alias("value"),
                )
            )
        ),
        1,
        F.coalesce(maxv_map[F.col("cf")], F.lit(default_max_versions)),
    )
    return (
        df.groupBy("row_key", "cf", "qualifier")
        .agg(entries.alias("_e"))
        .select("row_key", "cf", "qualifier", F.explode("_e").alias("v"))
        .select(
            "row_key", "cf", "qualifier",
            (-F.col("v.nts")).alias("ts"), F.col("v.value").alias("value"),
        )
    )


def _counter_only_fold(df: DataFrame, kind: int) -> DataFrame:
    """Visible view of a pure-counter op-log (ADD xor ADDINT64 only,
    pre-filtered by phase A): per column, entries with the same ts
    collapse to the max-seq one (the general fold's same-ts dedup),
    then deltas SUM and the newest ts labels the merged cell — two
    stacked hash aggregations on the same key prefix, so Catalyst
    plans ONE exchange and both aggregations partial map-side. No
    arrays, no merge-run scanning; maxversions is irrelevant (a merge
    emits one cell)."""
    dec = be_i64_decode if kind == CellOp.ADD else le_i64_decode
    enc = be_i64_encode if kind == CellOp.ADD else le_i64_encode
    per_ts = df.groupBy("row_key", "cf", "qualifier", "ts").agg(
        F.max_by("value", "seq").alias("value")
    )
    return per_ts.groupBy("row_key", "cf", "qualifier").agg(
        F.max("ts").alias("ts"),
        enc(F.sum(dec(F.col("value")))).alias("value"),
    ).select("row_key", "cf", "qualifier", "ts", "value")


def _spark_entry_type() -> str:
    # sorted-entry struct type for empty-array casts (nts/sop/nseq sort key)
    return "array<struct<nts:bigint,sop:int,nseq:bigint,value:binary>>"


def kv_current_view(kv_oplog: DataFrame, *, now_us: int | None = None) -> DataFrame:
    """Fold an append-only KV op-log (key, value, expire_ts, seq) into
    the visible KV table: last-write-wins by seq per key (LevelDB
    put/overwrite in KV mode), NULL-value rows are delete tombstones,
    then TTL visibility (kv_view). One hash aggregation keyed by
    `key` — map-side partial max_by collapses duplicates before the
    shuffle, the same single-exchange stance as current_view."""
    newest = kv_oplog.groupBy("key").agg(
        F.max_by(F.struct("value", "expire_ts"), F.col("seq")).alias("_n")
    )
    live = newest.select(
        "key",
        F.col("_n.value").alias("value"),
        F.col("_n.expire_ts").alias("expire_ts"),
    ).filter(F.col("value").isNotNull())
    return kv_view(live, now_us=now_us)


def kv_view(kv: DataFrame, *, now_us: int | None = None) -> DataFrame:
    """KV-mode visibility: drop expired keys (TTLKV, reference
    src/io/ttlkv_compact_strategy.cc:43-70; expire_ts NULL/0 = eternal)."""
    if now_us is None:
        now_us = int(time.time() * 1_000_000)
    keep = F.col("expire_ts").isNull() | (F.col("expire_ts") <= 0) | (F.col("expire_ts") > F.lit(now_us))
    return kv.filter(keep)


def latest_view(cells: DataFrame, schema: TableSchema | None = None, **kw) -> DataFrame:
    """max_versions=1 convenience: one newest visible cell per column."""
    v = current_view(cells, schema, **kw)
    w = Window.partitionBy("row_key", "cf", "qualifier").orderBy(F.desc("ts"))
    return v.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def changes_between(
    cells: DataFrame,
    schema: TableSchema | None = None,
    *,
    seq_start: int,
    seq_end: int | None = None,
    now_us: int | None = None,
    put_only: bool = False,
    counter_only: int | None = None,
    no_atomics: bool = False,
) -> DataFrame:
    """Changefeed between two write sequences: per (row_key, cf,
    qualifier), diff the newest visible value as-of ``seq_start``
    against as-of ``seq_end`` (None = all writes) and emit
    INSERT/UPDATE/DELETE rows; unchanged columns are dropped. The CDC
    analog tera lacks (clients re-scan; observers see single cells) —
    snapshot reads (SnapshotIDToSeq, src/io/tablet_io.cc:698-706) give
    the two endpoints, this computes the delta set between them.

    Scale shape: only rows whose row_key saw a write AFTER seq_start
    can appear in the diff, so both endpoint folds are restricted to
    those *dirty keys* first — a column-pruned scan of (row_key, seq)
    finds them (Parquet row-group min/max on seq skips old files,
    since an append-only op-log correlates seq with file order), and a
    semi-join bounds both folds by dirty history instead of the full
    table. The folds and the full-outer diff then share one hash
    clustering on row_key; output is change-set-sized."""
    if "seq" not in cells.columns:
        cells = cells.withColumn("seq", F.lit(0).cast("long"))
    dirty_pred = F.col("seq") > F.lit(seq_start)
    if seq_end is not None:
        dirty_pred = dirty_pred & (F.col("seq") <= F.lit(seq_end))
    dirty = cells.filter(dirty_pred).select("row_key").distinct()
    scoped = cells.join(dirty, "row_key", "left_semi")
    hints = dict(put_only=put_only, counter_only=counter_only, no_atomics=no_atomics)
    v0 = latest_view(
        scoped, schema, snapshot_seq=seq_start, now_us=now_us, **hints
    ).select(
        "row_key", "cf", "qualifier", F.col("value").alias("old_value")
    )
    v1 = latest_view(
        scoped, schema, snapshot_seq=seq_end, now_us=now_us, **hints
    ).select(
        "row_key", "cf", "qualifier", F.col("value").alias("new_value")
    )
    j = v0.join(v1, ["row_key", "cf", "qualifier"], "full_outer")
    change = (
        F.when(F.col("old_value").isNull(), F.lit("INSERT"))
        .when(F.col("new_value").isNull(), F.lit("DELETE"))
        .when(F.col("old_value") != F.col("new_value"), F.lit("UPDATE"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select("row_key", "cf", "qualifier", "change_type", "old_value", "new_value")
    )
