"""Z-order layout: file-level min/max envelopes must prune for
predicates on EITHER clustered dimension, where a single-column sort
prunes only its own dimension."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from tera_spark.sources.tables import load
from tera_spark.sources.zorder import zorder_write

SF_DIR = "/root/testdata/sf0.001"


def _overlap_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of parquet files whose [min,max] for col intersects [lo,hi)."""
    files = glob.glob(f"{path}/*.parquet")
    assert files
    hit = 0
    for f in files:
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.names.index(col)
        mins, maxs = [], []
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if min(mins) < hi and max(maxs) >= lo:
            hit += 1
    return hit / len(files)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    from pyspark.sql import functions as F

    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()

    zpath = str(tmp_path / "zord")
    zorder_write(ev, "user_id", "value", zpath, n_files=16)
    # single-dimension layout for contrast: sorted by user_id only
    upath = str(tmp_path / "usort")
    ev.repartitionByRange(16, "user_id").sortWithinPartitions("user_id").write.parquet(upath)

    # ~10%-of-data-mass slice of each dimension (value is heavy-tailed,
    # so a range-based slice would hold most of the rows)
    u_hi = lo_u + max(1, round(0.1 * (hi_u - lo_u)))
    v_hi = ev.approxQuantile("value", [0.1], 0.001)[0]
    z_user = _overlap_fraction(zpath, "user_id", lo_u, u_hi)
    z_value = _overlap_fraction(zpath, "value", lo_v, v_hi)
    u_user = _overlap_fraction(upath, "user_id", lo_u, u_hi)
    u_value = _overlap_fraction(upath, "value", lo_v, v_hi)

    # z-order: both dimensions prune (most files skipped)
    assert z_user <= 0.5, z_user
    assert z_value <= 0.5, z_value
    # user-sorted: its own dimension prunes, the other reads everything
    assert u_user <= 0.25, u_user
    assert u_value >= 0.9, u_value

    # layout is lossless
    assert spark.read.parquet(zpath).count() == ev.count()
