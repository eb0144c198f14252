"""Driver-visible sink round-trip (EXT wrapping SURVEY §2.1 S5/S6).

S5 (single-file result sink) and the S6 format round-trips have been
tested only in ``tests/test_sources.py`` since round 1 — the driver's
correctness gate never saw them, because sinks aren't DataFrames. This
query closes that gap by ROUTING the gate through a sink: it writes a
deterministic projection to a scratch directory with the reference's
single-file property (``coalesce(1)``, SURVEY §2.1 S5 —
``mapreduce.c:153-157`` writes exactly one ``mr.rst``), reads it back,
and returns the read-back rows WITH the materialized file count as a
column. The DuckDB oracle computes the same rows directly from the
source table with ``1 AS n_files`` — so the driver's value hash now
verifies (a) the write→read round trip loses/alters nothing and (b)
exactly ONE data file was produced. If the sink ever fans out or
corrupts a row, the hash goes red.

100 TB note: ``coalesce(1)`` is the PARITY property, correct only for
small results (26-row letter counts, final reports). The large-scale
sinks (partitioned/bucketed/Z-ordered writes) live in
``sources/tables.py`` and stay many-file by design.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .base import Query

# scratch dirs created this process, removed at exit: a fresh dir per
# build is required for race-freedom (below), but without cleanup every
# build leaks a table snapshot into /tmp for the machine's lifetime
_SCRATCH_DIRS: list[str] = []


def _cleanup_scratch() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_scratch)


def q_sink_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    # a FRESH directory per build: a fixed path keyed by sf basename
    # would race under concurrent builds (bench + tests, or two data
    # roots sharing a basename) — overwrite deletes the part file a
    # previously-built lazy DataFrame still points at. Removed at
    # process exit (the read-back DataFrame is only consumed in-session)
    out = tempfile.mkdtemp(prefix="spark_graft_sink_")
    _SCRATCH_DIRS.append(out)
    snap = table(spark, sf, "documents").select(
        "doc_id", "lang", F.md5("text").alias("text_md5")
    )
    snap.coalesce(1).write.mode("overwrite").parquet(out)
    n_files = len(
        [
            f
            for f in os.listdir(out)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    )
    back = spark.read.parquet(out)
    return back.select(
        "doc_id", "lang", "text_md5", F.lit(n_files).alias("n_files")
    )


SQL_SINK_ROUNDTRIP = """
SELECT doc_id, lang, md5(text) AS text_md5, 1 AS n_files FROM documents
"""


QUERIES: dict[str, Query] = {
    "sink_roundtrip": Query(q_sink_roundtrip, SQL_SINK_ROUNDTRIP),
}
