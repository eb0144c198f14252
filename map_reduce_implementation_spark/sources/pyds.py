"""Custom Python DataSource (Spark 4 API): a deterministic synthetic
document generator — the scale-out pattern for producing test/benchmark
corpora WITHOUT a driver bottleneck: each input partition generates its
row range independently inside its task, so a 10-billion-row corpus is
just more partitions, never a driver loop or a broadcast list.

(The reference has no pluggable sources at all — its one source is a
local text file, mapreduce.c:19-30. EXT per SURVEY §2.1/S6.)

Usage:
    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("n_rows", 1000).option("n_partitions", 8).load())

Rows are pure functions of doc_id (xxhash-free stdlib arithmetic so the
worker needs nothing beyond the stdlib): reproducible across runs,
partition counts, and cluster layouts.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = [
    "data", "spark", "shuffle", "vector", "token", "model", "batch",
    "stream", "query", "index", "join", "merge", "scan", "cache",
]


def _doc_text(doc_id: int) -> str:
    # deterministic LCG over the doc id — stable under any partitioning
    state = (doc_id * 6364136223846793005 + 1442695040888963407) % (1 << 64)
    n_words = 5 + state % 20
    words = []
    for _ in range(n_words):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        words.append(_WORDS[state % len(_WORDS)])
    return " ".join(words)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 4))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, _doc_text(doc_id))


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)
