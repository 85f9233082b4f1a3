"""Custom Python DataSource (Spark 4 API): deterministic synthetic
corpus generator.

Registers a ``synthetic_corpus`` format so scale probes and skew
stress tests can materialize arbitrarily large document tables
WITHOUT writing test fixtures to disk first:

    register_synthetic_source(spark)
    docs = (spark.read.format("synthetic_corpus")
            .option("rows", 1_000_000).option("partitions", 64).load())

Generation is partition-parallel (each InputPartition renders its own
doc_id range on an executor — nothing is materialized on the driver)
and content derives only from ``(seed, doc_id)``, so the same options
produce byte-identical rows no matter how many partitions render them
or how often the plan re-executes (safe under task retries and
re-computed lineage).

This is the engine's demonstration of the PySpark DataSource API —
the extension point a deployment would use for in-house feeds the
built-in readers don't cover (the reference hard-wired every source
into Glue job code; SURVEY.md §2.1)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch "
    "spark order data column join small line customer query big the "
    "a stream group sort window filter vector"
).split()

_SOURCES = ("crawl", "curated", "forum", "code")

_SCHEMA = "doc_id BIGINT, text STRING, source STRING, n_chars BIGINT"


def _doc(seed: int, doc_id: int) -> tuple[int, str, str, int]:
    """Render one document from (seed, doc_id) only — partition- and
    retry-invariant. md5 (not Python's salted hash()) keeps the corpus
    identical across interpreter runs."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_words = 20 + h[0] % 120
    words = []
    state = int.from_bytes(h[:8], "big")
    for _ in range(n_words):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
        words.append(_WORDS[state % len(_WORDS)])
    text = " ".join(words)
    return (doc_id, text, _SOURCES[h[1] % len(_SOURCES)], len(text))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _CorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_partitions = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.rows // self.n_partitions)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _doc(self.seed, doc_id)


class SyntheticCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _CorpusReader(self.options)


def register_synthetic_source(spark: SparkSession) -> None:
    """Idempotently register the ``synthetic_corpus`` format on this
    session."""
    spark.dataSource.register(SyntheticCorpusDataSource)
