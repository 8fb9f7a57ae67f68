"""Partitioned JDBC source builder — the production-path equivalent of the
reference's psycopg2 server-side cursor (reference ``flows/main_flow.py:
308-349``: ``itersize``-batched streaming scan with predicates inlined into
the SQL shipped to Postgres).

Spark's JDBC source gives the same properties declaratively:

- predicate/projection pushdown: filters on ``index``/``updated_at`` written
  against the returned DataFrame are compiled into the remote ``WHERE``;
- bounded memory: ``fetchsize`` is the cursor batch (reference default 1000);
- parallel scan: ``partitionColumn/lowerBound/upperBound/numPartitions``
  splits the table across executors — the piece the single-cursor reference
  fundamentally lacks and the main reason this scales past one node.

There is no Postgres in the test environment, but the module is exercised
END-TO-END against a real database anyway: ``tests/test_jdbc_live.py``
drives it through Spark's bundled embedded Derby — live connections,
fetchsize cursors, an 8-way partitioned parallel scan, and predicate
pushdown verified both in the plan (PushedFilters) and by the rows the
remote WHERE returns. Production swaps only the URL and driver class; the
parquet loaders in ``sources.parquet`` remain the oracle-gate stand-in
(SURVEY §1.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcSourceConfig:
    """Connection + parallelism settings for a partitioned JDBC read."""

    url: str  # e.g. jdbc:postgresql://host:5432/db
    table: str  # table, view, or "(subquery) alias"
    user: str = ""
    password: str = ""
    fetchsize: int = 1000  # reference db_batch_size default
    partition_column: str | None = None  # numeric/date column to split on
    num_partitions: int = 32
    lower_bound: str | None = None
    upper_bound: str | None = None
    extra_options: dict[str, str] = field(default_factory=dict)

    def reader_options(self) -> dict[str, str]:
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": self.table,
            "fetchsize": str(self.fetchsize),
            # one canonical session per executor task; keeps PG happy
            "pushDownPredicate": "true",
            "pushDownLimit": "true",
        }
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.partition_column:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError(
                    "partition_column requires lower_bound and upper_bound"
                )
            opts.update(
                partitionColumn=self.partition_column,
                lowerBound=self.lower_bound,
                upperBound=self.upper_bound,
                numPartitions=str(self.num_partitions),
            )
        opts.update(self.extra_options)
        return opts


def read_jdbc(spark: SparkSession, cfg: JdbcSourceConfig) -> DataFrame:
    """Build the DataFrame for a partitioned JDBC scan (lazy; no connection
    is made until an action runs)."""
    reader = spark.read.format("jdbc")
    for k, v in cfg.reader_options().items():
        reader = reader.option(k, v)
    return reader.load()
