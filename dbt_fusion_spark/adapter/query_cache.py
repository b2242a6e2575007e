"""Query result cache: SQL hash -> parquet file with TTL.

Re-expresses crates/dbt-adapter/src/query_cache.rs:31-154 (per-query
result files keyed by SQL hash, expiring after a TTL). On Spark the
cached payload is a parquet directory, so a hit is a distributed scan —
large cached results never funnel through the driver, and downstream
plans still get pushdown/pruning against the cached files.
"""

from __future__ import annotations

import hashlib
import json
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class QueryCache:
    def __init__(self, cache_dir: str | Path, ttl_sec: float = 3600.0):
        self.dir = Path(cache_dir)
        self.ttl = ttl_sec
        self.dir.mkdir(parents=True, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _key(self, sql: str) -> str:
        return hashlib.sha256(" ".join(sql.split()).encode()).hexdigest()[:32]

    def _paths(self, sql: str) -> tuple[Path, Path]:
        k = self._key(sql)
        return self.dir / k, self.dir / f"{k}.meta.json"

    def lookup(self, spark: SparkSession, sql: str) -> DataFrame | None:
        data, meta = self._paths(sql)
        if not meta.exists():
            return None
        info = json.loads(meta.read_text())
        if time.time() - info["written_at"] > self.ttl:
            shutil.rmtree(data, ignore_errors=True)
            meta.unlink(missing_ok=True)
            return None
        self.hits += 1
        return spark.read.parquet(str(data))

    def store(self, sql: str, df: DataFrame) -> DataFrame:
        data, meta = self._paths(sql)
        self.misses += 1
        df.write.mode("overwrite").parquet(str(data))
        meta.write_text(json.dumps({"written_at": time.time(), "sql": sql}))
        return df.sparkSession.read.parquet(str(data))

    def execute(self, spark: SparkSession, sql: str) -> DataFrame:
        """Cached spark.sql: hit -> scan of the cached parquet; miss ->
        run, persist, and read back (so repeated calls share files)."""
        hit = self.lookup(spark, sql)
        if hit is not None:
            return hit
        return self.store(sql, spark.sql(sql))

    def clear(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
        self.dir.mkdir(parents=True, exist_ok=True)
