"""Table catalog with atomic commits, per-partition lineage, and
resumability (SURVEY.md §1.4, BASELINE.json north_rule "checkpoints
... with per-partition lineage and metrics for resumability").

Two backends behind one interface:

- ``IcebergCatalog`` (production): thin wrapper over an Iceberg Spark
  catalog (``writeTo(...).createOrReplace()``, snapshot reads). Only
  activated when an iceberg-spark-runtime jar is on the classpath —
  this sandbox has none, so it is code-complete but unexercised.
- ``HadoopParquetCatalog`` (sandbox default, fully tested): plain
  parquet directories plus an explicit JSON manifest per commit. A
  table commit is: write to ``<table>.__tmp_<run_id>`` -> fsync the
  manifest (per-file rows + sha256 + bytes) -> atomic ``os.rename``
  into place. Readers only ever see fully-committed tables; a crashed
  writer leaves a ``__tmp`` dir that the next run clears. This
  *implements* Iceberg's commit/lineage semantics with public
  filesystem primitives.

The manifest IS the lineage record: one row per output partition file
(rows, bytes, sha256), plus stage wall-clock and total rows — queried
back as the ``_metrics`` table for observability and used by the
runner's resume logic (el.runner).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def _local_path(uri: str) -> str:
    """'file:/a/b' or 'file:///a/b' (possibly URL-encoded) -> '/a/b'."""
    from urllib.parse import unquote, urlparse

    p = urlparse(uri)
    return unquote(p.path) if p.scheme else uri


@dataclass
class HadoopParquetCatalog:
    root: str

    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._dir(table), "_MANIFEST.json")

    # -- commits ---------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        table: str,
        run_id: str = "run0",
        stage: str | None = None,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Atomic commit of ``df`` as ``table``; returns the manifest.

        Write-to-temp + manifest + rename: the table either exists
        fully committed (manifest present, every file hashed) or not
        at all."""
        os.makedirs(self.root, exist_ok=True)
        final = self._dir(table)
        tmp = os.path.join(self.root, f"{table}.__tmp_{run_id}")
        for stale in (tmp,):
            if os.path.exists(stale):
                shutil.rmtree(stale)

        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        wall_ms = int((time.time() - t0) * 1000)

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        paths = []
        for dirpath, _, names in os.walk(tmp):
            for name in sorted(names):
                if name.endswith(".parquet"):
                    paths.append(os.path.join(dirpath, name))

        # Per-file content hashing runs EXECUTOR-side (binaryFile scan
        # + JVM sha2): the commit never funnels the table's bytes back
        # through the driver — at 100 TB that re-read would be a
        # single-node bottleneck (r1 hashed on the driver). Row counts
        # come from the parquet FOOTERS only (pyarrow metadata reads,
        # O(n_files) tiny reads — the same information an Iceberg
        # manifest records at write time).
        t1 = time.time()
        files: list[dict] = []
        if paths:
            sha_rows = (
                df.sparkSession.read.format("binaryFile")
                .option("pathGlobFilter", "*.parquet")
                .option("recursiveFileLookup", "true")
                .load(tmp)
                .select(
                    "path",
                    F.col("length").alias("bytes"),
                    F.sha2(F.col("content"), 256).alias("sha256"),
                )
                .collect()
            )
            by_path = {_local_path(r["path"]): r for r in sha_rows}
            for fp in paths:
                r = by_path[os.path.abspath(fp)]
                files.append(
                    {
                        "path": os.path.relpath(fp, tmp),
                        "rows": pq.ParquetFile(fp).metadata.num_rows,
                        "bytes": r["bytes"],
                        "sha256": r["sha256"],
                    }
                )
        lineage_ms = int((time.time() - t1) * 1000)
        total_rows = sum(f["rows"] for f in files)
        manifest = {
            "table": table,
            "stage": stage or table,
            "run_id": run_id,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "wall_ms": wall_ms,
            "lineage_ms": lineage_ms,
            "n_files": len(files),
            "total_rows": total_rows,
            "files": files,
        }
        mpath = os.path.join(tmp, "_MANIFEST.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())

        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return manifest

    # -- reads -----------------------------------------------------------

    def exists(self, table: str) -> bool:
        return os.path.exists(self._manifest_path(table))

    def manifest(self, table: str) -> dict | None:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        if not self.exists(table):
            raise FileNotFoundError(
                f"table {table!r} has no committed manifest under {self.root}"
            )
        return spark.read.parquet(self._dir(table))

    def committed(self, table: str, run_id: str | None = None) -> bool:
        m = self.manifest(table)
        if m is None:
            return False
        return run_id is None or m["run_id"] == run_id

    # -- metrics surface -------------------------------------------------

    def metrics(self, spark: SparkSession) -> DataFrame:
        """Per-partition lineage across every committed table, as a
        DataFrame (stage, run_id, file, rows, bytes, sha256, wall_ms,
        committed_at)."""
        rows = []
        if os.path.isdir(self.root):
            for table in sorted(os.listdir(self.root)):
                m = self.manifest(table)
                if not m:
                    continue
                for f in m["files"]:
                    rows.append(
                        (
                            m["stage"], m["run_id"], f["path"], f["rows"],
                            f["bytes"], f["sha256"], m["wall_ms"],
                            m["committed_at"],
                        )
                    )
        return spark.createDataFrame(
            rows,
            "stage string, run_id string, file string, rows long, "
            "bytes long, sha256 string, wall_ms long, committed_at string",
        )


@dataclass
class IcebergCatalog:  # pragma: no cover - needs iceberg runtime jar
    """Iceberg-backed implementation of the same surface. Requires
    ``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog``
    and the iceberg-spark-runtime jar (absent in this sandbox)."""

    catalog: str = "local"
    namespace: str = "el"

    def _qualified(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def write(self, df: DataFrame, table: str, run_id: str = "run0",
              stage: str | None = None,
              partition_by: list[str] | None = None) -> dict:
        w = df.writeTo(self._qualified(table))
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return {"table": table, "run_id": run_id, "stage": stage or table}

    def exists(self, table: str) -> bool:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        return spark.catalog.tableExists(self._qualified(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.table(self._qualified(table))

    def committed(self, table: str, run_id: str | None = None) -> bool:
        return self.exists(table)
