"""Table storage with per-partition checkpoint/resume.

Two implementations behind one interface:

- `IcebergIO` — used when an Iceberg catalog is configured on the cluster
  (`iceberg-spark-runtime` jar; NOT available in this sandbox). Buckets map
  to Iceberg's `bucket(N, conv_id)` partition transform; the manifest rides
  Iceberg snapshot metadata.
- `ParquetManifestIO` — self-contained fallback with identical semantics:
  hash-bucketed Parquet layout (`bucket=NNN/` directories → Spark partition
  pruning prunes scans to pending buckets) plus a JSON checkpoint manifest
  recording per-bucket lineage (input fingerprint), row counts, stats,
  status, and wall time.

Resume contract (north_star): a killed job restarts and re-validates ONLY
buckets not marked done in the manifest; the bucket filter is a partition-
directory filter, so pruning happens at the file index — done buckets are
never even listed, let alone scanned.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_PART_COL = "bucket"


@dataclass
class BucketEntry:
    bucket: int
    status: str = "pending"  # pending | done | failed | quarantined
    n_rows: int = 0
    n_violating_rows: int = 0
    passed: bool | None = None
    input_fingerprint: str = ""
    run_id: str = ""
    wall_time_sec: float = 0.0
    stats: dict = field(default_factory=dict)


@dataclass
class Manifest:
    n_buckets: int
    bucket_key: str
    entries: dict[int, BucketEntry] = field(default_factory=dict)

    def pending(self) -> list[int]:
        # quarantined buckets are parked, not retried: their data drifted
        # past threshold and needs human/baseline action before revalidation
        return [
            b for b in range(self.n_buckets)
            if self.entries.get(b, BucketEntry(b)).status
            not in ("done", "quarantined")
        ]

    def quarantined(self) -> list[int]:
        return [
            b for b in range(self.n_buckets)
            if self.entries.get(b, BucketEntry(b)).status == "quarantined"
        ]

    def to_json(self) -> str:
        return json.dumps(
            {
                "n_buckets": self.n_buckets,
                "bucket_key": self.bucket_key,
                "entries": {str(b): asdict(e) for b, e in self.entries.items()},
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        d = json.loads(s)
        m = cls(n_buckets=d["n_buckets"], bucket_key=d["bucket_key"])
        m.entries = {
            int(b): BucketEntry(**e) for b, e in d.get("entries", {}).items()
        }
        return m


class ParquetManifestIO:
    """Hash-bucketed Parquet table + atomic JSON checkpoint manifest."""

    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_path = os.path.join(root, "_manifest", "manifest.json")

    # ---- layout -----------------------------------------------------------

    def write_bucketed(
        self, df: DataFrame, bucket_key: str, n_buckets: int,
        salt_factor: int = 4, entropy_cols: tuple[str, ...] | None = None,
    ) -> Manifest:
        """Materialize the table partitioned by hashed bucket_key.

        bucket = pmod(xxhash64(key), n_buckets) — the same deterministic
        scheme the runner's partition report uses, and the drop-in analog of
        Iceberg's bucket() transform.

        The write repartitions on (bucket, salt) — the explicit salted
        repartitioning the north_rule requires: a conversation holding 1%
        of 10^12 rows would otherwise pin its entire bucket's write to one
        task; the salt spreads each bucket over salt_factor writer tasks
        (directory layout is unchanged — partitionBy(bucket) still routes
        rows to bucket=NNN/, just from several tasks in parallel)."""
        from pysemantic_spark.operators.skew import salt_expr

        # deterministic entropy (full-row hash by default) — a random or
        # nondeterministic salt used as a shuffle key corrupts data on
        # stage retries
        from pysemantic_spark.operators.skew import hashable_cols
        entropy = tuple(entropy_cols) if entropy_cols else hashable_cols(df)
        out = df.withColumn(
            BUCKET_PART_COL,
            F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(n_buckets)).cast("int"),
        ).withColumn("_salt", salt_expr(salt_factor, *entropy))
        (
            out.repartition(n_buckets * salt_factor, F.col(BUCKET_PART_COL), F.col("_salt"))
            .drop("_salt")
            .write.mode("overwrite")
            .partitionBy(BUCKET_PART_COL)
            .parquet(self.data_dir)
        )
        manifest = Manifest(n_buckets=n_buckets, bucket_key=bucket_key)
        for b in range(n_buckets):
            manifest.entries[b] = BucketEntry(
                bucket=b, input_fingerprint=self._bucket_fingerprint(b)
            )
        self.save_manifest(manifest)
        return manifest

    def read_buckets(self, spark: SparkSession, buckets: list[int]) -> DataFrame:
        """Partition-pruned scan of the given buckets only.

        The filter on the partition column resolves at the file index —
        `.explain` shows PartitionFilters, zero files from done buckets."""
        df = spark.read.parquet(self.data_dir)
        return df.filter(F.col(BUCKET_PART_COL).isin(buckets))

    # ---- manifest ---------------------------------------------------------

    def load_manifest(self) -> Manifest:
        with open(self.manifest_path) as f:
            return Manifest.from_json(f.read())

    def save_manifest(self, manifest: Manifest) -> None:
        os.makedirs(os.path.dirname(self.manifest_path), exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(manifest.to_json())
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    def _bucket_fingerprint(self, bucket: int) -> str:
        """Lineage fingerprint: names+sizes of the bucket's data files."""
        d = os.path.join(self.data_dir, f"{BUCKET_PART_COL}={bucket}")
        if not os.path.isdir(d):
            return ""
        parts = sorted(
            f"{fn}:{os.path.getsize(os.path.join(d, fn))}"
            for fn in os.listdir(d)
            if fn.endswith(".parquet")
        )
        import hashlib

        return hashlib.md5("|".join(parts).encode()).hexdigest()


def requalify_buckets(
    io: "ParquetManifestIO", buckets: list[int] | None = None
) -> list[int]:
    """Return quarantined buckets to the validation pool: the operator
    half of the quarantine lifecycle. ``on_drift: quarantine`` parks a
    drifted bucket (status="quarantined"; pending() skips it) until a
    human decides the drift is expected and refreshes the baseline —
    this call then flips the status back to "pending" so the next
    ``run_resumable`` revalidates it against the new baseline.

    ``buckets=None`` requalifies every quarantined bucket; an explicit
    list must name only quarantined buckets (naming a done/pending one
    raises — requalify is a quarantine-release action, not a generic
    status reset; use the CLI validate without --resume for a full
    re-run). Drift evidence recorded in entry.stats is kept for audit.
    Returns the buckets requalified."""
    manifest = io.load_manifest()
    quarantined = set(manifest.quarantined())
    if buckets is None:
        targets = sorted(quarantined)
    else:
        bad = [b for b in buckets if b not in quarantined]
        if bad:
            states = {
                b: manifest.entries.get(b, BucketEntry(b)).status for b in bad
            }
            raise ValueError(
                f"requalify: buckets {states} are not quarantined — only "
                f"parked buckets can be requalified (quarantined: "
                f"{sorted(quarantined)})"
            )
        targets = sorted(set(buckets))
    for b in targets:
        manifest.entries[b].status = "pending"
    io.save_manifest(manifest)
    return targets


class IcebergIO:
    """Iceberg-backed variant: same interface, activates when the runtime
    jar + catalog are configured (real cluster). Bucketing uses the native
    `bucket(N, key)` partition transform; lineage rides snapshot ids.

    Not constructible in this sandbox (no jar, no network) — methods raise
    with a clear message so accidental use fails loudly rather than
    silently falling back."""

    def __init__(self, table: str):
        self.table = table

    def _unavailable(self):
        raise RuntimeError(
            "IcebergIO requires iceberg-spark-runtime on the classpath and a "
            "configured catalog; use ParquetManifestIO in jar-less "
            "environments (identical resume semantics)."
        )

    def write_bucketed(self, df: DataFrame, bucket_key: str, n_buckets: int):
        self._unavailable()

    def read_buckets(self, spark: SparkSession, buckets: list[int]):
        self._unavailable()


# ---------------------------------------------------------------------------
# Resumable validation driver
# ---------------------------------------------------------------------------

def run_resumable(
    spark: SparkSession,
    io: ParquetManifestIO,
    spec,
    dims: dict[str, DataFrame] | None = None,
    chunk_size: int = 8,
    max_chunks: int | None = None,
    violations_dir: str | None = None,
) -> dict:
    """Validate all pending buckets, checkpointing the manifest per chunk.

    Buckets are processed in chunks of ``chunk_size``; after each chunk the
    manifest is atomically rewritten, so a kill loses at most one chunk of
    work. ``max_chunks`` bounds this run (used by tests to simulate a kill).

    Drift action (spec ``drift.on_drift``): ``ignore`` records the drift
    rows in the manifest and completes the chunk; ``quarantine`` marks the
    chunk's buckets status="quarantined" — they are NOT revalidated on
    resume (pending() skips them) until an operator clears the status or
    refreshes the baseline; ``fail`` propagates DriftDetectedError from
    execute() with the chunk left pending (at-least-once semantics: rerun
    revalidates it).

    Returns {"processed": [...buckets], "skipped": [...already-done],
    "quarantined": [...buckets parked this or earlier runs]}.
    """
    from pysemantic_spark.operators.runner import execute

    manifest = io.load_manifest()
    pending = manifest.pending()
    # skipped = verifiably DONE buckets only; quarantined buckets are
    # parked-for-drift, reported separately (disjoint from skipped) so a
    # caller counting skipped as completed never counts drifted data
    skipped = [
        b
        for b in range(manifest.n_buckets)
        if manifest.entries.get(b) is not None
        and manifest.entries[b].status == "done"
    ]
    run_id = uuid.uuid4().hex[:12]
    violations_dir = violations_dir or os.path.join(io.root, "violations")

    processed: list[int] = []
    chunks = [
        pending[i:i + chunk_size] for i in range(0, len(pending), chunk_size)
    ]
    if max_chunks is not None:
        chunks = chunks[:max_chunks]

    for chunk in chunks:
        t0 = time.time()
        df = io.read_buckets(spark, chunk).drop(BUCKET_PART_COL)
        out = execute(
            spark,
            df,
            spec,
            dims=dims,
            bucket_by=manifest.bucket_key,
            n_buckets=manifest.n_buckets,
            violations_sink=os.path.join(violations_dir, f"run={run_id}", f"chunk={chunk[0]}"),
        )
        wall = time.time() - t0
        report = out["partition_report"].set_index("bucket")
        stats = out["stats"].to_dict(orient="records")
        drift_pdf = out.get("drift")
        quarantine_chunk = (
            getattr(getattr(spec, "drift", None), "on_drift", "ignore")
            == "quarantine"
            and drift_pdf is not None
            and bool(drift_pdf["drifted"].any())
        )
        for b in chunk:
            e = manifest.entries.get(b) or BucketEntry(b)
            if b in report.index:
                e.n_rows = int(report.loc[b, "n_rows"])
                e.n_violating_rows = int(report.loc[b, "n_violating_rows"])
                e.passed = bool(report.loc[b, "passed"])
            else:  # bucket empty
                e.n_rows = 0
                e.n_violating_rows = 0
                e.passed = True
            e.status = "quarantined" if quarantine_chunk else "done"
            e.run_id = run_id
            e.wall_time_sec = round(wall / len(chunk), 3)
            e.input_fingerprint = io._bucket_fingerprint(b)
            if b == chunk[0]:
                e.stats = {"n_chunk_rows": out["n_rows"], "chunk_stats": stats}
                # per-phase wall clock of the chunk's execute() run rides the
                # manifest: a resumed job's operator can spot a degrading
                # phase (e.g. pass-1 write slowing as the table grows)
                # without any external metrics store
                if out.get("timings"):
                    e.stats["phase_timings"] = out["timings"]
                if out.get("drift") is not None:
                    # drifted/not-drifted rows ride the manifest (tiny frame)
                    e.stats["drift"] = out["drift"].to_dict(orient="records")
            else:
                e.stats = {}
            manifest.entries[b] = e
        io.save_manifest(manifest)
        processed.extend(chunk)

    return {
        "processed": processed,
        "skipped": skipped,
        "run_id": run_id,
        "quarantined": manifest.quarantined(),
    }
