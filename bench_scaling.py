"""Two-cluster-size scaling evidence (BASELINE.md protocol).

The north_rule's N vs 4N executor criterion, evidenced in-sandbox by running
the SAME validation job on the SAME input at local[8] and local[32]:

    python bench_scaling.py            # orchestrates both, writes BENCH/BASELINE.md
    python bench_scaling.py --cores 8  # single measurement (subprocess mode)

Protocol: deterministic transcripts table (seed 42, skewed: one conversation
holds ~1% of rows), sized so the 8-core run takes ≥ 60 s; 1 warmup + 3 timed
runs per core count, median reported; efficiency = T8 / (4 × T32) ≥ 0.8.
Each core count runs in its own process (fresh JVM) — cluster analog: fresh
executor pool per size.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("SCALING_ROWS", "30000000"))
CACHE = os.path.join(REPO, ".bench_cache")
TPATH = os.path.join(CACHE, f"transcripts_{ROWS}.parquet")
DPATH = os.path.join(CACHE, "dim_tools.parquet")


def ensure_data() -> None:
    from pysemantic_spark.fixtures import dim_tools_pdf, write_transcripts_parquet

    os.makedirs(CACHE, exist_ok=True)
    if not os.path.exists(TPATH):
        write_transcripts_parquet(
            TPATH, ROWS, skew_conv_frac=0.01, chunk_rows=1_000_000
        )
    if not os.path.exists(DPATH):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(dim_tools_pdf(), preserve_index=False), DPATH
        )


def measure(cores: int) -> dict:
    from pysemantic_spark.fixtures import transcripts_spec
    from pysemantic_spark.operators.runner import execute
    from pysemantic_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling_{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    df = spark.read.parquet(TPATH)
    dims = {"dim_tools": spark.read.parquet(DPATH)}
    spec = transcripts_spec()
    sink = os.path.join(CACHE, f"scaling_viol_{cores}")

    n_warm = int(os.environ.get("SCALING_WARMUPS", "2"))
    n_timed = int(os.environ.get("SCALING_RUNS", "3"))
    times = []
    n_rows = 0
    for i in range(n_warm + n_timed):
        t0 = time.time()
        out = execute(
            spark, df, spec, dims=dims, bucket_by="conv_id", n_buckets=256,
            violations_sink=f"{sink}_run{i}",  # fresh sink: no overwrite churn
        )
        dt = time.time() - t0
        n_rows = out["n_rows"]
        if i >= n_warm:
            times.append(dt)
    times_sorted = sorted(times)
    med = times_sorted[len(times_sorted) // 2]
    return {
        "cores": cores,
        "rows": n_rows,
        "runs_sec": [round(t, 2) for t in times],
        "median_sec": round(med, 2),
        "min_sec": round(times_sorted[0], 2),
        "turns_per_sec": round(n_rows / med),
    }


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        ensure_data()
        print(json.dumps(measure(cores)))
        return

    ensure_data()
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
            capture_output=True, text=True,
            env=dict(os.environ, PYTHONPATH=REPO),
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)

    t8, t32 = results[8]["median_sec"], results[32]["median_sec"]
    eff = t8 / (4 * t32)
    report = {
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "passed": eff >= 0.8,
    }
    print(json.dumps(report))
    _write_md(report)


def _write_md(r: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — cluster-size scaling evidence

North_rule criterion: throughput scaling efficiency ≥ 0.8 between N and 4N
executors. Sandbox substitute (BASELINE.md protocol): same job, same input,
local[8] vs local[32], fresh JVM each, 2 warmups + 3 timed runs, median.

**Job**: full trait-spec validation suite (dtype/null/range/regex/levels ×
fused single-pass bitmap, referential broadcast anti-join vs dim_tools,
(conv_id, turn_idx) sort-merge dedup counts, per-bucket pass/fail report,
per-column stats via observe) over {r['local8']['rows']:,} deterministic
synthetic transcript turns (seed 42, Zipf conversation sizes, one skewed
conversation holding ~1% of rows), violations written to parquet.

| config | median sec | min sec | runs (2 warmups excluded) | turns/sec (median) |
|---|---|---|---|---|
| local[8]  (N)  | {r['local8']['median_sec']} | {r['local8']['min_sec']} | {r['local8']['runs_sec']} | {r['local8']['turns_per_sec']:,} |
| local[32] (4N) | {r['local32']['median_sec']} | {r['local32']['min_sec']} | {r['local32']['runs_sec']} | {r['local32']['turns_per_sec']:,} |

**Scaling efficiency = T8 / (4 × T32) = {r['scaling_efficiency']}**
(target ≥ {r['target']}: {"PASS" if r['passed'] else "FAIL"})

Spark conf: shuffle.partitions = cores, AQE on (coalescePartitions,
skewJoin), Arrow enabled, driver 48g, code cache 1g. Input: 64-file
parquet. Measurement excludes SparkSession startup and data generation.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
