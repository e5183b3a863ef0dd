"""A/B one session conf against selected queries (fresh session per side).

Usage: python tools/ab_r07.py CONF_KEY VAL_A VAL_B q1 q2 ...
"""
import json
import os
import subprocess
import sys

KEY, VA, VB = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]

RUN = r"""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
from pysemantic_spark.session import get_spark
from pysemantic_spark.operators.cache import release_intermediates
import __spark_entry__ as entrymod
key, val = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark(app_name="ab", master="local[32]", shuffle_partitions=32,
                  extra_conf={key: val})
spark.read.parquet(f"{sf}/lineitem.parquet").count()
out = {}
for name in names:
    release_intermediates()
    fn = entrymod._RAW_QUERIES[name]
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
    out[name] = runs
    release_intermediates()
print("ABRESULT " + json.dumps({"val": val, "queries": out}))
"""

for val in (VA, VB):
    r = subprocess.run(
        [sys.executable, "-c", RUN, KEY, val] + names,
        capture_output=True, text=True, timeout=1800,
    )
    for line in r.stdout.splitlines():
        if line.startswith("ABRESULT"):
            print(line)
    if r.returncode != 0:
        print("RC", r.returncode, r.stderr[-500:])
