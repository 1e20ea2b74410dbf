"""10x nested-type write stress: MAP/STRUCT columns through the real
batched Arrow sink path at ~1.5M rows, vs the same data flat.

Methodology mirrors bench.py's sink_rows_per_sec: spread + persist the
input so each timed pass is writer machinery alone; untimed warm-up
pass; best-of-3. Integrity checked on a single write into a fresh dir
(the writer appends across passes, so the timed dir accumulates).
"""
import shutil
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

from flink_connectors_spark.session import load_table
from flink_connectors_spark.sink.options import SinkOptions
from flink_connectors_spark.sink.writer import write_batch

SF_DIR = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "24g")
    .appName("nested-write-stress")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

orders = load_table(spark, SF_DIR, "orders").select(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate",
)
reps = spark.range(10).select(F.col("id").alias("rep"))
base = orders.crossJoin(F.broadcast(reps)).select(
    (F.col("o_orderkey") + F.col("rep") * F.lit(100_000_000)).alias("k"),
    "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
)

packed = base.select(
    "k",
    F.struct(
        F.col("o_custkey").alias("cust"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").alias("d"),
    ).alias("summary"),
    F.create_map(
        F.lit("open"),
        F.when(F.col("o_orderstatus") == "O", F.lit(1)).otherwise(F.lit(0)),
        F.lit("cust"), F.col("o_custkey"),
    ).alias("counts"),
).repartition(32).persist()
flat = base.repartition(32).persist()
n = packed.count()
assert flat.count() == n
print(f"rows: {n:,}")

src = base.agg(
    F.sum("o_custkey").alias("s1"),
    F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("s2"),
).collect()[0]

# --- integrity: ONE write, fresh dir, full nested checksum ---
d = tempfile.mkdtemp(prefix="fcs_stress_int_")
write_batch(packed, SinkOptions(url=f"parquet://{d}", table_name="t",
                                batch_size=100_000))
back = spark.read.parquet(f"{d}/t")
cnt = back.count()
chk = back.agg(
    F.sum(F.col("summary.cust")).alias("s1"),
    F.sum(F.col("counts")["open"]).alias("s2"),
).collect()[0]
assert cnt == n, (cnt, n)
assert chk["s1"] == src["s1"] and chk["s2"] == src["s2"], (chk, src)
shutil.rmtree(d, ignore_errors=True)
print("integrity: OK (count + nested checksums match source)")


def timed(df, name):
    d = tempfile.mkdtemp(prefix=f"fcs_stress_{name}_")
    try:
        opts = SinkOptions(url=f"parquet://{d}", table_name="t",
                           batch_size=100_000)
        write_batch(df, opts)  # warm-up
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            write_batch(df, opts)
            best = min(best, time.perf_counter() - t0)
        return best
    finally:
        shutil.rmtree(d, ignore_errors=True)


best_n = timed(packed, "nested")
best_f = timed(flat, "flat")
print(f"nested: {best_n:.3f}s = {n/best_n:,.0f} rows/s")
print(f"flat:   {best_f:.3f}s = {n/best_f:,.0f} rows/s")
print(f"nested/flat overhead: {best_n/best_f:.2f}x")
spark.stop()
