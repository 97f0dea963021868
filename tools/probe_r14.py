"""Quick isolated probe: best-of-N noop-sink wall for named registry
queries in a fresh bare session (guide §1.4). Usage:

    python tools/probe_r14.py <sf_dir> <reps> <query> [query...]

Prints one line per query: name, per-rep walls, best, median.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir, reps, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    parts = os.environ.get("PROBE_SHUFFLE_PARTITIONS", "64")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", parts)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em
    from cdc2vec_spark.operators import composite

    qs = {**em.queries(), **composite.component_queries()}
    for name in names:
        fn = qs[name]
        walls = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"probe:{name}#{i}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        walls_s = " ".join(f"{w:.2f}" for w in walls)
        srt = sorted(walls)
        med = srt[len(srt) // 2]
        print(f"{name}: [{walls_s}] best={srt[0]:.2f} med={med:.2f}", flush=True)


if __name__ == "__main__":
    main()
