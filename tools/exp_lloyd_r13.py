"""Round-13 experiment: kmeans_lloyd round-model materialization.

Variants of ``similarity._materialize_k_rows`` (VERDICT r12 item 1):
  * v32     — round-12 form: createDataFrame(rows) at defaultParallelism
              slices (each later model broadcast = a 32-task job)
  * v1      — rows parallelized into ONE slice (1-task broadcast jobs)
  * persist — round-11 form: persist + count (InMemoryRelation model)

Measured on the full gated queries the bench times (ann_ivf_autok is
the Lloyd consumer; ann_ivf_topk is a NO-Lloyd control — it trains from
the label column), interleaved, wall + job counts.

Usage: python tools/exp_lloyd_r13.py [draws]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_r13 import run_ab  # noqa: E402


def main() -> None:
    draws = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from ffi_etl_spark.operators import similarity
    from ffi_etl_spark.session import get_session

    spark = get_session("exp_lloyd_r13")
    qs = entry_mod.queries()

    # same warmups as bench.py (JVM, parquet footers, python workers)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(256).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).mapInPandas(lambda it: it, schema="id long").count()

    def mat_v32(spark_, df):
        return spark_.createDataFrame(df.collect(), schema=df.schema)

    def mat_v1(spark_, df):
        rows = df.collect()
        return spark_.createDataFrame(
            spark_.sparkContext.parallelize(rows, 1), schema=df.schema
        )

    def mat_persist(spark_, df):
        df = df.persist()
        df.count()
        return df

    mats = {"v32": mat_v32, "v1": mat_v1, "persist": mat_persist}

    for qname in ("ann_ivf_autok", "ann_ivf_topk"):
        fn = qs[qname]
        variants = {}
        for mname, mat in mats.items():
            def build(mat=mat):
                similarity._materialize_k_rows = mat
                return fn(spark, sf_dir)
            variants[mname] = build
        print(f"== {qname} ==", file=sys.stderr)
        run_ab(spark, variants, draws=draws)


if __name__ == "__main__":
    main()
