"""Per-job dissection of a declared query: job ids, stage counts, task
counts and stage names — the load-independent structural view (VERDICT
r12 item 2: find where the ANN family's tiny jobs come from).

Usage: python tools/dissect_jobs_r13.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from ffi_etl_spark.session import get_session

    spark = get_session("dissect_r13")
    sc = spark.sparkContext
    qs = entry_mod.queries()

    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(256).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).mapInPandas(lambda it: it, schema="id long").count()

    for qname in sys.argv[1:]:
        fn = qs[qname]
        # one warm draw, then the dissected draw
        fn(spark, sf_dir).count()
        spark.catalog.clearCache()
        group = f"dissect_{qname}"
        sc.setJobGroup(group, qname)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        spark.catalog.clearCache()
        st = sc.statusTracker()
        job_ids = sorted(st.getJobIdsForGroup(group))
        print(f"== {qname}: {dt:.3f}s, {len(job_ids)} jobs ==")
        for jid in job_ids:
            ji = st.getJobInfo(jid)
            if ji is None:
                print(f"  job {jid}: <evicted>")
                continue
            parts = []
            for sid in sorted(ji.stageIds):
                si = st.getStageInfo(sid)
                if si is None:
                    parts.append(f"s{sid}:<evicted>")
                else:
                    parts.append(f"s{sid}:{si.numTasks}t:{si.name.split(' ')[0]}")
            print(f"  job {jid}: {len(ji.stageIds)} stages [{', '.join(parts)}]")


if __name__ == "__main__":
    main()
