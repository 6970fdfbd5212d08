"""Round-4 operator tests: skyline dominance, quantization invariants,
BM25 ranking, end-to-end dedup survivors."""

import __spark_entry__ as entry_mod

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_skyline_matches_bruteforce(spark):
    """Differential: the two-phase window skyline equals the O(n²)
    dominance definition, including tie semantics (equal points both
    survive; same-price-bigger-size dominates)."""
    from ffi_etl_spark.operators.skyline import skyline_2d

    rows = [
        (1, 10, 5), (2, 10, 5),   # duplicates: both non-dominated
        (3, 10, 4),               # dominated by 1/2 (same cost, smaller gain)
        (4, 9, 4),                # skyline (cheaper than 1, smaller)
        (5, 12, 6),               # skyline (best gain)
        (6, 12, 5),               # dominated by 1 (cheaper, equal gain)
        (7, 8, 1),                # skyline (cheapest)
        (8, 13, 6),               # dominated by 5
    ]
    df = spark.createDataFrame(rows, ["id", "cost", "gain"])
    got = {r.id for r in skyline_2d(df, "cost", "gain").collect()}
    data = {i: (c, g) for i, c, g in rows}
    expect = {
        i
        for i, (c, g) in data.items()
        if not any(
            (c2 <= c and g2 >= g) and (c2 < c or g2 > g)
            for j, (c2, g2) in data.items()
            if j != i
        )
    }
    assert got == expect == {1, 2, 4, 5, 7}


def test_skyline_plan_has_no_self_join(spark):
    """The scale contract: windows, never an O(n²) dominance join."""
    qs = entry_mod.queries()
    plan = qs["skyline_pareto"](spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") == 2  # part scanned once (tree + details)


def test_quantize_codes_in_range_and_ordered(spark):
    from ffi_etl_spark.operators.quantize import quantize_embeddings_int8
    from ffi_etl_spark.catalog import table

    out = quantize_embeddings_int8(table(spark, SF, "embeddings")).collect()
    assert len(out) == table(spark, SF, "embeddings").count()
    for r in out:
        codes = [int(c) for c in r.codes_csv.split(",")]
        assert len(codes) == r.n_dims
        assert all(0 <= c <= 255 for c in codes)
    # each dimension's extremes hit the code boundary somewhere
    all_codes = [
        [int(c) for c in r.codes_csv.split(",")] for r in out
    ]
    n_dims = len(all_codes[0])
    for d in range(n_dims):
        col = [v[d] for v in all_codes]
        assert min(col) == 0 and max(col) == 255


def test_bm25_prefers_term_dense_docs(spark):
    """The top-ranked doc must contain at least one query term, and
    ranking is deterministic across invocations."""
    qs = entry_mod.queries()
    a = [(r.doc_id, r.score_s) for r in qs["bm25_rank"](spark, SF01).collect()]
    b = [(r.doc_id, r.score_s) for r in qs["bm25_rank"](spark, SF01).collect()]
    assert a == b and len(a) == 20
    assert all(float(s) > 0 for _, s in a)
    from ffi_etl_spark.catalog import table

    top_text = (
        table(spark, SF01, "documents")
        .filter(F.col("doc_id") == a[0][0])
        .select("text")
        .first()[0]
        .lower()
    )
    assert any(t in top_text.split() for t in ("hash", "spark", "window"))


def test_two_phase_ntile_matches_window_ntile(spark):
    """histogram_equidepth's integer ntile replay must equal Spark's
    NTILE on a count NOT divisible by the bucket count (the remainder
    path: first n%k buckets one row bigger)."""
    from pyspark.sql import Window
    from ffi_etl_spark.operators.textops import global_cumsum_exclusive

    df = spark.createDataFrame(
        [(i, float((i * 37) % 23)) for i in range(23)], ["event_id", "value"]
    )
    w = Window.orderBy("value", "event_id")
    want = {
        (r.event_id, r.nt)
        for r in df.select("event_id", F.ntile(10).over(w).alias("nt")).collect()
    }
    ranked = global_cumsum_exclusive(
        df.withColumn("_one", F.lit(1)), ["value", "event_id"], "_one", out_col="_r0"
    )
    n = 23
    q, m = n // 10, n % 10
    r = F.col("_r0") + 1
    cut = m * (q + 1)
    decile = F.when(r <= cut, F.floor((r + q) / (q + 1))).otherwise(
        m + F.floor(((r - cut) + max(q, 1) - 1) / max(q, 1))
    )
    got = {
        (x.event_id, x.nt)
        for x in ranked.select("event_id", decile.cast("int").alias("nt")).collect()
    }
    assert got == want


def test_histogram_equidepth_plan_two_phase(spark):
    """The default equi-depth path must never run a global
    single-partition window over the raw rows: rangepartitioning
    present, and every window is keyed."""
    qs = entry_mod.queries()
    plan = qs["histogram_equidepth"](spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "rangepartitioning" in plan
    assert "ntile" not in plan.lower()


def test_dedup_survivors_break_every_pair(spark):
    """Every verified near-dup pair loses at least one endpoint, and
    survivors + dropped partition the corpus."""
    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.dedup import dedup_minhash_lsh

    qs = entry_mod.queries()
    survivors = {r.doc_id for r in qs["dedup_survivors"](spark, SF01).collect()}
    corpus = {r.doc_id for r in table(spark, SF01, "documents").select("doc_id").collect()}
    assert survivors <= corpus
    pairs = dedup_minhash_lsh(table(spark, SF01, "documents")).collect()
    assert pairs  # testdata has known near-dup templates
    for p in pairs:
        assert not (p.id_a in survivors and p.id_b in survivors), (p.id_a, p.id_b)
