"""Streaming ⇔ batch equivalence tests.

The streaming operators must produce the same results as their batch
twins when drained with ``availableNow`` (complete data, watermark
never trips) — that is the contract that makes streaming a drop-in
incremental mode.
"""

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table
from ffi_etl_spark.operators.windows import sessionize, tumbling_agg
from ffi_etl_spark.streaming.events import (
    run_to_memory,
    stream_dedup,
    stream_events,
    stream_sessionize,
    stream_tumbling_agg,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Streaming file sources need a directory; re-land the events table
    (with the nanos->micros normalization applied) as parquet files."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    return d


def test_stream_tumbling_matches_batch(spark, sf_dir, events_dir):
    batch = tumbling_agg(table(spark, sf_dir, "events"), "1 hour")
    stream = run_to_memory(stream_tumbling_agg(stream_events(spark, events_dir), "1 hour"), output_mode="complete")
    b = {(r.window_start, r.event_type): (r.n_events, r.total_value) for r in batch.collect()}
    s = {(r.window_start, r.event_type): (r.n_events, r.total_value) for r in stream.collect()}
    assert b == s and len(b) > 0


def test_stream_sessionize_crafted(spark, tmp_path):
    """Deterministic gap pattern: sub-gap spacing chains a session,
    super-gap spacing breaks it — identical for the batch sessionizer
    and ``session_window`` (away from the exact-gap boundary, where the
    batch op's second-truncation can legitimately differ)."""
    rows = [
        # user 1: 3 events 10 min apart (one session), then a 2h jump (new session)
        Row(event_id=1, ts=datetime(2024, 1, 1, 10, 0), user_id=1, event_type="a", value=1.0, props=""),
        Row(event_id=2, ts=datetime(2024, 1, 1, 10, 10), user_id=1, event_type="a", value=1.0, props=""),
        Row(event_id=3, ts=datetime(2024, 1, 1, 10, 20), user_id=1, event_type="a", value=1.0, props=""),
        Row(event_id=4, ts=datetime(2024, 1, 1, 12, 30), user_id=1, event_type="a", value=1.0, props=""),
        # user 2: single event
        Row(event_id=5, ts=datetime(2024, 1, 1, 9, 0), user_id=2, event_type="b", value=1.0, props=""),
    ]
    df = spark.createDataFrame(rows)
    d = str(tmp_path / "crafted")
    df.write.parquet(d)

    batch = sessionize(df, gap_minutes=30)
    stream = run_to_memory(stream_sessionize(stream_events(spark, d), "30 minutes"), output_mode="complete")
    b = sorted((r.user_id, r.n_events, r.session_start, r.session_end) for r in batch.collect())
    s = sorted((r.user_id, r.n_events, r.session_start, r.session_end) for r in stream.collect())
    assert b == s == [
        (1, 1, datetime(2024, 1, 1, 12, 30), datetime(2024, 1, 1, 12, 30)),
        (1, 3, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 10, 20)),
        (2, 1, datetime(2024, 1, 1, 9, 0), datetime(2024, 1, 1, 9, 0)),
    ]


def test_stream_sessionize_conserves_events(spark, sf_dir, events_dir):
    """On the real events table: every event lands in exactly one session."""
    total = table(spark, sf_dir, "events").count()
    stream = run_to_memory(stream_sessionize(stream_events(spark, events_dir), "30 minutes"), output_mode="complete")
    assert sum(r.n_events for r in stream.collect()) == total


def test_stream_dedup(spark, sf_dir, events_dir):
    n_users = table(spark, sf_dir, "events").select("user_id").distinct().count()
    out = run_to_memory(stream_dedup(stream_events(spark, events_dir), keys=["user_id"]))
    assert out.count() == n_users
    assert out.select("user_id").distinct().count() == n_users


def test_stateful_user_totals(spark, sf_dir, events_dir):
    """applyInPandasWithState running profile converges to the batch
    groupBy answer after draining all input."""
    import math

    from ffi_etl_spark.streaming.stateful import user_running_totals

    out = run_to_memory(
        user_running_totals(stream_events(spark, events_dir)), output_mode="update"
    )
    # update mode may emit once per microbatch; the max-count row per
    # user is the final state
    final = {}
    for r in out.collect():
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r
    batch = {
        r.user_id: r
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tv"),
            F.max("ts").alias("mx"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        s = final[uid]
        assert s.n_events == b.n
        assert math.isclose(s.total_value, b.tv, rel_tol=1e-9)
        assert s.last_ts == b.mx


def test_stream_upsert_sink_converges(spark, sf_dir, events_dir, tmp_path):
    """Streaming MERGE sink: the target converges to latest-per-(user,type)
    regardless of arrival batching."""
    from ffi_etl_spark.operators.windows import latest_per_key
    from ffi_etl_spark.streaming.events import stream_upsert_sink

    target = str(tmp_path / "user_state")
    stream_upsert_sink(
        stream_events(spark, events_dir),
        target,
        keys=["user_id", "event_type"],
        version_col="ts",
        checkpoint=str(tmp_path / "ckpt"),
    )
    got = {
        (r.user_id, r.event_type): r.value
        for r in spark.read.parquet(target).collect()
    }
    expected = {
        (r.user_id, r.event_type): r.value
        for r in latest_per_key(
            table(spark, sf_dir, "events"), ["user_id", "event_type"], ts_col="ts", id_col="ts"
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_stream_checkpoint_recovery_exactly_once(spark, sf_dir, tmp_path):
    """Kill/restart drains exactly-once: a file processed before the
    restart is never re-emitted, a file landed while down is picked up,
    and the union of epochs covers every input row exactly once."""
    from ffi_etl_spark.streaming.events import stream_to_parquet

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ev = table(spark, sf_dir, "events")
    total = ev.count()
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    first.write.mode("append").parquet(src)
    stream_to_parquet(stream_events(spark, src), sink, ckpt)
    n1 = spark.read.parquet(sink).count()
    assert n1 == first.count()

    # "crash": the first query object is gone; land more data and
    # restart from the same checkpoint.
    second.write.mode("append").parquet(src)
    stream_to_parquet(stream_events(spark, src), sink, ckpt)

    out = spark.read.parquet(sink)
    assert out.count() == total  # no re-emission of tranche 1
    assert out.select("event_id").distinct().count() == total

    # a third restart with no new data is a no-op
    stream_to_parquet(stream_events(spark, src), sink, ckpt)
    assert spark.read.parquet(sink).count() == total


def test_stream_sliding_matches_batch(spark, sf_dir, events_dir):
    from ffi_etl_spark.operators.windows import sliding_agg
    from ffi_etl_spark.streaming.events import stream_sliding_agg

    batch = sliding_agg(table(spark, sf_dir, "events"), "1 hour", "15 minutes")
    stream = run_to_memory(
        stream_sliding_agg(stream_events(spark, events_dir), "1 hour", "15 minutes"),
        output_mode="complete",
    )
    b = {(r.window_start, r.window_end): (r.n_events, r.total_value) for r in batch.collect()}
    s = {(r.window_start, r.window_end): (r.n_events, r.total_value) for r in stream.collect()}
    assert b == s and len(b) > 0


def test_continuous_aggregate_converges_incrementally(spark, sf_dir, tmp_path):
    """Hypertable-style continuous aggregate: two time-split arrival
    tranches maintained through the upsert sink converge to the batch
    rollup of all data — revised buckets are re-stated, closed buckets
    keep exactly one row."""
    from ffi_etl_spark.streaming.events import continuous_aggregate

    src = str(tmp_path / "src")
    target = str(tmp_path / "cagg")
    ckpt = str(tmp_path / "ckpt")
    ev = table(spark, sf_dir, "events")
    split_ts = ev.selectExpr("percentile_approx(ts, 0.5) p").collect()[0]["p"]
    # time-split (not hash-split) tranches: tranche 2 is never later
    # than the watermark the tranche-1 drain left behind
    ev.filter(F.col("ts") <= F.lit(split_ts)).write.mode("append").parquet(src)
    continuous_aggregate(
        stream_tumbling_agg(stream_events(spark, src), "1 hour"),
        target,
        bucket_keys=["window_start", "event_type"],
        checkpoint=ckpt,
    )
    n_after_first = spark.read.parquet(target).count()
    assert n_after_first > 0

    ev.filter(F.col("ts") > F.lit(split_ts)).write.mode("append").parquet(src)
    continuous_aggregate(
        stream_tumbling_agg(stream_events(spark, src), "1 hour"),
        target,
        bucket_keys=["window_start", "event_type"],
        checkpoint=ckpt,
    )

    batch = tumbling_agg(table(spark, sf_dir, "events"), "1 hour")
    b = {(r.window_start, r.event_type): (r.n_events, r.total_value) for r in batch.collect()}
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.read.parquet(target).collect()
    }
    assert got == b
    # exactly one row per bucket (the MERGE replaced, not appended)
    assert spark.read.parquet(target).count() == len(b)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicates arriving inside the lateness budget collapse to one
    row per key (the guaranteed direction of the contract)."""
    from ffi_etl_spark.streaming.events import stream_dedup_within_watermark

    rows = [
        Row(event_id=1, ts=datetime(2024, 1, 1, 10, 0), user_id=1, event_type="a", value=1.0, props=""),
        Row(event_id=1, ts=datetime(2024, 1, 1, 10, 5), user_id=1, event_type="a", value=1.0, props=""),
        Row(event_id=2, ts=datetime(2024, 1, 1, 10, 7), user_id=2, event_type="b", value=2.0, props=""),
        Row(event_id=2, ts=datetime(2024, 1, 1, 10, 9), user_id=2, event_type="b", value=2.0, props=""),
        Row(event_id=3, ts=datetime(2024, 1, 1, 11, 0), user_id=3, event_type="c", value=3.0, props=""),
    ]
    d = str(tmp_path / "dups")
    spark.createDataFrame(rows).write.parquet(d)
    out = run_to_memory(
        stream_dedup_within_watermark(stream_events(spark, d), keys=["event_id"])
    )
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3]


def test_stream_interval_join_matches_batch(spark, sf_dir, events_dir):
    """Stream-stream interval join (view -> click within 10 min, same
    user) equals the identical batch join expression."""
    from ffi_etl_spark.streaming.events import stream_interval_join

    src = stream_events(spark, events_dir)
    out = run_to_memory(
        stream_interval_join(
            src.filter(F.col("event_type") == "view"),
            src.filter(F.col("event_type") == "click"),
            within="10 minutes",
        )
    )
    ev = table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("l_event_id"), F.col("ts").alias("l_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("_rk"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    )
    batch = v.join(
        c,
        F.expr("user_id = _rk AND r_ts >= l_ts AND r_ts <= l_ts + INTERVAL 10 minutes"),
    )
    got = sorted((r.l_event_id, r.r_event_id) for r in out.collect())
    want = sorted((r.l_event_id, r.r_event_id) for r in batch.collect())
    assert got == want and len(got) > 0


def test_continuous_aggregate_drops_data_older_than_watermark(spark, tmp_path):
    """The state-eviction contract: a bucket already closed by the
    checkpointed watermark is NOT revised by later-arriving data (the
    lateness budget is the re-statement horizon, not forever)."""
    from ffi_etl_spark.streaming.events import continuous_aggregate

    src = str(tmp_path / "src")
    target = str(tmp_path / "cagg")
    ckpt = str(tmp_path / "ckpt")

    def land(rows):
        spark.createDataFrame(rows).write.mode("append").parquet(src)

    def drain():
        continuous_aggregate(
            stream_tumbling_agg(stream_events(spark, src), "1 hour", watermark="2 hours"),
            target,
            bucket_keys=["window_start", "event_type"],
            checkpoint=ckpt,
        )
        return {
            (r.window_start, r.event_type): r.n_events
            for r in spark.read.parquet(target).collect()
        }

    # tranche 1: one event at 10:00, one at 20:00 -> watermark ends at 18:00
    land([
        Row(event_id=1, ts=datetime(2024, 1, 1, 10, 0), user_id=1, event_type="a", value=1.0, props=""),
        Row(event_id=2, ts=datetime(2024, 1, 1, 20, 0), user_id=1, event_type="a", value=1.0, props=""),
    ])
    first = drain()
    assert first[(datetime(2024, 1, 1, 10, 0), "a")] == 1

    # tranche 2: a 10:30 straggler is 7.5h older than the watermark ->
    # its bucket is closed; a 19:30 row is inside the budget -> lands
    land([
        Row(event_id=3, ts=datetime(2024, 1, 1, 10, 30), user_id=1, event_type="a", value=1.0, props=""),
        Row(event_id=4, ts=datetime(2024, 1, 1, 19, 30), user_id=1, event_type="a", value=1.0, props=""),
    ])
    second = drain()
    assert second[(datetime(2024, 1, 1, 10, 0), "a")] == 1  # NOT revised to 2
    assert second[(datetime(2024, 1, 1, 19, 0), "a")] == 1  # accepted


def test_stream_dedup_ingest_builds_neardup_free_corpus(spark, tmp_path):
    """Continuous corpus construction (streaming/ingest.py): two
    drained micro-batches; batch-internal near-dup clusters collapse to
    their min id, batch-vs-corpus dups die, and the final corpus has NO
    near-dup pair at the threshold. The pairs audit records both kinds."""
    import json

    from ffi_etl_spark.operators.dedup import dedup_minhash_lsh
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    base = (
        "key agg row scan slow fast table value part hash value table part "
        "a row fast merge batch part value fast spark a a the line sort "
        "table window table table key join shuffle plan stage codegen "
        "broadcast exchange partition skew salt bucket probe build side "
    ) * 3
    uniq1 = "completely different content about rivers mountains weather " * 12
    uniq2 = "unrelated musical notation and chord progressions harmony " * 12

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    corpus_path = str(tmp_path / "corpus")
    pairs_path = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        with open(in_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def drain():
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(in_dir)
        )
        q = (
            stream_dedup_ingest(stream, corpus_path, pairs_path, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: 3 and 4 are near-dups of each other (keep 3); 1, 2 unique
    land(
        "b1.json",
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": uniq1},
            {"doc_id": 3, "text": uniq2},
            {"doc_id": 4, "text": uniq2 + "tiny tail change"},
        ],
    )
    drain()
    got1 = {r.doc_id for r in spark.read.parquet(corpus_path).collect()}
    assert got1 == {1, 2, 3}

    # batch 2: 5 near-dups corpus doc 1 (dies), 6 unique (survives),
    # 7 near-dups 6 within the batch (dies — 6 is canonical)
    extra = "entirely novel astronomy telescopes and planetary orbits data " * 12
    land(
        "b2.json",
        [
            {"doc_id": 5, "text": base + "small suffix drift"},
            {"doc_id": 6, "text": extra},
            {"doc_id": 7, "text": extra + "minor trailing edit"},
        ],
    )
    drain()
    corpus = spark.read.parquet(corpus_path)
    assert {r.doc_id for r in corpus.collect()} == {1, 2, 3, 6}

    # the invariant the operator exists for: the corpus is near-dup free
    assert dedup_minhash_lsh(corpus).count() == 0

    pairs = spark.read.parquet(pairs_path)
    kinds = {(r.pair_type) for r in pairs.collect()}
    assert "new_new" in kinds  # 3~4 and 6~7
    assert "new_old" in kinds  # 5~1


def test_stream_dedup_ingest_replay_is_corpus_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-draining the SAME input with a
    fresh checkpoint (a full replay) must not re-append survivors or
    poison the stream via the incremental tier's disjointness guard."""
    import json

    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    corpus_path = str(tmp_path / "corpus")
    pairs_path = str(tmp_path / "pairs")
    with open(in_dir / "b1.json", "w") as f:
        for i, txt in enumerate(
            ["alpha beta gamma delta " * 30, "totally different words here " * 30]
        ):
            f.write(json.dumps({"doc_id": i, "text": txt}) + "\n")

    def drain(ckpt):
        stream = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
        q = (
            stream_dedup_ingest(stream, corpus_path, pairs_path, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain(str(tmp_path / "ckpt1"))
    first = sorted(r.doc_id for r in spark.read.parquet(corpus_path).collect())
    assert first == [0, 1]
    # replay: fresh checkpoint, same files — corpus must not change
    drain(str(tmp_path / "ckpt2"))
    again = sorted(r.doc_id for r in spark.read.parquet(corpus_path).collect())
    assert again == [0, 1]


def test_stream_dedup_ingest_with_signature_state(spark, tmp_path):
    """sigs_path mode: same corpus outcome as the recompute mode on the
    two-batch scenario, the signature state stays 1:1 with the corpus,
    and a wiped signature table self-heals via the reconcile step."""
    import json

    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    base = (
        "key agg row scan slow fast table value part hash value table part "
        "a row fast merge batch part value fast spark a a the line sort "
    ) * 4
    uniq = "completely different content about rivers mountains weather " * 12
    extra = "entirely novel astronomy telescopes and planetary orbits data " * 12

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    corpus_path = str(tmp_path / "corpus")
    pairs_path = str(tmp_path / "pairs")
    sigs_path = str(tmp_path / "sigs")

    def land(name, rows):
        with open(in_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def drain(ckpt):
        stream = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
        q = (
            stream_dedup_ingest(
                stream, corpus_path, pairs_path, ckpt, sigs_path=sigs_path
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    land("b1.json", [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": uniq},
        {"doc_id": 3, "text": uniq + "tiny tail change"},  # dies vs 2 (new_new)
    ])
    drain(str(tmp_path / "c1"))
    assert {r.doc_id for r in spark.read.parquet(corpus_path).collect()} == {1, 2}
    sig_ids = {r.doc_id for r in spark.read.parquet(sigs_path).select("doc_id").collect()}
    assert sig_ids == {1, 2}  # state tracks the corpus exactly

    land("b2.json", [
        {"doc_id": 5, "text": base + "small suffix drift"},  # dies vs corpus 1
        {"doc_id": 6, "text": extra},                        # survives
    ])
    drain(str(tmp_path / "c2"))
    assert {r.doc_id for r in spark.read.parquet(corpus_path).collect()} == {1, 2, 6}
    sig_ids = {r.doc_id for r in spark.read.parquet(sigs_path).select("doc_id").collect()}
    assert sig_ids == {1, 2, 6}

    # crash simulation: signature state lost after corpus rows landed —
    # the next drain's reconcile must rebuild it before deduping
    import shutil

    shutil.rmtree(sigs_path)
    land("b3.json", [
        {"doc_id": 7, "text": extra + "minor trailing edit"},  # dies vs 6
        {"doc_id": 8, "text": "fresh topic entirely about oceanic currents " * 12},
    ])
    drain(str(tmp_path / "c3"))
    assert {r.doc_id for r in spark.read.parquet(corpus_path).collect()} == {1, 2, 6, 8}
    sig_ids = {r.doc_id for r in spark.read.parquet(sigs_path).select("doc_id").collect()}
    assert sig_ids == {1, 2, 6, 8}  # healed + extended


def test_stream_static_enrich_matches_batch(spark, sf_dir, events_dir):
    """Stream-static decoration: every micro-batch row carries the
    static customer attributes; equals the batch join, keeps orphans."""
    from pyspark.sql import functions as F

    from ffi_etl_spark.streaming.events import stream_static_enrich

    dim = table(spark, sf_dir, "customer")
    cols = ["c_mktsegment", "c_nationkey"]
    stream = run_to_memory(
        stream_static_enrich(
            stream_events(spark, events_dir), dim, dim_cols=cols
        ),
        output_mode="append",
    )
    batch = (
        table(spark, sf_dir, "events")
        .join(
            F.broadcast(dim.select("c_custkey", *cols)),
            F.col("user_id") == F.col("c_custkey"),
            "left",
        )
        .drop("c_custkey")
    )
    key = lambda r: (r.event_id, r.c_mktsegment, r.c_nationkey)  # noqa: E731
    s = sorted(key(r) for r in stream.collect())
    b = sorted(key(r) for r in batch.collect())
    assert s == b and len(s) == table(spark, sf_dir, "events").count()
    # the dimension actually decorated rows (all users resolve)
    assert all(r[1] is not None for r in s)


def test_stream_tumbling_distinct_matches_batch(spark, sf_dir, events_dir):
    """HLL++ register merges are commutative: the streaming windowed
    approx-distinct equals the batch aggregate exactly."""
    from pyspark.sql import functions as F

    from ffi_etl_spark.streaming.events import stream_tumbling_distinct

    stream = run_to_memory(
        stream_tumbling_distinct(stream_events(spark, events_dir), "1 hour"),
        output_mode="complete",
    )
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
        .select(F.col("w.start").alias("window_start"), "approx_users")
    )
    s = {(r.window_start, r.approx_users) for r in stream.collect()}
    b = {(r.window_start, r.approx_users) for r in batch.collect()}
    assert s == b and len(s) > 0


def _profile_agg(df):
    cents = F.floor(F.col("value") * 100).cast("long")
    return df.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("value_cents"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )


_PROFILE_SPEC = {
    "n_events": "sum",
    "value_cents": "sum",
    "value_min": "min",
    "value_max": "max",
}
_PROFILE_KEYS = ["user_id", "event_type"]


def test_stream_profile_merge_matches_batch(spark, sf_dir, tmp_path):
    """Streaming IVM: two arrival tranches merged via per-batch partial
    aggregates converge to the direct aggregate of all facts — history
    is never rescanned, only merged."""
    from ffi_etl_spark.streaming.events import stream_events
    from ffi_etl_spark.streaming.profile import stream_profile_merge

    src = str(tmp_path / "src")
    target = str(tmp_path / "profile")
    ckpt = str(tmp_path / "ckpt")
    ev = table(spark, sf_dir, "events")
    split_ts = ev.selectExpr("percentile_approx(ts, 0.5) p").collect()[0]["p"]
    ev.filter(F.col("ts") <= F.lit(split_ts)).write.mode("append").parquet(src)
    stream_profile_merge(
        stream_events(spark, src), target, ckpt, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC
    )
    assert spark.read.parquet(target).count() > 0

    ev.filter(F.col("ts") > F.lit(split_ts)).write.mode("append").parquet(src)
    stream_profile_merge(
        stream_events(spark, src), target, ckpt, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC
    )

    key = lambda r: (r.user_id, r.event_type)  # noqa: E731
    direct = {key(r): (r.n_events, r.value_cents, r.value_min, r.value_max) for r in _profile_agg(ev).collect()}
    got = {
        key(r): (r.n_events, r.value_cents, r.value_min, r.value_max)
        for r in spark.read.parquet(target).drop("_merged_through_batch").collect()
    }
    assert got == direct
    # one row per group, ledger column present and monotone
    t = spark.read.parquet(target)
    assert t.count() == len(direct)
    assert t.select(F.max("_merged_through_batch")).collect()[0][0] >= 1


def test_stream_profile_merge_replay_is_skipped(spark, sf_dir, tmp_path):
    """The ledger makes the non-idempotent merge exactly-once: replaying
    an already-merged batch id is a no-op (sums do NOT double)."""
    from ffi_etl_spark.streaming.profile import merge_batch_into_profile

    target = str(tmp_path / "profile")
    ev = table(spark, sf_dir, "events").limit(200)
    assert merge_batch_into_profile(ev, 0, target, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC)
    first = sorted(map(tuple, spark.read.parquet(target).collect()))
    # crash-after-landing replay: same batch id arrives again
    assert not merge_batch_into_profile(ev, 0, target, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC)
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == first
    # the NEXT batch id does merge
    assert merge_batch_into_profile(ev, 1, target, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC)
    doubled = {
        (r.user_id, r.event_type): r.n_events
        for r in spark.read.parquet(target).collect()
    }
    base = {
        (r.user_id, r.event_type): r.n_events
        for r in _profile_agg(ev).collect()
    }
    assert doubled == {k: 2 * v for k, v in base.items()}


def test_stream_profile_merge_fresh_checkpoint_fails_loudly(spark, sf_dir, tmp_path):
    """A fresh checkpoint restarts batch ids at 0 while the source
    replays everything — merging into an existing table would
    double-count all history, so the app-scoped ledger raises."""
    import pytest as _pytest

    from ffi_etl_spark.streaming.profile import merge_batch_into_profile

    target = str(tmp_path / "profile")
    ev = table(spark, sf_dir, "events").limit(50)
    assert merge_batch_into_profile(
        ev, 0, target, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC, app_id="ckpt-A"
    )
    with _pytest.raises(ValueError, match="double-count"):
        merge_batch_into_profile(
            ev, 0, target, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC, app_id="ckpt-B"
        )
    # the original app keeps working (replay skipped, next id merges)
    assert not merge_batch_into_profile(
        ev, 0, target, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC, app_id="ckpt-A"
    )
    assert merge_batch_into_profile(
        ev, 1, target, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC, app_id="ckpt-A"
    )


def test_stream_profile_merge_recovers_torn_commit(spark, sf_dir, tmp_path):
    """Both torn-commit states are recovered on the next call: (a)
    table shunted aside but new not moved in → old table restored and
    the batch re-merges; (b) new moved in but old not dropped → old
    cleared, replay skipped via ledger."""
    import os
    import shutil

    from ffi_etl_spark.streaming.profile import merge_batch_into_profile

    target = str(tmp_path / "profile")
    ev = table(spark, sf_dir, "events").limit(50)
    merge_batch_into_profile(ev, 0, target, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC)
    good = sorted(map(tuple, spark.read.parquet(target).collect()))

    # (a) crash between aside-rename and replace: target missing, old present
    os.rename(target, target + ".__ivm_old__")
    assert merge_batch_into_profile(
        ev, 1, target, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC
    )
    assert not os.path.exists(target + ".__ivm_old__")
    after = {
        (r.user_id, r.event_type): r.n_events for r in spark.read.parquet(target).collect()
    }
    base = {(r.user_id, r.event_type): r.n_events for r in _profile_agg(ev).collect()}
    assert after == {k: 2 * v for k, v in base.items()}  # batch 0 + batch 1, no loss

    # (b) crash between replace and cleanup: both target and old present
    shutil.copytree(target, target + ".__ivm_old__")
    assert not merge_batch_into_profile(  # batch 1 replay: ledger skips it
        ev, 1, target, _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC
    )
    assert not os.path.exists(target + ".__ivm_old__")
    assert good is not None


def test_stream_quantile_summary_within_band_and_idempotent(spark, sf_dir, tmp_path):
    """Streamed per-batch summary parts answer quantiles within the
    k x parts band of the exact rank, and replaying the stream (fresh
    checkpoint, same batches) leaves the table byte-identical —
    partition-overwrite idempotence, no ledger needed."""
    from ffi_etl_spark.streaming.events import stream_events
    from ffi_etl_spark.streaming.summaries import (
        quantiles_from_stream_summary,
        read_summary_parts,
        stream_quantile_summary,
    )

    src = str(tmp_path / "src")
    target = str(tmp_path / "summary")
    ev = table(spark, sf_dir, "events").select("event_id", "value")
    split = ev.selectExpr("percentile_approx(event_id, 0.5) p").collect()[0]["p"]
    ev.filter(F.col("event_id") <= split).write.mode("append").parquet(src)
    stream_quantile_summary(
        stream_events(spark, src), target, str(tmp_path / "ck1"), k=16, n_shards=4
    )
    ev.filter(F.col("event_id") > split).write.mode("append").parquet(src)
    stream_quantile_summary(
        stream_events(spark, src), target, str(tmp_path / "ck1"), k=16, n_shards=4
    )

    parts = read_summary_parts(spark, target)
    n_parts = parts.select("batch", "shard").distinct().count()
    assert parts.select("batch").distinct().count() >= 2

    total = ev.agg(F.count(F.lit(1)).cast("long").alias("n"))
    res = quantiles_from_stream_summary(
        spark, target, total, [0.5, 0.9], k=16
    ).collect()
    for r in res:
        true_rank = ev.where(
            (F.col("value") < r["est_value"])
            | ((F.col("value") == r["est_value"]) & (F.col("event_id") <= r["est_id"]))
        ).count()
        assert abs(true_rank - r["target_rank"]) <= 16 * n_parts

    # simulate the at-least-once window: drop the latest commit marker
    # so a restart from the SAME checkpoint re-processes that batch
    # (same batch id, same file set) — the rewrite lands on the same
    # batch=<id> directory and the table is unchanged
    import os

    before = sorted(
        (r["batch"], r["shard"], r["value"], r["event_id"], r["shard_rank"])
        for r in parts.collect()
    )
    commits = sorted(
        f for f in os.listdir(str(tmp_path / "ck1" / "commits")) if f.isdigit()
    )
    os.remove(str(tmp_path / "ck1" / "commits" / commits[-1]))
    crc = str(tmp_path / "ck1" / "commits" / f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    stream_quantile_summary(
        stream_events(spark, src), target, str(tmp_path / "ck1"), k=16, n_shards=4
    )
    after = sorted(
        (r["batch"], r["shard"], r["value"], r["event_id"], r["shard_rank"])
        for r in read_summary_parts(spark, target).collect()
    )
    assert after == before


def test_stream_summary_compaction_preserves_answers(spark, sf_dir, tmp_path):
    """Compacting the accumulated parts into one coarse part keeps
    quantile answers inside the widened band k(parts-1) + k*stride,
    collapses the part count to 1, and is replay-idempotent
    (overwrite of derived data)."""
    from ffi_etl_spark.operators.sketches import quantile_summary_query
    from ffi_etl_spark.streaming.events import stream_events
    from ffi_etl_spark.streaming.summaries import (
        compact_stream_summary,
        read_summary_parts,
        stream_quantile_summary,
    )

    src = str(tmp_path / "src")
    target = str(tmp_path / "summary")
    k, stride = 16, 4
    ev = table(spark, sf_dir, "events").select("event_id", "value")
    split = ev.selectExpr("percentile_approx(event_id, 0.5) p").collect()[0]["p"]
    ev.filter(F.col("event_id") <= split).write.mode("append").parquet(src)
    stream_quantile_summary(
        stream_events(spark, src), target, str(tmp_path / "ck1"), k=k, n_shards=4
    )
    ev.filter(F.col("event_id") > split).write.mode("append").parquet(src)
    stream_quantile_summary(
        stream_events(spark, src), target, str(tmp_path / "ck1"), k=k, n_shards=4
    )
    n_parts = read_summary_parts(spark, target).select("batch", "shard").distinct().count()

    out = compact_stream_summary(spark, target, k=k, stride=stride)
    comp = spark.read.parquet(out)
    assert comp.select("part").distinct().count() == 1
    # compacted is strictly smaller than the union of parts
    assert comp.count() < read_summary_parts(spark, target).count()

    total = ev.agg(F.count(F.lit(1)).cast("long").alias("n"))
    res = quantile_summary_query(
        comp, total, [0.5, 0.9], k=k, part_cols=("part",)
    ).collect()
    band = k * (n_parts - 1) + k * stride
    for r in res:
        true_rank = ev.where(
            (F.col("value") < r["est_value"])
            | ((F.col("value") == r["est_value"]) & (F.col("event_id") <= r["est_id"]))
        ).count()
        assert abs(true_rank - r["target_rank"]) <= band

    # idempotence: recompacting yields the identical table
    before = sorted(map(tuple, comp.collect()))
    compact_stream_summary(spark, target, k=k, stride=stride)
    after = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert after == before
    spark.catalog.clearCache()


def test_stream_join_maintenance_tracks_dim_edits(spark, tmp_path):
    """Fact micro-batches + an in-place dim edit between triggers:
    the maintained join must equal a full recompute against the
    CURRENT dim after every trigger, without rescanning fact history."""
    from ffi_etl_spark.streaming.events import stream_join_maintenance

    src = str(tmp_path / "facts")
    dimp = str(tmp_path / "dim")
    target = str(tmp_path / "joined")
    ck = str(tmp_path / "ck")

    dim1 = spark.createDataFrame([(10, "a"), (20, "b")], "k long, attr string")
    dim1.write.mode("overwrite").parquet(dimp)
    spark.createDataFrame([(1, 10), (2, 20)], "fid long, k long").write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("fid long, k long").parquet(src)
    )
    stream_join_maintenance(stream, dimp, target, keys=["k"], checkpoint=ck)
    got1 = sorted(
        (r["fid"], r["k"], r["attr"]) for r in spark.read.parquet(target).collect()
    )
    assert got1 == [(1, 10, "a"), (2, 20, "b")]

    # edit the dim in place (10 -> a2, 20 deleted, 30 added) and land
    # a second fact tranche
    spark.createDataFrame(
        [(10, "a2"), (30, "c")], "k long, attr string"
    ).write.mode("overwrite").parquet(dimp)
    spark.createDataFrame([(3, 10), (4, 30)], "fid long, k long").write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema("fid long, k long").parquet(src)
    stream_join_maintenance(stream, dimp, target, keys=["k"], checkpoint=ck)
    got2 = sorted(
        (r["fid"], r["k"], r["attr"]) for r in spark.read.parquet(target).collect()
    )
    # full recompute: all facts x current dim (inner join drops k=20)
    assert got2 == [(1, 10, "a2"), (3, 10, "a2"), (4, 30, "c")]


def _join_rows(spark, target):
    return sorted(
        (r["fid"], r["k"], r["attr"]) for r in spark.read.parquet(target).collect()
    )


def test_merge_join_batch_replay_is_skipped(spark, tmp_path):
    """A blind union is not replay-idempotent even with distinct fact
    keys — the (app_id, batch_id) ledger must make an already-merged
    batch a no-op instead of appending duplicates (ADVICE r05)."""
    from ffi_etl_spark.streaming.events import merge_join_batch

    dimp = str(tmp_path / "dim")
    target = str(tmp_path / "joined")
    spark.createDataFrame([(10, "a"), (20, "b")], "k long, attr string").write.parquet(dimp)
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "fid long, k long")

    assert merge_join_batch(b0, 0, dimp, target, ["k"], app_id="ck")
    first = _join_rows(spark, target)
    # crash-after-landing replay of batch 0: must be skipped, no dup rows
    assert not merge_join_batch(b0, 0, dimp, target, ["k"], app_id="ck")
    assert _join_rows(spark, target) == first
    # next batch id merges
    b1 = spark.createDataFrame([(3, 10)], "fid long, k long")
    assert merge_join_batch(b1, 1, dimp, target, ["k"], app_id="ck")
    assert _join_rows(spark, target) == [(1, 10, "a"), (2, 20, "b"), (3, 10, "a")]
    # fresh checkpoint (new app) against the existing table fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="double-count history"):
        merge_join_batch(b1, 0, dimp, target, ["k"], app_id="ck-NEW")


def test_merge_ledger_guards_pre_ledger_and_unowned_tables(spark, tmp_path):
    """ADVICE r06: (a) a maintained table written by the pre-ledger
    protocol (no _merged_through_batch/_ledger_app_id columns) raises a
    migration message, not an unresolved-column AnalysisException; (b)
    a table first written with app_id=None is UNOWNED — an owned stream
    resuming onto it must be rejected unless adopt_unowned=True."""
    import pytest

    from ffi_etl_spark.streaming.events import merge_join_batch
    from ffi_etl_spark.streaming.profile import merge_batch_into_profile

    dimp = str(tmp_path / "dim")
    spark.createDataFrame([(10, "a")], "k long, attr string").write.parquet(dimp)
    b0 = spark.createDataFrame([(1, 10)], "fid long, k long")

    # (a) pre-ledger table: plain joined rows, no ledger columns
    legacy = str(tmp_path / "legacy")
    spark.createDataFrame(
        [(1, 10, "a")], "fid long, k long, attr string"
    ).write.parquet(legacy)
    with pytest.raises(ValueError, match="pre-ledger"):
        merge_join_batch(b0, 1, dimp, legacy, ["k"], app_id="ck")

    profile_legacy = str(tmp_path / "plegacy")
    spark.createDataFrame([(1, "x", 2)], "user_id long, event_type string, n_events long").write.parquet(profile_legacy)
    with pytest.raises(ValueError, match="pre-ledger"):
        merge_batch_into_profile(
            table(spark, "/root/testdata/sf0.001", "events").limit(10), 1, profile_legacy,
            _PROFILE_KEYS, _profile_agg, _PROFILE_SPEC, app_id="ck",
        )

    # (b) unowned table (app_id=None history) + owned resume
    target = str(tmp_path / "joined")
    assert merge_join_batch(b0, 0, dimp, target, ["k"])  # unowned write
    with pytest.raises(ValueError, match="no recorded owner"):
        merge_join_batch(b0, 1, dimp, target, ["k"], app_id="ck")
    # explicit adoption is allowed, and the table is owned from then on
    b1 = spark.createDataFrame([(2, 10)], "fid long, k long")
    assert merge_join_batch(
        b1, 1, dimp, target, ["k"], app_id="ck", adopt_unowned=True
    )
    with pytest.raises(ValueError, match="double-count history"):
        merge_join_batch(b1, 2, dimp, target, ["k"], app_id="ck-OTHER")


def test_merge_ledger_empty_first_commit_does_not_poison_owner(spark, tmp_path):
    """A first batch whose join is legitimately empty commits a
    zero-row table; its ledger max() is NULL-over-no-rows, which must
    NOT read as 'unowned with history' — the same owned stream resumes
    normally on batch 1 (review finding on the r7 unowned guard)."""
    from ffi_etl_spark.streaming.events import merge_join_batch

    dimp = str(tmp_path / "dim")
    spark.createDataFrame([(10, "a")], "k long, attr string").write.parquet(dimp)
    no_match = spark.createDataFrame([(1, 99)], "fid long, k long")

    target = str(tmp_path / "joined")
    assert merge_join_batch(no_match, 0, dimp, target, ["k"], app_id="ck")
    assert spark.read.parquet(target).count() == 0  # empty commit landed
    b1 = spark.createDataFrame([(2, 10)], "fid long, k long")
    assert merge_join_batch(b1, 1, dimp, target, ["k"], app_id="ck")
    assert spark.read.parquet(target).count() == 1


def test_merge_join_batch_recovers_torn_commit(spark, tmp_path):
    """Both torn states of the aside→replace→drop swap recover at the
    next batch: aside-not-replaced restores the table (no history
    loss — the old rmtree-then-move protocol lost it, ADVICE r05);
    replaced-not-dropped clears the leftover and the ledger skips."""
    import os
    import shutil

    from ffi_etl_spark.streaming.events import merge_join_batch

    dimp = str(tmp_path / "dim")
    target = str(tmp_path / "joined")
    spark.createDataFrame([(10, "a")], "k long, attr string").write.parquet(dimp)
    b0 = spark.createDataFrame([(1, 10)], "fid long, k long")
    merge_join_batch(b0, 0, dimp, target, ["k"], app_id="ck")

    # (a) crash between aside and replace: target missing, old present —
    # batch 1 must see the RESTORED history, not rebuild from itself
    os.rename(target, target + ".__ivm_old__")
    b1 = spark.createDataFrame([(2, 10)], "fid long, k long")
    assert merge_join_batch(b1, 1, dimp, target, ["k"], app_id="ck")
    assert not os.path.exists(target + ".__ivm_old__")
    assert _join_rows(spark, target) == [(1, 10, "a"), (2, 10, "a")]

    # (b) crash between replace and cleanup: both present — old cleared,
    # replayed batch 1 skipped via ledger
    shutil.copytree(target, target + ".__ivm_old__")
    assert not merge_join_batch(b1, 1, dimp, target, ["k"], app_id="ck")
    assert not os.path.exists(target + ".__ivm_old__")
    assert _join_rows(spark, target) == [(1, 10, "a"), (2, 10, "a")]


def test_local_target_strips_file_scheme(spark, tmp_path):
    """A blessed file:// target must WORK: the guard previously let the
    URI through to os.path/shutil, where exists('file:///...') is
    always False — first batch crashed at shutil.move and an existing
    profile read as absent (ADVICE r05). Now the scheme is stripped so
    os and Spark agree on the location; non-local schemes still raise."""
    import os

    import pytest as _pytest

    from ffi_etl_spark.streaming.events import merge_join_batch
    from ffi_etl_spark.streaming.profile import _local_target

    assert _local_target("file:///x/y", "t") == "/x/y"
    assert _local_target("file:/x/y", "t") == "/x/y"
    assert _local_target("/x/y", "t") == "/x/y"
    with _pytest.raises(ValueError, match="s3a://"):
        _local_target("s3a://bucket/t", "t")
    with _pytest.raises(ValueError, match="remote host"):
        _local_target("file://nfs-box/t", "t")

    dimp = str(tmp_path / "dim")
    target_plain = str(tmp_path / "joined")
    target_uri = "file://" + target_plain
    spark.createDataFrame([(10, "a")], "k long, attr string").write.parquet(dimp)
    b0 = spark.createDataFrame([(1, 10)], "fid long, k long")
    assert merge_join_batch(b0, 0, dimp, target_uri, ["k"], app_id="ck")
    assert os.path.exists(target_plain)
    # second batch sees the existing table through the URI form too
    b1 = spark.createDataFrame([(2, 10)], "fid long, k long")
    assert merge_join_batch(b1, 1, dimp, target_uri, ["k"], app_id="ck")
    assert _join_rows(spark, target_plain) == [(1, 10, "a"), (2, 10, "a")]
