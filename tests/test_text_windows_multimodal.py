"""Unit tests: text stats, language ID, event windows, multimodal plumbing."""

import hashlib
from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from ffi_etl_spark.operators.multimodal import attach_binary_payload, extract_features
from ffi_etl_spark.operators.textops import detect_language, text_stats
from ffi_etl_spark.operators.windows import (
    latest_per_key,
    resample_locf,
    sessionize,
    tumbling_agg,
)


def test_text_stats_counts(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="Hello, world! The answer is 42.")])
    r = text_stats(df).collect()[0]
    assert r.n_chars == 31
    assert r.n_tokens_ws == 6
    # Hello , world ! The answer is 42 .  -> 9 BPE-ish pre-tokens
    assert r.n_tokens_bpe == 9
    assert 0 <= r.quality_score <= 1


def test_lang_id_votes(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat and the dog of the house is here"),
            Row(doc_id=1, text="el perro y la casa de los gatos"),
            Row(doc_id=2, text="zzz qqq www"),
        ]
    )
    out = {r.doc_id: r.lang_pred for r in detect_language(df).collect()}
    assert out == {0: "en", 1: "es", 2: "und"}


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, user_id=u, ts=datetime(2024, 1, 1, h, m), event_type=t, value=1.0)
         for i, (u, h, m, t) in enumerate(rows)]
    )


def test_sessionize_gap(spark):
    # user 1: events at 10:00, 10:10 (same session), 11:30 (new session: 80min gap)
    ev = _events(spark, [(1, 10, 0, "a"), (1, 10, 10, "a"), (1, 11, 30, "a"), (2, 10, 0, "b")])
    out = {(r.user_id, r.session_id): r.n_events for r in sessionize(ev).collect()}
    assert out == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_tumbling_agg_hours(spark):
    ev = _events(spark, [(1, 10, 5, "x"), (1, 10, 55, "x"), (1, 11, 5, "x")])
    out = tumbling_agg(ev, "1 hour").collect()
    by_start = {r.window_start.hour: r.n_events for r in out}
    assert by_start == {10: 2, 11: 1}
    assert all(r.window_end.hour == r.window_start.hour + 1 for r in out)


def test_resample_locf_gapfill(spark):
    # user 1 observes at 10:00 (value via _events is 1.0) and 13:00;
    # hours 11 and 12 must exist in the grid and carry the 10:00 value
    # forward. Two events inside hour 13 -> the later one wins.
    from datetime import datetime as dt

    rows = [
        Row(event_id=1, user_id=1, ts=dt(2024, 1, 1, 10, 5), event_type="a", value=10.0),
        Row(event_id=2, user_id=1, ts=dt(2024, 1, 1, 13, 1), event_type="a", value=20.0),
        Row(event_id=3, user_id=1, ts=dt(2024, 1, 1, 13, 40), event_type="a", value=30.0),
        Row(event_id=4, user_id=2, ts=dt(2024, 1, 1, 10, 0), event_type="a", value=99.0),
    ]
    out = resample_locf(spark.createDataFrame(rows))
    got = {(r.user_id, r.hour.hour): r.value_locf for r in out.collect()}
    assert got == {
        (1, 10): 10.0,
        (1, 11): 10.0,  # gap-filled
        (1, 12): 10.0,  # gap-filled
        (1, 13): 30.0,  # latest event in the hour wins
        (2, 10): 99.0,
    }


def test_latest_per_key_deterministic(spark):
    ev = _events(spark, [(1, 10, 0, "x"), (1, 12, 0, "x"), (1, 11, 0, "x")])
    out = latest_per_key(ev, ["user_id", "event_type"]).collect()
    assert len(out) == 1 and out[0].ts.hour == 12


def test_multimodal_features_deterministic(spark):
    text = "hello multimodal"
    df = spark.createDataFrame([Row(doc_id=7, text=text)])
    r = extract_features(attach_binary_payload(df)).collect()[0]
    payload = text.encode()
    assert r.doc_id == 7
    assert r.byte_len == len(payload)
    assert r.sha256 == hashlib.sha256(payload).hexdigest()
    assert 1 <= r.fake_width <= 640 and 1 <= r.fake_height <= 480


def test_multimodal_resize_and_frames(spark):
    import hashlib

    from ffi_etl_spark.operators.multimodal import resize_images, sample_frames

    text = "x" * 600  # 3 frames of 256/256/88 chars, every 2nd kept -> idx 0, 2
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    rz = resize_images(attach_binary_payload(df)).collect()[0]
    assert (rz.out_width, rz.out_height) == (224, 224)
    assert rz.resized_sha == hashlib.sha256(text.encode() + b"224x224").hexdigest()

    frames = {r.frame_idx: r for r in sample_frames(df).collect()}
    assert set(frames) == {0, 2}
    assert frames[0].frame_chars == 256 and frames[2].frame_chars == 88

    empty = sample_frames(spark.createDataFrame([Row(doc_id=2, text="")])).collect()
    assert len(empty) == 1 and empty[0].frame_chars == 0


def test_session_window_splits_at_exact_gap(spark):
    """Boundary lock: native session_window's merge is INCLUSIVE — an
    event exactly gap seconds after the previous one merges into the
    same session (matching sessionize's strict-> split rule), and one
    past the gap splits."""
    from pyspark.sql import functions as F

    rows = [
        (1, 1, "2024-01-01 00:00:00"),
        (1, 2, "2024-01-01 00:30:00"),   # exactly 30min later -> merges
        (1, 3, "2024-01-01 01:00:01"),   # 30:01 after #2 -> new session
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_s string").select(
        "user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    sess = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").cast("string").alias("s"), "n")
        .collect()
    )
    got = sorted((r.s, r.n) for r in sess)
    assert got == [("2024-01-01 00:00:00", 2), ("2024-01-01 01:00:01", 1)]


def test_multimodal_arrow_matches_pandas(spark):
    """The mapInArrow feature lane must be row-for-row identical to the
    mapInPandas lane (same decode, no boxing differences)."""
    from ffi_etl_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
        extract_features_arrow,
    )
    from ffi_etl_spark.catalog import table

    docs = attach_binary_payload(table(spark, "/root/testdata/sf0.001", "documents"))
    a = sorted(tuple(r) for r in extract_features(docs).collect())
    b = sorted(tuple(r) for r in extract_features_arrow(docs).collect())
    assert a == b and len(a) > 0


def test_multimodal_custom_id_col_keeps_name_and_type(spark):
    """ADVICE r02: a non-default id_col must keep its name AND Spark
    type in the output of both feature lanes (previously hardcoded to
    'doc_id long')."""
    from ffi_etl_spark.operators.multimodal import (
        extract_features,
        extract_features_arrow,
    )

    df = spark.createDataFrame(
        [("img-1", b"abc"), ("img-2", b"defg")], "asset_id string, payload binary"
    )
    for lane in (extract_features, extract_features_arrow):
        out = lane(df, id_col="asset_id")
        assert out.schema["asset_id"].dataType.simpleString() == "string"
        got = {r.asset_id: r.byte_len for r in out.collect()}
        assert got == {"img-1": 3, "img-2": 4}


def test_chunk_udtf_matches_native(spark):
    """The Python-UDTF chunker must be row-for-row identical to the
    native chunk_documents operator over the real corpus (LATERAL
    table-function lane vs codegen explode lane)."""
    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.functions.udtfs import ChunkUdtf
    from ffi_etl_spark.operators.textops import chunk_documents

    corpus = table(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    # whitespace edges where Python and Java semantics diverge unless
    # the UDTF mirrors Spark exactly: tab (Spark trim keeps, Python
    # strip() would eat), NBSP (Python \s splits, Java \s does not),
    # empty/NULL text, internal \n and \x0b
    edges = spark.createDataFrame(
        [(100001, "\tfoo bar"), (100002, "a b"), (100003, "  x  "),
         (100004, ""), (100005, None), (100006, "a\nb\x0bc")],
        "doc_id long, text string",
    )
    docs = corpus.unionByName(edges)
    native = chunk_documents(docs, chunk_tokens=16, stride=8)

    spark.udtf.register("chunk_doc_udtf", ChunkUdtf)
    docs.createOrReplaceTempView("_udtf_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM _udtf_docs d, LATERAL chunk_doc_udtf(d.text, 16, 8) c
        """
    )
    a = sorted(map(tuple, native.collect()))
    b = sorted(map(tuple, via_udtf.collect()))
    assert len(a) > 500 and a == b


def test_phash_pairs_catch_planted_neardups(spark):
    """Near-identical payloads land within Hamming<=3 and pair up;
    unrelated payloads don't. Pigeonhole banding must not miss any
    pair the exact verify accepts (subset check vs brute force)."""
    from ffi_etl_spark.operators.multimodal import (
        ahash_signatures,
        attach_binary_payload,
        phash_neardup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 12
    rows = [
        (1, base),
        (2, base[:-6] + "cat 42"),     # tail edit -> few sample flips
        (3, "completely different content stream " * 14),
        (4, base.replace("quick", "quack")),  # tiny mid edit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = ahash_signatures(attach_binary_payload(df))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(sigs).collect()
    }
    assert (1, 4) in pairs or (1, 2) in pairs  # at least one planted pair
    assert all(3 not in k for k in pairs)       # the unrelated doc never pairs
    # banding never admits a pair the verify rejects
    assert all(h <= 3 for h in pairs.values())
    # brute-force subset: every Hamming<=3 pair is found (pigeonhole)
    sl = {r["doc_id"]: r["ahash"] for r in sigs.collect()}
    import itertools
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(sl), 2)
        if bin(sl[a] ^ sl[b]).count("1") <= 3
    }
    assert set(pairs) == want
