

def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.sources.readers import read_orc

    nat = table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation_orc")
    nat.write.orc(p)
    back = read_orc(spark, p)
    assert back.schema == nat.schema
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in nat.collect()
    )


def test_binary_file_source_feeds_multimodal(spark, tmp_path):
    """binaryFile ingest -> rename to the multimodal payload shape ->
    Arrow-batched feature extraction, end to end on real files."""
    import hashlib

    from pyspark.sql import functions as F

    from ffi_etl_spark.operators.multimodal import extract_features
    from ffi_etl_spark.sources.readers import read_binary_files

    blobs = {f"img_{i}.bin": bytes([i] * (100 + i)) for i in range(5)}
    (tmp_path / "media").mkdir()
    for name, data in blobs.items():
        (tmp_path / "media" / name).write_bytes(data)
    (tmp_path / "media" / "ignore.txt").write_text("not a blob")

    files = read_binary_files(spark, str(tmp_path / "media"), glob="*.bin")
    assert files.count() == 5
    with_ids = files.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.bin", 1).cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
    )
    feats = {r["doc_id"]: r for r in extract_features(with_ids).collect()}
    for name, data in blobs.items():
        i = int(name.split("_")[1].split(".")[0])
        assert feats[i]["byte_len"] == len(data)
        assert feats[i]["sha256"] == hashlib.sha256(data).hexdigest()


def test_read_csv_lenient_quarantines_bad_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from ffi_etl_spark.sources.readers import read_csv_lenient

    p = tmp_path / "in.csv"
    p.write_text(
        "id,amount\n"
        "1,10.5\n"
        "2,not_a_number\n"
        "3,30.25\n"
    )
    df = read_csv_lenient(spark, str(p), "id int, amount double").cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0]["_corrupt_record"]
    df.unpersist()


def test_read_csv_url_file_scheme(spark, tmp_path):
    """S1 HTTP shim: driver fetch -> CLUSTER-VISIBLE landing (Hadoop FS
    write into the warehouse dir, not a driver-local temp file) ->
    distributed read. Exercised via a file:// URL (the sandbox has no
    network; the urllib handoff is identical across schemes)."""
    from ffi_etl_spark.sources.readers import read_csv_url

    src = tmp_path / "sheet.csv"
    src.write_text("Response ID,Gender\n1,Woman\n2,Man\n")
    df = read_csv_url(spark, src.as_uri())
    rows = {r["Response ID"]: r["Gender"] for r in df.collect()}
    assert rows == {"1": "Woman", "2": "Man"}
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    # the landed bronze artifact lives under the warehouse, not /tmp
    src_file = df.inputFiles()[0]
    assert "_url_ingest" in src_file and "/tmp" not in src_file.split("_url_ingest")[0]


def test_urlcsv_rejects_non_string_schema(spark):
    """The connector's all-strings contract fails fast with a clear
    message instead of emitting Arrow batches that contradict the
    declared schema at runtime."""
    import pytest

    from ffi_etl_spark.sources.urlcsv import UrlCsvReader

    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType(
        [StructField("a", StringType()), StructField("b", IntegerType())]
    )
    with pytest.raises(ValueError, match="non-string fields.*'b'"):
        UrlCsvReader(schema, {"urls": "file:///x.csv"})


def test_urlcsv_datasource_distributed_fetch(spark, tmp_path):
    """Python Data Source connector: one partition per URL, Arrow-batch
    parse, schema-driven column pruning, absent columns -> null."""
    from ffi_etl_spark.sources.urlcsv import UrlCsvDataSource

    a = tmp_path / "a.csv"
    a.write_text("Response ID,Gender,Extra\n1,Woman,x\n2,Man,y\n")
    b = tmp_path / "b.csv"
    b.write_text("Response ID,Gender\n3,Woman\n")
    c = tmp_path / "c.csv"  # missing Gender entirely
    c.write_text("Response ID\n4\n")

    spark.dataSource.register(UrlCsvDataSource)
    df = (
        spark.read.format("urlcsv")
        .schema("`Response ID` string, `Gender` string")
        .option("urls", ",".join(p.as_uri() for p in (a, b, c)))
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one per URL
    rows = {r["Response ID"]: r["Gender"] for r in df.collect()}
    assert rows == {"1": "Woman", "2": "Man", "3": "Woman", "4": None}
    assert df.columns == ["Response ID", "Gender"]  # Extra pruned at parse


def test_avro_capability_gate(spark):
    """The container has no spark-avro jar, so the probe must say so
    and the reader must fail AT THE API BOUNDARY with the remedy in
    the message; with the jar present the same call slots into the
    normal reader pattern (exercised only where the module exists)."""
    import pytest

    from ffi_etl_spark.sources.readers import avro_available, read_avro

    if avro_available(spark):  # pragma: no cover — jar-present clusters
        # the capability gate passed; the read reaches Spark's own
        # source and fails on the MISSING PATH, not on the gate
        # (ADVICE r06: asserting a DataFrame from .load("/nonexistent")
        # failed on exactly the clusters this branch covers)
        with pytest.raises(Exception, match="PATH_NOT_FOUND|/nonexistent"):
            read_avro(spark, "/nonexistent")
        return
    with pytest.raises(RuntimeError, match="spark-avro"):
        read_avro(spark, "/tmp/x.avro")


def test_text_readers_land_documents_shape(spark, tmp_path):
    """read_text_lines: one row per line; read_text_docs: one row per
    FILE in the (doc_id, text) documents shape, glob applied before
    the read, multi-line contents kept whole."""
    from ffi_etl_spark.sources.readers import read_text_docs, read_text_lines

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha line one\nalpha line two\n")
    (d / "b.txt").write_text("bravo only line\n")
    (d / "ignore.md").write_text("not a txt\n")

    lines = read_text_lines(spark, str(d))
    assert lines.columns == ["value"]
    assert lines.count() == 4  # 2 + 1 + 1 lines across all files

    docs = read_text_docs(spark, str(d), glob="*.txt")
    rows = {r.doc_id.rsplit("/", 1)[-1]: r.text for r in docs.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert rows["a.txt"].strip() == "alpha line one\nalpha line two"
    assert docs.columns == ["doc_id", "text"]
