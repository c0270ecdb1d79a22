"""Structured Streaming surface + distributed FASTA source tests."""

import glob

from pyspark.sql import functions as F

from globalign_spark import streaming
from globalign_spark.sources.fasta_spark import read_fasta
from globalign_spark.sources.fixtures import pages_df


def test_read_fasta_spark(spark, tmp_path):
    f1 = tmp_path / "a.fasta"
    f1.write_text(">seq one\nacgt\nACGT\n\n>seq two\nTTTT\n")
    f2 = tmp_path / "b.fasta"
    f2.write_text(">only\nGG\n>empty\n\n>gapped\nA-C\n")
    rows = {r.description: r.sequence
            for r in read_fasta(spark, str(tmp_path / "*.fasta")).collect()}
    # multi-line concat + uppercase; empty and '-' records dropped
    assert rows == {"seq one": "ACGTACGT", "seq two": "TTTT", "only": "GG"}


def test_streaming_matches_batch(spark, tmp_path):
    """availableNow streaming run over a parquet drop dir == batch result."""
    src = tmp_path / "pages_in"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    pages = pages_df(spark, n_entities=40, seed=21).drop(
        "entity_id", "variant_id"
    )
    pages.write.mode("overwrite").parquet(str(src))

    stream = streaming.stream_pages(spark, str(src), max_files_per_trigger=None)
    assert stream.isStreaming
    norm = streaming.stream_normalize(stream, text_from_html=True)
    # Single microbatch (no maxFilesPerTrigger split): the watermark starts
    # at -inf, so nothing is dropped as late; append mode then emits exactly
    # the windows closed by the FINAL watermark (max event time - delay).
    counts = streaming.stream_dedup_counts(norm, watermark="1 day",
                                           window="1 day")
    streaming.run_available_now(counts, str(ck), str(out))

    got = spark.read.parquet(str(out))
    src_df = streaming.stream_normalize(
        spark.read.parquet(str(src)), text_from_html=True
    )
    batch = (
        src_df.groupBy(
            F.window("warc_ts", "1 day").alias("w"),
            F.md5("norm_text").alias("text_md5"),
        )
        .agg(F.count("*").alias("n_dupes"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "text_md5",
            "n_dupes",
        )
    )
    max_ts = src_df.agg(F.max("warc_ts")).collect()[0][0]
    import datetime

    wm = max_ts - datetime.timedelta(days=1)
    closed = batch.where(F.col("window_end") <= F.lit(wm)).drop("window_end")
    # every emitted row matches the batch aggregation bit-for-bit ...
    assert got.exceptAll(batch.drop("window_end")).count() == 0
    # ... and all watermark-closed windows were emitted
    assert closed.exceptAll(got).count() == 0
    assert got.count() >= closed.count() > 0


def test_watermark_drops_late(spark, tmp_path):
    """With a tight watermark, multi-microbatch processing drops captures
    older than (max seen ts - watermark) — strictly fewer or equal groups
    than the batch run, never more."""
    src = tmp_path / "late_in"
    out = tmp_path / "late_out"
    ck = tmp_path / "late_ck"
    pages = pages_df(spark, n_entities=40, seed=21).drop(
        "entity_id", "variant_id"
    )
    pages.write.mode("overwrite").parquet(str(src))
    norm = streaming.stream_normalize(
        streaming.stream_pages(spark, str(src)), text_from_html=False
    )
    counts = streaming.stream_dedup_counts(norm, watermark="1 day",
                                           window="1 day")
    streaming.run_available_now(counts, str(ck), str(out))
    n_stream = spark.read.parquet(str(out)).count()
    n_batch = (
        streaming.stream_normalize(spark.read.parquet(str(src)))
        .groupBy(F.window("warc_ts", "1 day"), F.md5("norm_text"))
        .count()
        .count()
    )
    assert n_stream <= n_batch


def test_streaming_incremental_resume(spark, tmp_path):
    """New files after the first drain are picked up from the checkpoint
    without reprocessing old ones (stage-level incrementality)."""
    src = tmp_path / "inc_in"
    out = tmp_path / "inc_out"
    ck = tmp_path / "inc_ck"
    p1 = pages_df(spark, n_entities=10, seed=1).drop("entity_id", "variant_id")
    p1.write.mode("overwrite").parquet(str(src))

    def drain():
        s = streaming.stream_normalize(
            streaming.stream_pages(spark, str(src)), text_from_html=False
        ).select("url", "host", "norm_text")
        streaming.run_available_now(s, str(ck), str(out))

    drain()
    n1 = spark.read.parquet(str(out)).count()
    # second corpus appended as new files
    p2 = pages_df(spark, n_entities=10, seed=2).drop("entity_id", "variant_id")
    p2.write.mode("append").parquet(str(src))
    drain()
    n2 = spark.read.parquet(str(out)).count()
    assert n1 == p1.count()
    assert n2 == p1.count() + p2.count()
    # output files from the first drain were not rewritten
    assert len(glob.glob(str(out) + "/*.parquet")) > 1


def test_stateful_first_seen_dedup(spark, tmp_path):
    """applyInPandasWithState: per-host first-seen dedup holds state across
    micro-batches AND restarts (state store in the checkpoint)."""
    import pandas as pd

    src = tmp_path / "fs_in"
    out = tmp_path / "fs_out"
    ck = tmp_path / "fs_ck"

    def write_pages(rows, mode):
        pdf = pd.DataFrame(
            rows, columns=["url", "text"]
        )
        pdf["warc_ts"] = pd.Timestamp("2026-01-01")
        pdf["html"] = None
        pdf["lang"] = "en"
        sdf = spark.createDataFrame(pdf[["url", "warc_ts", "html", "text", "lang"]])
        sdf.write.mode(mode).parquet(str(src))

    def drain():
        s = streaming.stream_normalize(
            streaming.stream_pages(spark, str(src)), text_from_html=False
        )
        streaming.run_available_now(
            streaming.stream_first_seen(s), str(ck), str(out)
        )

    write_pages(
        [
            ("http://a.com/1", "hello world"),
            ("http://a.com/2", "hello world"),   # dup of /1, same host
            ("http://b.com/1", "hello world"),   # same text, other host
            ("http://a.com/3", "something else"),
        ],
        "overwrite",
    )
    drain()
    got1 = spark.read.parquet(str(out))
    # per-host dedup: a.com keeps 1 of the 2 dup urls + the distinct one
    assert got1.where("host = 'a.com'").count() == 2
    assert got1.where("host = 'b.com'").count() == 1

    # restart with new files: the duplicate text must STILL be suppressed
    write_pages(
        [
            ("http://a.com/4", "hello world"),    # dup across restart
            ("http://a.com/5", "brand new text"),
        ],
        "append",
    )
    drain()
    got2 = spark.read.parquet(str(out))
    a_md5s = [r.text_md5 for r in got2.where("host = 'a.com'").collect()]
    assert len(a_md5s) == 3  # not 4: /4 was suppressed by restored state
    assert len(set(a_md5s)) == 3


def _er_docs(spark, n=36):
    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while the sun sets slowly behind the quiet hills tonight"
    )
    rows = [
        (i, base[: 60 + (i % 6) * 10] + f" tail{i % 3}") for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stream_incremental_er_matches_batch(spark, tmp_path):
    """Micro-batched incremental clustering over a doc stream converges to
    the batch LSH clustering of the full corpus."""
    from globalign_spark.ops import dedup
    from globalign_spark.pipeline.clustering import connected_components

    docs = _er_docs(spark)
    src = tmp_path / "docs_in"
    # three drop files -> (with maxFilesPerTrigger=1) three micro-batches
    for part in range(3):
        docs.where(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = streaming.stream_incremental_er(
        stream, str(tmp_path / "state"), str(tmp_path / "ck"),
        bucket_cap=10**9,
    )
    q.awaitTermination()

    got = {
        (r.id, r.component)
        for r in streaming.latest_assignment(
            spark, str(tmp_path / "state")
        ).collect()
    }
    cand = dedup.dedup_minhash_lsh(docs, bucket_cap=10**9)
    exp = {
        (r.id, r.component)
        for r in connected_components(cand, src="id_1", dst="id_2").collect()
    }
    assert got == exp


def test_stream_incremental_er_restart(spark, tmp_path):
    """New files after a drained run are picked up from the checkpoint and
    folded in; the final assignment still equals the batch clustering."""
    from globalign_spark.ops import dedup
    from globalign_spark.pipeline.clustering import connected_components

    docs = _er_docs(spark)
    src = tmp_path / "docs_in"
    first = docs.where(F.col("doc_id") < 24)
    first.coalesce(1).write.mode("append").parquet(str(src))

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        streaming.stream_incremental_er(
            stream, str(tmp_path / "state"), str(tmp_path / "ck"),
            bucket_cap=10**9,
        ).awaitTermination()

    run()
    # second "day": the rest of the corpus arrives, same checkpoint
    docs.where(F.col("doc_id") >= 24).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run()

    got = {
        (r.id, r.component)
        for r in streaming.latest_assignment(
            spark, str(tmp_path / "state")
        ).collect()
    }
    cand = dedup.dedup_minhash_lsh(docs, bucket_cap=10**9)
    exp = {
        (r.id, r.component)
        for r in connected_components(cand, src="id_1", dst="id_2").collect()
    }
    assert got == exp
