"""Structured Streaming slice (SURVEY §2.10): file source + availableNow
drives each streaming operator and asserts parity with its batch twin."""

import os

from pyspark.sql import functions as F

from logset_spark.operators import extract
from logset_spark.sources import synth
from logset_spark.streaming import incremental as st


def _write_input(spark, tmp_path, n_convs=6):
    pdf = synth.transcripts_pdf(n_convs=n_convs)
    df = spark.createDataFrame(pdf, schema=synth.TRANSCRIPT_SCHEMA)
    path = str(tmp_path / "in")
    df.repartition(4).write.parquet(path)
    return path, df


def test_stream_structural_matches_batch(spark, tmp_path):
    path, batch_df = _write_input(spark, tmp_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = st.structural_triples_stream(st.stream_transcripts(spark, path))
    st.run_available_now(stream, ckpt, out)

    got = spark.read.parquet(out).select("subj", "pred", "obj")
    expect = (
        extract.structural_triples(batch_df)
        .where(F.col("pred") != "followedBy")
        .select("subj", "pred", "obj")
    )
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_stream_incremental_no_reprocess(spark, tmp_path):
    """Second availableNow run with the same checkpoint sees no new files
    -> no new rows (the streaming twin of manifest resume)."""
    path, _ = _write_input(spark, tmp_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = st.structural_triples_stream(st.stream_transcripts(spark, path))
    st.run_available_now(stream, ckpt, out)
    n1 = spark.read.parquet(out).count()

    stream2 = st.structural_triples_stream(st.stream_transcripts(spark, path))
    st.run_available_now(stream2, ckpt, out)
    assert spark.read.parquet(out).count() == n1

    # new file arrives -> exactly its rows are appended
    extra = synth.transcripts_pdf(n_convs=2, seed=99)
    spark.createDataFrame(extra, schema=synth.TRANSCRIPT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(path)
    stream3 = st.structural_triples_stream(st.stream_transcripts(spark, path))
    st.run_available_now(stream3, ckpt, out)
    assert spark.read.parquet(out).count() > n1


def test_windowed_and_session_aggs(spark, tmp_path):
    path, batch_df = _write_input(spark, tmp_path)
    out, ckpt = str(tmp_path / "w_out"), str(tmp_path / "w_ckpt")
    stream = st.windowed_tool_counts(st.stream_transcripts(spark, path))
    st.run_available_now(stream, ckpt, out)
    got = spark.read.parquet(out)
    expect = (
        batch_df.where(F.col("tool").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"), "tool")
        .agg(F.count("*").alias("n_calls"))
        .select(F.col("w.start").alias("win_start"), "tool", "n_calls")
    )
    # Append mode emits a window only once the watermark passes its end;
    # when the stream drains, trailing windows still open at the final
    # watermark stay in state (correct streaming semantics, not data
    # loss).  So: no spurious rows, and anything missing must be a window
    # newer than (max_ts - watermark).
    assert got.exceptAll(expect).count() == 0
    max_ts = batch_df.agg(F.max("ts")).first()[0]
    horizon = F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    missing = expect.exceptAll(got)
    assert missing.where(F.col("win_start") < horizon).count() == 0
    # and the held-back tail is small: everything older was emitted
    assert got.count() >= expect.count() - 3

    s_out, s_ckpt = str(tmp_path / "s_out"), str(tmp_path / "s_ckpt")
    st.run_available_now(
        st.session_counts(st.stream_transcripts(spark, path)), s_ckpt, s_out
    )
    sess = spark.read.parquet(s_out)
    assert sess.count() > 0
    # every conv's total turns across sessions == its turn count
    totals = sess.groupBy("conv_id").agg(F.sum("n_turns").alias("n"))
    batch_totals = batch_df.groupBy("conv_id").agg(F.count("*").alias("n"))
    assert totals.exceptAll(batch_totals).count() == 0


def test_streaming_dedup(spark, tmp_path):
    """Duplicate deliveries within the watermark are dropped."""
    path, batch_df = _write_input(spark, tmp_path, n_convs=3)
    # write the same input twice -> duplicate triples from the source
    spark.read.parquet(path).write.mode("append").parquet(path)
    out, ckpt = str(tmp_path / "d_out"), str(tmp_path / "d_ckpt")
    stream = st.streaming_dedup(
        st.structural_triples_stream(st.stream_transcripts(spark, path))
    )
    st.run_available_now(stream, ckpt, out)
    got = spark.read.parquet(out)
    assert got.count() == got.select("subj", "pred", "obj").distinct().count()


def test_followed_by_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState followedBy must equal the batch window
    version, INCLUDING edges that bridge micro-batch boundaries: the input
    is split into two files and maxFilesPerTrigger=1 forces the split
    conversations' cross-file edges to come from the state row."""
    import pandas as pd

    pdf = synth.transcripts_pdf(n_convs=4).sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    batch_df = spark.createDataFrame(pdf, schema=synth.TRANSCRIPT_SCHEMA)
    # file 1 = first half of every conversation, file 2 = second half ->
    # every multi-turn conv has a boundary-bridging followedBy edge
    half = pdf.groupby("conv_id").cumcount() < pdf.groupby("conv_id")[
        "turn_idx"
    ].transform("size") // 2
    path = str(tmp_path / "in")
    spark.createDataFrame(pdf[half], schema=synth.TRANSCRIPT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(path)
    spark.createDataFrame(pdf[~half], schema=synth.TRANSCRIPT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(path)

    src = (
        spark.readStream.schema(synth.TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    st.run_available_now(st.followed_by_stream(src), ckpt, out)

    got = spark.read.parquet(out).select("subj", "pred", "obj")
    expect = (
        extract.structural_triples(batch_df)
        .where(F.col("pred") == "followedBy")
        .select("subj", "pred", "obj")
    )
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_followed_by_stream_redelivery_no_self_loop(spark, tmp_path):
    """At-least-once redelivery: a later micro-batch re-delivering the
    last-seen turn must not mint a self-loop or backward followedBy edge,
    and in-batch duplicates must not self-chain."""
    import pandas as pd

    rows = pd.DataFrame({
        "conv_id": ["c"] * 3,
        "turn_idx": pd.array([0, 1, 1], dtype="int32"),  # in-batch dup of 1
        "role": ["user"] * 3,
        "text": ["a", "b", "b"],
        "tool": [None] * 3,
        "ts": pd.to_datetime(["2024-01-01 00:00:00"] * 3),
    })
    redeliver = pd.DataFrame({
        "conv_id": ["c"] * 2,
        "turn_idx": pd.array([1, 2], dtype="int32"),  # 1 redelivered + new 2
        "role": ["user"] * 2,
        "text": ["b", "c"],
        "tool": [None] * 2,
        "ts": pd.to_datetime(["2024-01-01 00:00:00"] * 2),
    })
    path = str(tmp_path / "in")
    spark.createDataFrame(rows, schema=synth.TRANSCRIPT_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)
    spark.createDataFrame(redeliver, schema=synth.TRANSCRIPT_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)

    src = (
        spark.readStream.schema(synth.TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    st.run_available_now(st.followed_by_stream(src), ckpt, out)
    edges = {(r["subj"], r["obj"])
             for r in spark.read.parquet(out).collect()}
    assert ("turn:c/1", "turn:c/1") not in edges        # no self-loop
    assert all(s != o for s, o in edges)
    assert ("turn:c/0", "turn:c/1") in edges
    assert ("turn:c/1", "turn:c/2") in edges            # bridge still works


def test_snapshot_stream_ingest_exactly_once(spark, tmp_path):
    """Micro-batches land as append snapshot commits; the result matches
    the batch extraction, a no-new-data drain publishes nothing, and a
    replayed batch id is skipped (exactly-once over at-least-once)."""
    from logset_spark.sources.snapshots import SnapshotTableIO

    path, batch_df = _write_input(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    store = SnapshotTableIO(root=str(tmp_path / "snap"), n_buckets=4)
    cols = ["subj", "pred", "obj", "conv_id", "turn_idx", "ts"]

    stream = st.structural_triples_stream(
        st.stream_transcripts(spark, path)).select(cols)
    st.run_available_now_snapshot(stream, ckpt, store)
    v1 = store.current_version()
    assert v1 >= 1
    got = store.read(spark).select("subj", "pred", "obj")
    expect = (
        extract.structural_triples(batch_df)
        .where(F.col("pred") != "followedBy")
        .select("subj", "pred", "obj")
    )
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0

    # drain again with nothing new -> no snapshot published
    stream2 = st.structural_triples_stream(
        st.stream_transcripts(spark, path)).select(cols)
    st.run_available_now_snapshot(stream2, ckpt, store)
    assert store.current_version() == v1

    # a replayed micro-batch (same batch_id after a simulated crash
    # between sink and checkpoint commit) must be a no-op
    last = store.last_batch_id()
    assert last is not None
    sink = st.snapshot_batch_sink(store)
    sink(store.read(spark).select(cols).limit(7), last)
    assert store.current_version() == v1
    # ...while a genuinely new batch id commits
    sink(store.read(spark).select(cols).limit(7), last + 1)
    assert store.current_version() == v1 + 1
    assert store.last_batch_id() == last + 1


def test_linked_stream_matches_batch_pipeline(spark, tmp_path):
    """The linked stream (full extraction + exact/fuzzy linking per
    micro-batch) over one file-sized micro-batch must equal the batch
    pipeline's triples exactly — same shared operators, same dictionary,
    minus the corpus-global sameAs pass the streaming twin documents
    away.  One file => one micro-batch => followedBy parity too."""
    from logset_spark.pipeline import build_graph
    from logset_spark.sources.tableio import TableIO

    pdf = synth.transcripts_pdf(n_convs=8)
    df = spark.createDataFrame(pdf, schema=synth.TRANSCRIPT_SCHEMA)
    path = str(tmp_path / "in_linked")
    df.coalesce(1).write.parquet(path)
    ddf = spark.createDataFrame(
        synth.entity_dictionary_pdf(), schema=synth.DICT_SCHEMA
    )

    out, ckpt = str(tmp_path / "out_linked"), str(tmp_path / "ckpt_linked")
    st.run_linked_available_now(
        st.stream_transcripts(spark, path), ckpt, spark, ddf, out_path=out
    )
    got = spark.read.parquet(out).select("subj", "pred", "obj", "conf")

    io = TableIO(str(tmp_path / "wh_linked"), n_buckets=4)
    build_graph(spark, df, ddf, io, run_id="slk1")
    expect = (
        io.read(spark, "triples")
        .where(F.col("pred") != "sameAs")
        .select("subj", "pred", "obj", "conf")
    )
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
    # linking actually happened in-stream: canonical entity mentions exist
    n_linked = got.where(
        (F.col("pred") == "mentions") & F.col("obj").startswith("ent:")
    ).count()
    assert n_linked > 0


def test_linked_stream_incremental_appends_only_new(spark, tmp_path):
    from logset_spark import vocab as V

    pdf = synth.transcripts_pdf(n_convs=4)
    df = spark.createDataFrame(pdf, schema=synth.TRANSCRIPT_SCHEMA)
    path = str(tmp_path / "in_inc")
    df.coalesce(1).write.parquet(path)
    ddf = spark.createDataFrame(
        synth.entity_dictionary_pdf(), schema=synth.DICT_SCHEMA
    )
    out, ckpt = str(tmp_path / "out_inc"), str(tmp_path / "ckpt_inc")
    st.run_linked_available_now(
        st.stream_transcripts(spark, path), ckpt, spark, ddf, out_path=out
    )
    first = spark.read.parquet(out)
    n1 = first.count()
    convs1 = {r.conv_id for r in first.select("conv_id").distinct().collect()}

    # drained checkpoint: re-run sees nothing new
    st.run_linked_available_now(
        st.stream_transcripts(spark, path), ckpt, spark, ddf, out_path=out
    )
    assert spark.read.parquet(out).count() == n1

    # a new file arrives: only ITS conversations are appended
    extra = synth.transcripts_pdf(n_convs=2, seed=7).assign(
        conv_id=lambda d: "late-" + d.conv_id
    )
    spark.createDataFrame(extra, schema=synth.TRANSCRIPT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(path)
    st.run_linked_available_now(
        st.stream_transcripts(spark, path), ckpt, spark, ddf, out_path=out
    )
    after = spark.read.parquet(out)
    new_rows = after.exceptAll(first)
    assert new_rows.count() > 0
    new_convs = {r.conv_id for r in new_rows.select("conv_id").distinct().collect()}
    assert all(c.startswith("late-") for c in new_convs), new_convs
    assert convs1.isdisjoint(new_convs)
    # and the new rows are LINKED triples, not structural-only
    assert (
        new_rows.where(
            (F.col("pred") == V.MENTIONS) & F.col("obj").startswith("ent:")
        ).count()
        > 0
    )


def test_linked_sink_replayed_batch_is_noop(spark, tmp_path):
    """The linked sink carries its own batch-id dedup (separate code
    from snapshot_batch_sink): a replayed micro-batch after a simulated
    crash between the snapshot commit and the checkpoint offset commit
    must publish nothing; a fresh id commits."""
    from logset_spark.sources.snapshots import SnapshotTableIO

    pdf = synth.transcripts_pdf(n_convs=3)
    tdf = spark.createDataFrame(pdf, schema=synth.TRANSCRIPT_SCHEMA)
    ddf = spark.createDataFrame(
        synth.entity_dictionary_pdf(), schema=synth.DICT_SCHEMA
    )
    store = SnapshotTableIO(root=str(tmp_path / "snap_lk"), n_buckets=4)
    sink = st.linked_triples_sink(spark, ddf, store=store)

    sink(tdf, 0)
    v1 = store.current_version()
    n1 = store.read(spark).count()
    assert v1 >= 1 and n1 > 0

    sink(tdf, 0)  # replay: already durably committed
    assert store.current_version() == v1
    assert store.read(spark).count() == n1

    sink(tdf.limit(2), 1)  # genuinely new batch id commits
    assert store.current_version() == v1 + 1


def test_stream_stream_reply_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join drains to exactly the
    batch join's rows (same predicate, no watermark) under availableNow."""
    path, batch_df = _write_input(spark, tmp_path, n_convs=8)
    out, ckpt = str(tmp_path / "out_ssj"), str(tmp_path / "ckpt_ssj")
    stream = st.tool_reply_join_stream(st.stream_transcripts(spark, path))
    st.run_available_now(stream, ckpt, out)

    got = spark.read.parquet(out).select("subj", "pred", "obj")
    expect = st.tool_reply_join_batch(batch_df).select("subj", "pred", "obj")
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
    assert expect.count() > 0  # synth corpus must actually exercise the join

