package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Structured-Streaming behavior: batch/stream parity for windowed
  * aggregation, watermark late-data drop, and watermarked dedup —
  * driven synchronously with MemoryStream + processAllAvailable. */
object StreamsSpec {
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)
}

class StreamsSpec extends AnyFunSuite {
  import StreamsSpec.Ev
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val evs: Seq[Ev] = Seq(
    Ev(0, ts(5), 1, "click", 1.0),
    Ev(1, ts(20), 1, "click", 2.0),
    Ev(2, ts(65), 2, "view", 3.0),
    Ev(3, ts(70), 1, "click", 4.0),
    Ev(4, ts(130), 2, "view", 5.0))

  private def runStream(input: Seq[Seq[Ev]],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String = "append",
      session: org.apache.spark.sql.SparkSession = spark) = {
    val mem = MemoryStream[Ev](session)
    val q = build(mem.toDF()).writeStream
      .format("memory").queryName(s"s_${System.nanoTime()}")
      .outputMode(mode).start()
    input.foreach { batch => mem.addData(batch); q.processAllAvailable() }
    val out = session.table(q.name).collect()
    q.stop()
    out
  }

  test("tumbling agg: stream (complete mode) equals batch on same input") {
    val batch = Streams.tumblingAgg(evs.toDF()).collect().toSet
    val streamed = runStream(Seq(evs.take(3), evs.drop(3)),
      Streams.tumblingAgg, mode = "complete").toSet
    assert(streamed == batch)
  }

  test("watermark drops late data in append mode") {
    // epoch1 advances watermark to 130-10=120min; a 0-60min window can
    // emit; epoch2's event at minute 15 is behind the watermark → dropped
    val late = Ev(9, ts(15), 9, "late", 9.0)
    val out = runStream(Seq(evs, Seq(late)), Streams.tumblingAgg)
    assert(!out.exists(_.getAs[String]("event_type") == "late"))
  }

  test("dedupWithinWatermark: redelivery within horizon collapses") {
    val dup = evs(4).copy(value = 99.0) // same event_id=4 redelivered
    val out = runStream(Seq(evs, Seq(dup)),
      df => Streams.dedupWithinWatermark(df))
    assert(out.map(_.getAs[Long]("event_id")).toSeq.sorted ==
      Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("dedupWithinWatermark on the RocksDB state store: same collapse") {
    // same redelivery scenario as above, but the dedup state lives in
    // RocksDB — the store a 100 TB deployment runs. Behavior must be
    // provider-independent.
    val dup = evs(4).copy(value = 99.0)
    val out = runStream(Seq(evs, Seq(dup)),
      df => Streams.dedupWithinWatermark(df),
      session = SparkTestSession.rocksSession)
    assert(out.map(_.getAs[Long]("event_id")).toSeq.sorted ==
      Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("stream-static join enriches with broadcast dim") {
    val dim = Seq((1L, "cust-1"), (2L, "cust-2")).toDF("c_custkey", "c_name")
    val out = runStream(Seq(evs),
      df => Streams.enrichWithDim(df, dim))
    assert(out.length == evs.length)
    assert(out.count(_.getAs[String]("c_name") != null) == evs.length)
  }

  test("compactStream: streaming snapshot equals batch compaction") {
    // typed events across two epochs; redelivery + out-of-order updates
    val epoch1 = Seq(
      Event(0, ts(5), 1, "signup", 1.0),
      Event(1, ts(10), 1, "purchase", 5.0),
      Event(2, ts(7), 2, "signup", 2.0))
    val epoch2 = Seq(
      Event(1, ts(10), 1, "purchase", 5.0),  // redelivered
      Event(3, ts(8), 1, "click", 9.0),      // late, loses to event 1
      Event(4, ts(30), 2, "purchase", 7.0))  // new winner for user 2
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.compactStream(mem.toDS()).writeStream
      .format("memory").queryName(s"snap_${System.nanoTime()}")
      .outputMode("update").start()
    mem.addData(epoch1); q.processAllAvailable()
    mem.addData(epoch2); q.processAllAvailable()
    // last Update emission per key = final state
    val byKey = spark.table(q.name).as[Event].collect()
      .groupBy(_.user_id).map { case (k, vs) =>
        k -> vs.maxBy(e => (e.ts.getTime, e.event_id)) }
    q.stop()
    assert(byKey(1L).event_id == 1 && byKey(1L).value == 5.0)
    assert(byKey(2L).event_id == 4 && byKey(2L).value == 7.0)
  }

  test("foreachBatch incremental dedup equals the batch query, any batching") {
    // The production ingest loop: new documents stream in; each
    // micro-batch is signed with the SAME sigBands construction the
    // batch query uses, joined against the stored corpus signature
    // table, and the batch's signatures are then APPENDED to the store
    // — so a pair spanning two micro-batches is found when its later
    // member arrives. Over any partitioning of the new docs into
    // batches, the union of per-batch pairs must equal the declared
    // q_dedup_incremental output exactly.
    import graft.ops.{Dedup, Text}
    val sfDir = SparkTestSession.sf
    val docs = graft.io.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    def sb(df: org.apache.spark.sql.DataFrame) =
      Dedup.sigBands(df.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("word"))).localCheckpoint()
    val newDocs = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
      .as[(Long, String)].collect().sortBy(_._1)
    var corpus = sb(docs.filter(pmod(col("doc_id"), lit(10)) =!= 9))
    val seen = scala.collection.mutable.Buffer.empty[(Long, Long, Long)]
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val bsb = sb(batch)
        seen ++= Dedup.incrementalPairs(corpus, bsb)
          .select(col("a_id"), col("b_id"), col("n_match").cast("long"))
          .as[(Long, Long, Long)].collect()
        corpus = corpus.unionByName(bsb).localCheckpoint()
        ()
      }
      .outputMode("update").start()
    val (firstHalf, secondHalf) = newDocs.splitAt(newDocs.length / 2)
    mem.addData(firstHalf); q.processAllAvailable()
    mem.addData(secondHalf); q.processAllAvailable()
    q.stop()
    val expected = graft.SparkEntry.queries("q_dedup_incremental")(spark, sfDir)
      .select(col("a_id"), col("b_id"), col("n_match").cast("long"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(seen.toSeq.sorted == expected,
      "streamed incremental pairs diverge from the batch query")
  }

  test("foreachBatch incremental label maintenance equals full CC, any batching") {
    // The continuous version of q_dedup_clusters_incr: new documents
    // stream in; each micro-batch is signed, its pairs discovered
    // against the growing corpus signature table, and the
    // label-contraction fold (Dedup.foldBatchLabels — the exact
    // function the declared query runs) folds them into the running
    // label table. Over ANY partitioning of the new docs into
    // micro-batches the final labels must equal the one-shot full CC
    // recompute, and per micro-batch every pre-existing doc's label
    // may only DECREASE (min-id cluster labels are monotone
    // non-increasing under edge insertion — a label that ever rose
    // would mean a component split, which ingest cannot cause).
    import graft.ops.{Dedup, Text}
    val sfDir = SparkTestSession.sf
    val docs = graft.io.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    def sb(df: org.apache.spark.sql.DataFrame) =
      Dedup.sigBands(df.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("word"))).localCheckpoint()
    val newDocs = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
      .as[(Long, String)].collect().sortBy(_._1)
    var corpus = sb(docs.filter(pmod(col("doc_id"), lit(10)) =!= 9))
    var labels = Dedup.storedOldClusterLabels(spark, sfDir)
      .select(col("doc_id"), col("cluster_id")).localCheckpoint()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val bsb = sb(batch)
        val pairs = Dedup.incrementalPairs(corpus, bsb)
          .select(col("a_id"), col("b_id"))
        val before = labels
        labels = Dedup.foldBatchLabels(labels,
            batch.select(col("doc_id")), pairs)
          .localCheckpoint()
        // per-micro-batch stability: labels only merge downward
        val rose = before.withColumnRenamed("cluster_id", "old_l")
          .join(labels, "doc_id")
          .filter(col("cluster_id") > col("old_l"))
        assert(rose.count() == 0,
          "a pre-existing doc's cluster label increased mid-stream")
        corpus = corpus.unionByName(bsb).localCheckpoint()
        ()
      }
      .outputMode("update").start()
    val parts = newDocs.grouped(math.max(1, newDocs.length / 3)).toSeq
    parts.foreach { p => mem.addData(p); q.processAllAvailable() }
    q.stop()
    val expected = graft.SparkEntry.queries("q_dedup_clusters_sig")(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    val got = labels.as[(Long, Long)].collect().toSeq.sorted
    assert(got == expected,
      "streamed incremental labels diverge from the full CC recompute")
  }

  test("foreachBatch checkpointed compaction equals full replay, any batching") {
    // The continuous version of q_cdc_compact_day2: mutations stream
    // in; each micro-batch folds into the running snapshot by the SAME
    // LWW step the declared query runs (Cdc.lwwStep — a semigroup fold
    // over the (ts, event_id) total order, so any associativity of
    // batching yields the same snapshot). Over ANY partitioning of the
    // ops into micro-batches the final snapshot must equal the
    // one-shot full replay, and per micro-batch a key's winning
    // (ts, event_id) may only advance (LWW winners are monotone
    // non-decreasing under op insertion — a winner that ever receded
    // would mean the fold dropped a seen op).
    import graft.ops.Cdc
    val sfDir = SparkTestSession.sf
    val all = graft.io.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), graft.Det.ets(col("ts")).as("ts"))
    val ops = all.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Ev].collect().sortBy(_.event_id)
    var snapshot = all.limit(0).localCheckpoint()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.select(col("user_id"), col("event_id"),
          col("event_type"), col("value"), col("ts"))
        val before = snapshot
        snapshot = Cdc.lwwStep(snapshot.unionByName(b)).localCheckpoint()
        // winners only advance: (ts, event_id) is totally ordered, so
        // compare the struct lexicographically
        val receded = before
          .select(col("user_id"), struct(col("ts"), col("event_id")).as("w0"))
          .join(snapshot.select(col("user_id"),
            struct(col("ts"), col("event_id")).as("w1")), "user_id")
          .filter(col("w1") < col("w0"))
        assert(receded.count() == 0,
          "a key's LWW winner receded mid-stream")
        ()
      }
      .outputMode("update").start()
    val parts = ops.grouped(math.max(1, ops.length / 4)).toSeq
    parts.foreach { p => mem.addData(p); q.processAllAvailable() }
    q.stop()
    val expected = graft.SparkEntry.queries("q_cdc_latest_state")(spark, sfDir)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    val got = snapshot.select(col("user_id"), col("event_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == expected,
      "streamed compaction snapshot diverges from full replay")
  }

  test("checkpoint restart: killed query resumes from its offsets " +
      "and does not reprocess history") {
    // The recovery behavior the algebraic suites above ASSERT but do
    // not exercise (round-12 verdict #5): a foreachBatch compaction
    // with a durable FILE checkpoint is stopped mid-stream, the
    // remainder of the input arrives while it is down, a NEW query is
    // started against the SAME checkpoint, and the remainder flows
    // through. Two claims, each of which fails if checkpointing is
    // broken or disabled:
    //  1. the restarted query processes ONLY the pending rows (offset
    //     resume — with no checkpoint a fresh file-source query would
    //     re-read every file and the processed-row counter would see
    //     all of history);
    //  2. the final durable snapshot equals q_cdc_latest_state's
    //     one-shot full replay (the driver-verified batch twin).
    // The snapshot itself is persisted to parquet each batch (read →
    // LWW-fold → localCheckpoint → overwrite), so the "consumer state"
    // survives the kill exactly as a production compactor's would;
    // batch REPLAY after a crash re-folds the same ops into the same
    // snapshot because the LWW fold is idempotent (asserted by the
    // any-batching test above).
    import graft.ops.Cdc
    val sfDir = SparkTestSession.sf
    val all = graft.io.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), graft.Det.ets(col("ts")).as("ts"))
    val ops = all.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Ev].collect().sortBy(_.event_id).toSeq
    val (day0, day1) = ops.splitAt(ops.length * 2 / 3)

    val root = java.nio.file.Files.createTempDirectory("graft-ckpt-").toFile
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val ckpt = new java.io.File(root, "ckpt").getPath
    val snapDir = new java.io.File(root, "snap")
    def feed(evs: Seq[Ev]): Unit =
      spark.createDataset(evs).repartition(1)
        .write.mode("append").parquet(srcDir.getPath)

    val processed = new java.util.concurrent.atomic.AtomicLong(0)
    def startQuery() = spark.readStream
      .schema(spark.createDataset(Seq.empty[Ev]).schema)
      .parquet(srcDir.getPath)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        processed.addAndGet(batch.count())
        val b = batch.select(col("user_id"), col("event_id"),
          col("event_type"), col("value"), col("ts"))
        val prev =
          if (snapDir.exists()) spark.read.parquet(snapDir.getPath)
          else b.limit(0)
        // materialize BEFORE overwriting the dir the fold read from
        val folded = Cdc.lwwStep(prev.unionByName(b)).localCheckpoint()
        folded.write.mode("overwrite").parquet(snapDir.getPath)
        ()
      }
      .outputMode("update").start()

    feed(day0)
    val q1 = startQuery()
    q1.processAllAvailable()
    assert(processed.get() == day0.length.toLong)
    q1.stop()           // the query is killed mid-stream …
    feed(day1)          // … and the remainder arrives while it is DOWN

    processed.set(0)
    val q2 = startQuery()  // same checkpoint, new query instance
    q2.processAllAvailable()
    q2.stop()
    assert(processed.get() == day1.length.toLong,
      s"restart reprocessed history: saw ${processed.get()} rows, " +
        s"expected only the ${day1.length} pending ones")

    val expected = graft.SparkEntry.queries("q_cdc_latest_state")(spark, sfDir)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    val got = spark.read.parquet(snapDir.getPath)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == expected,
      "post-restart snapshot diverges from the one-shot full replay")
  }

  test("checkpoint restart: incremental-dedup label fold resumes from " +
      "its offsets and matches the one-shot CC") {
    // The SECOND production foreachBatch loop, given the same
    // kill-and-resume treatment as the CDC compactor above (round-13
    // verdict #8): the incremental signature/label fold — here with
    // DURABLE state (labels + corpus signatures persisted to parquet
    // each batch, exactly what a daily-ingest deployment keeps) so the
    // consumer state survives the kill like the compactor's snapshot
    // does. A file-source query with a durable checkpoint is stopped
    // mid-ingest, the remaining new docs land while it is down, a new
    // query starts from the SAME checkpoint, and:
    //  1. only the pending rows are reprocessed (offset resume);
    //  2. the final durable label table equals q_dedup_clusters_sig's
    //     one-shot full-CC recompute (the driver-verified twin).
    import graft.ops.{Dedup, Text}
    val sfDir = SparkTestSession.sf
    val docs = graft.io.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    def sb(df: org.apache.spark.sql.DataFrame) =
      Dedup.sigBands(df.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("word")))
    val newDocs = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val (ingest0, ingest1) = newDocs.splitAt(newDocs.length / 2)

    val root = java.nio.file.Files.createTempDirectory("graft-dedup-ckpt-")
      .toFile
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val ckpt = new java.io.File(root, "ckpt").getPath
    val sigDir = new java.io.File(root, "sigs").getPath
    val labelDir = new java.io.File(root, "labels").getPath
    // day-0 durable state: signatures + labels of the existing corpus
    sb(docs.filter(pmod(col("doc_id"), lit(10)) =!= 9))
      .write.mode("overwrite").parquet(sigDir)
    Dedup.storedOldClusterLabels(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
      .write.mode("overwrite").parquet(labelDir)
    def feed(ds: Seq[(Long, String)]): Unit =
      spark.createDataset(ds).toDF("doc_id", "text").repartition(1)
        .write.mode("append").parquet(srcDir.getPath)

    val processed = new java.util.concurrent.atomic.AtomicLong(0)
    def startQuery() = spark.readStream
      .schema(docs.schema)
      .parquet(srcDir.getPath)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        processed.addAndGet(batch.count())
        val bsb = sb(batch).localCheckpoint()
        val corpus = spark.read.parquet(sigDir)
        val pairs = Dedup.incrementalPairs(corpus, bsb)
          .select(col("a_id"), col("b_id"))
        val prev = spark.read.parquet(labelDir)
        // materialize BEFORE overwriting the dirs the fold read from
        val folded = Dedup.foldBatchLabels(prev,
            batch.select(col("doc_id")), pairs).localCheckpoint()
        val grown = corpus.unionByName(bsb).localCheckpoint()
        folded.write.mode("overwrite").parquet(labelDir)
        grown.write.mode("overwrite").parquet(sigDir)
        ()
      }
      .outputMode("update").start()

    feed(ingest0)
    val q1 = startQuery()
    q1.processAllAvailable()
    assert(processed.get() == ingest0.length.toLong)
    q1.stop()            // killed mid-ingest …
    feed(ingest1)        // … the rest of the day arrives while DOWN

    processed.set(0)
    val q2 = startQuery()  // same checkpoint, new query instance
    q2.processAllAvailable()
    q2.stop()
    assert(processed.get() == ingest1.length.toLong,
      s"restart reprocessed history: saw ${processed.get()} rows, " +
        s"expected only the ${ingest1.length} pending ones")

    val expected = graft.SparkEntry.queries("q_dedup_clusters_sig")(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    val got = spark.read.parquet(labelDir)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == expected,
      "post-restart labels diverge from the one-shot full-CC recompute")
  }

  test("epoch parquet sink writes idempotent epoch directories") {
    val out = java.nio.file.Files.createTempDirectory("graft-epoch").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-epoch-ck").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // data must land BEFORE start: AvailableNow snapshots the available
    // end-offset when the query starts, so a post-start addData can race
    // the snapshot and the query terminates having processed nothing
    // (observed as an intermittent empty-epoch failure)
    mem.addData(evs)
    val q = graft.io.Sinks.epochParquetSink(mem.toDF(), out, ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val epochs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("epoch=")).map(_.getName)
    assert(epochs.nonEmpty)
    assert(spark.read.parquet(s"$out/${epochs.head}").count() > 0)
  }

  test("stream-stream join equals the batch join on the same input") {
    val clickRows = Seq((10L, 1L, ts(5)), (11L, 1L, ts(100)), (12L, 2L, ts(10)))
    val purchRows = Seq(
      (20L, 1L, ts(30)),   // matches click 10 (25 min later)
      (21L, 1L, ts(140)),  // matches clicks 10 (135 min) NO (>2h) and 11 (40 min)
      (22L, 2L, ts(200)))  // >2h after click 12 → no match
    def toClicks(df: org.apache.spark.sql.DataFrame) =
      df.toDF("click_id", "user_id", "click_ts")
    def toPurch(df: org.apache.spark.sql.DataFrame) =
      df.toDF("purchase_id", "p_user_id", "purchase_ts")
    val batch = Streams.clickAttribution(
      toClicks(clickRows.toDF()), toPurch(purchRows.toDF())).collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[(Long, Long, Timestamp)]
    val memP = MemoryStream[(Long, Long, Timestamp)]
    val q = Streams.clickAttribution(toClicks(memC.toDF()), toPurch(memP.toDF()))
      .writeStream.format("memory").queryName(s"ssj_${System.nanoTime()}")
      .outputMode("append").start()
    // feed out of lockstep: clicks first, then purchases across 2 epochs
    memC.addData(clickRows); q.processAllAvailable()
    memP.addData(purchRows.take(1)); q.processAllAvailable()
    memP.addData(purchRows.drop(1)); q.processAllAvailable()
    val streamed = spark.table(q.name).collect().toSet
    q.stop()
    assert(batch.map(_.getAs[Long]("purchase_id")) == Set(20L, 21L))
    assert(streamed == batch)
  }

  test("session windows split at the gap in batch form") {
    val sess = Streams.sessionAgg(evs.toDF()).collect()
    // user 1: 5 | 20 | 70 (15- and 50-min gaps); user 2: 65 | 130
    assert(sess.length == 5)
  }

  test("checkpoint restart: ANN ingest (frozen-book coding + append) " +
      "resumes from its offsets and matches the day-chain index") {
    // The STREAMING twin of the batch day-chain PQ index (round-16
    // verdict #5): a production vector store ingests continuously —
    // new vectors are coded with the FROZEN day-0 codebook and
    // APPENDED to the code table; nothing existing is re-read or
    // re-coded. Here that loop runs as a checkpointed file-source
    // foreachBatch: day-1 vectors stream in two installments with a
    // kill in between, the new query resumes from the SAME checkpoint,
    // and
    //  1. only the pending vectors are reprocessed (offset resume);
    //  2. the final durable code table equals the BATCH day-chain
    //     store (q_sim_ann_pq_day2's oracle-certified generation) —
    //     stream-coded ≡ hard-link-append-coded, vector for vector.
    import graft.ops.Vectors
    val sfDir = SparkTestSession.sf
    val emb = graft.io.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
    // batch twin: builds (or reads) the stored day-0 book + codes
    val (book, chainCodes) = Vectors.storedPqDayIndex(spark, sfDir)
    val day1 = emb.filter(pmod(col("vec_id"), lit(100)) >= 90)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val (ingest0, ingest1) = day1.splitAt(day1.length / 2)

    val root = java.nio.file.Files.createTempDirectory("graft-ann-ckpt-")
      .toFile
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val ckpt = new java.io.File(root, "ckpt").getPath
    val codesDir = new java.io.File(root, "codes").getPath
    // day-0 durable state: the already-coded corpus (what the store
    // holds before ingest begins)
    Vectors.pqCodes(emb.filter(pmod(col("vec_id"), lit(100)) < 90), book)
      .select(col("vec_id"), col("j"), col("code"))
      .write.mode("overwrite").parquet(codesDir)
    def feed(vs: Seq[(Long, Seq[Double])]): Unit =
      spark.createDataset(vs).toDF("vec_id", "emb").repartition(1)
        .write.mode("append").parquet(srcDir.getPath)

    val processed = new java.util.concurrent.atomic.AtomicLong(0)
    def startQuery() = spark.readStream
      .schema(emb.schema)
      .parquet(srcDir.getPath)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        processed.addAndGet(batch.count())
        // frozen-book coding, append-only — the whole ingest step
        Vectors.pqCodes(batch, book)
          .select(col("vec_id"), col("j"), col("code"))
          .write.mode("append").parquet(codesDir)
        ()
      }
      .outputMode("update").start()

    feed(ingest0)
    val q1 = startQuery()
    q1.processAllAvailable()
    assert(processed.get() == ingest0.length.toLong)
    q1.stop()            // killed mid-ingest …
    feed(ingest1)        // … the rest arrives while it is DOWN

    processed.set(0)
    val q2 = startQuery()  // same checkpoint, new query instance
    q2.processAllAvailable()
    q2.stop()
    assert(processed.get() == ingest1.length.toLong,
      s"restart reprocessed history: saw ${processed.get()} rows, " +
        s"expected only the ${ingest1.length} pending ones")

    val got = spark.read.parquet(codesDir)
      .as[(Long, Int, Int)].collect().toSeq.sorted
    val expected = chainCodes
      .select(col("vec_id"), col("j"), col("code"))
      .as[(Long, Int, Int)].collect().toSeq.sorted
    assert(got == expected,
      "stream-ingested code table diverges from the batch day-chain " +
        "index — frozen-book coding is not replay-equivalent")
  }
}
