package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Bucketing, Tables}
import graft.ops.Skew

/** Scale-path mechanics that local-mode correctness tests can still
  * prove: bucketed joins plan without shuffles, salted joins preserve
  * results, RocksDB state store runs the streaming aggregation. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  /** Every physical node of an executed adaptive plan, descending
    * through query stages and reused exchanges — shared by the three
    * plan-shape tests below. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec        => p +: flatten(q.plan)
    case r: ReusedExchangeExec    => p +: flatten(r.child)
    case other => other +: other.children.flatMap(flatten)
  }

  test("token explode fans out across the configured partition count") {
    // regression guard for the one-file-corpus fix: the tokenization
    // pipeline must run on shuffle.partitions cores, and AQE must not
    // coalesce the pinned exchange back to one partition
    val dw = graft.ops.Text.docTokens(spark, sf)
    val expected = spark.sessionState.conf.numShufflePartitions
    assert(dw.rdd.getNumPartitions == expected,
      s"explode runs on ${dw.rdd.getNumPartitions} partitions, want $expected")
  }

  test("registry sweep: no corpus-sized single-partition shuffle anywhere") {
    // Mechanizes the per-round plan audit's one disqualifying shape: a
    // SinglePartition shuffle that funnels a data-sized stream through
    // one task (the q_window_ntile defect class — fixed round 9; this
    // guard keeps it fixed for every current and future registry key).
    // Legitimate SinglePartition exchanges (global aggregates,
    // dictionary collect_lists) carry only per-partition partials —
    // ≤ shuffle.partitions records — so a generous cap separates them
    // cleanly from anything corpus-shaped. ORDER BY output sorts use
    // RangePartitioning and are exempt by construction: the contract's
    // output sort is output-sized, and AQE sizes its partition count.
    //
    // Second mechanized shape (the round-13 finding, fixed round 14):
    // a COUNT window — count().over(Window.partitionBy(key)) — on a
    // group-size reporting step. On an unbounded-cardinality key whose
    // hottest group is data-sized (cluster_id, simhash, gram, fp), the
    // window shuffles every member of that group into ONE task and
    // sorts it, and AQE cannot split window partitions; the skew-safe
    // form is Skew.withGroupSize (groupBy + join-back). No registry
    // query may plan a Count window function at all, except the one
    // declared trade: q_dedup_minhash_capped keeps a band-key count
    // window precisely so the self-join downstream lands on the SAME
    // exchange (ReusedExchange) instead of re-deriving the 64-minhash
    // signature lineage per branch (Dedup.lshCandidatePairsCapped's
    // comment carries the full reasoning; its hot keys are the thing
    // the cap bounds).
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.Count
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val cap = 4096L
    val countWindowOk = Set("q_dedup_minhash_capped")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val qe = fn(spark, sf).queryExecution
        qe.toRdd.count()
        flatten(qe.executedPlan).collect {
          case e: ShuffleExchangeLike
            if e.outputPartitioning == SinglePartition &&
              e.metrics.get("shuffleRecordsWritten").exists(_.value > cap) =>
            s"$name: ${e.metrics("shuffleRecordsWritten").value} records " +
              "through a single-partition shuffle"
          case w: WindowExec
            if !countWindowOk.contains(name) && w.partitionSpec.nonEmpty &&
              w.windowExpression.exists(
                _.collectFirst { case c: Count => c }.isDefined) =>
            s"$name: Count window over partitionBy(" +
              w.partitionSpec.mkString(",") +
              ") — use Skew.withGroupSize (groupBy + join-back)"
        }
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("bucketed co-located join plans with no shuffle exchange") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the metastore is fresh per JVM but the warehouse dir persists —
    // clear leftover table locations from previous runs
    Seq("orders_b", "customer_b").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Bucketing.writeBucketed(
      Tables.orders(s, sf).withColumnRenamed("o_custkey", "custkey"),
      "orders_b", "custkey", 8)
    Bucketing.writeBucketed(
      Tables.customer(s, sf).withColumnRenamed("c_custkey", "custkey"),
      "customer_b", "custkey", 8)
    val joined = Bucketing.colocatedJoin(s, "orders_b", "customer_b", "custkey")
    joined.count() // materialize through AQE
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      "bucketed join should not shuffle:\n" + plan.take(2000))
    assert(joined.count() ==
      Tables.orders(s, sf).join(Tables.customer(s, sf),
        col("o_custkey") === col("c_custkey")).count())
  }

  test("hive-partitioned lake: static and dynamic partition pruning") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-lake").toString
    Tables.events(spark, sf)
      .withColumn("etype", col("event_type"))
      .write.mode("overwrite").partitionBy("etype").parquet(out)

    // static pruning: the filter on the partition column becomes a
    // PartitionFilter — only one directory of five is read
    val one = spark.read.parquet(out).filter(col("etype") === "click")
    one.count()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("etype"),
      plan.take(1500))
    assert(one.count() ==
      Tables.events(spark, sf).filter(col("event_type") === "click").count())

    // dynamic pruning: a FILTERED dim join on the partition column
    // injects a runtime partition filter (dynamicpruning expression);
    // useStats=false so tiny local test sizes don't veto the rewrite
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    // dim must be a file relation: a LocalRelation constant-folds the
    // filter away and DPP's selective-predicate check then declines
    val dimPath = s"$out-dim"
    s2.createDataFrame(Seq(("click", 1), ("error", 2), ("view", 9)))
      .toDF("etype", "flag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = s2.read.parquet(dimPath).filter(col("flag") === 1)
    val j = s2.read.parquet(out).join(dim, "etype")
    j.count()
    val jPlan = j.queryExecution.executedPlan.toString
    assert(jPlan.toLowerCase.contains("dynamicpruning"), jPlan.take(1500))
  }

  test("withGroupSize: window-equal results; non-broadcast join-back " +
      "plans only hash-keyed exchanges, no window, no single-partition") {
    // Pins Skew.withGroupSize's universal scale claims beyond the
    // sweep's negative check. (1) Result identity with the window form
    // it replaced. (2) The shape that makes it skew-safe: with
    // broadcast disabled (at 100 TB a distinct-gram count table is not
    // broadcastable), the executed plan must contain NO WindowExec (no
    // single-task family sort), NO SinglePartition shuffle, and every
    // exchange hash-partitioned on real keys — the partitioning AQE's
    // skew split can act on. Deliberately NOT pinned: ReusedExchange.
    // Catalyst is free to rewrite the count side into its own
    // partial-agg chain (counting base's groups ≡ counting distinct
    // keys, so it elides base's final aggregate) — the first draft of
    // this test demanded ReusedExchange and the optimizer's CHEAPER
    // rewrite failed it; the doc and this spec now state the claim the
    // engine actually needs (bounded parallel recompute, never a
    // funnel).
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val base = Tables.documents(s, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"), col("doc_id")).agg(count(lit(1)).as("c"))
    val sized = Skew.withGroupSize(base, "w", "n_docs")
    val win = base.withColumn("n_docs", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("w"))))
    assert(sized.exceptAll(win).count() == 0 &&
      win.exceptAll(sized).count() == 0,
      "groupBy + join-back diverged from the window form")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, SinglePartition}
    val qe = sized.queryExecution
    qe.toRdd.count()
    val nodes = flatten(qe.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[WindowExec]),
      "join-back planned a window:\n" + qe.executedPlan.toString.take(1500))
    val badExchanges = nodes.collect {
      case e: ShuffleExchangeLike
        if e.outputPartitioning == SinglePartition ||
          !e.outputPartitioning.isInstanceOf[HashPartitioning] =>
        e.outputPartitioning.toString
    }
    assert(badExchanges.isEmpty,
      s"non-hash exchange(s) in the join-back plan: $badExchanges\n" +
        qe.executedPlan.toString.take(1500))
  }

  test("salted join equals plain join") {
    val fact = Tables.events(spark, sf)
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"))
      .withColumnRenamed("c_custkey", "user_id")
    val plain = fact.join(dim, "user_id")
      .groupBy("user_id").count()
      .orderBy("user_id").collect().toSeq
    val salted = Skew.saltedJoin(fact, dim, "user_id", salt = 8)
      .groupBy("user_id").count()
      .orderBy("user_id").collect().toSeq
    assert(salted == plain)
  }

  test("AQE skew split fires on a manufactured hot key; salted join agrees") {
    // Closes the one scale mechanism previously exercised only by
    // construction: manufacture a fact whose hottest key owns half the
    // rows, force the sort-merge path (broadcast off), lower the skew
    // thresholds to fixture scale, and demand the FINAL adaptive plan
    // actually ran a skew-split join (isSkewJoin on the executed SMJ /
    // SHJ node — the API flag, not a string match). Then demand the
    // explicit salting fallback (Skew.saltedJoin — the non-AQE path
    // q_join_salted declares) computes the identical multiset.
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val s2 = SparkTestSession.spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    // half the fact lands on key 7; every other row keeps a unique key
    val fact = s2.range(0, 200000).select(
      when(col("id") % 2 === 0, lit(7L)).otherwise(col("id")).as("k"),
      (col("id") * 31).as("payload"))
    val dim = s2.range(0, 100000).select(
      col("id").as("k"), (col("id") % 97).as("dval"))
    val skewJoined = fact.join(dim, "k")
    val qe = skewJoined.queryExecution
    qe.toRdd.count()
    val skewNodes = flatten(qe.executedPlan).collect {
      case j: SortMergeJoinExec if j.isSkewJoin    => j
      case j: ShuffledHashJoinExec if j.isSkewJoin => j
    }
    assert(skewNodes.nonEmpty,
      "AQE did not skew-split the hot partition:\n" +
        qe.executedPlan.treeString.linesIterator.take(40).mkString("\n"))
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8)
      .select(col("k"), col("payload"), col("dval"))
    val plain = skewJoined.select(col("k"), col("payload"), col("dval"))
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0,
      "salted join diverged from the AQE skew-split join")
  }

  test("streaming aggregation runs on the RocksDB state store") {
    import java.sql.Timestamp
    val s = SparkTestSession.rocksSession
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.StreamsSpec.Ev](s)
    val q = graft.streaming.Streams.tumblingAgg(mem.toDF()).writeStream
      .format("memory").queryName("rocks_out").outputMode("complete")
      .option("checkpointLocation",
        s"/tmp/graft-rocks-ckpt-${System.nanoTime()}")
      .start()
    mem.addData(Seq(
      graft.streaming.StreamsSpec.Ev(0, Timestamp.valueOf("2024-01-01 00:05:00"), 1, "click", 1.0),
      graft.streaming.StreamsSpec.Ev(1, Timestamp.valueOf("2024-01-01 00:20:00"), 1, "click", 2.0),
      graft.streaming.StreamsSpec.Ev(2, Timestamp.valueOf("2024-01-01 01:05:00"), 2, "view", 3.0)))
    q.processAllAvailable()
    val rows = s.table("rocks_out").collect()
    q.stop()
    assert(rows.map(_.getAs[Long]("n")).sum == 3)
  }

  test("GenSf growvocab: replica vocabularies disjoint, documents-only fixture") {
    val out = java.nio.file.Files.createTempDirectory("graft-sfv").toString
    graft.tools.GenSf.run(spark, sf, out, 3, "growvocab")
    // documents-only: the signature-path fixture must not duplicate the
    // tables that bijection mode already covers
    assert(new java.io.File(out).list().toSet == Set("documents.parquet"))
    val base = graft.io.Tables.documents(spark, sf)
    val grown = spark.read.parquet(s"$out/documents.parquet")
    val n0 = base.count()
    assert(grown.count() == 3 * n0)
    def vocabOf(df: org.apache.spark.sql.DataFrame): Long = df
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().count()
    // suffix tagging makes the three replica vocabularies pairwise
    // disjoint — total vocab is exactly ×replicas, which is what kills
    // the cross-replica LSH band-key collisions the bijection fixture
    // manufactures
    assert(vocabOf(grown) == 3 * vocabOf(base),
      s"vocab ${vocabOf(grown)}, want ${3 * vocabOf(base)}")
    // replica 0 is the identity rewrite: same text multiset as source
    // (replica key stride is max(doc_id)+1, not row count)
    val stride = base.agg(max(col("doc_id"))).first().getLong(0) + 1L
    val r0 = grown.filter(col("doc_id") < stride)
    assert(r0.select("text").except(base.select("text")).count() == 0 &&
      base.select("text").except(r0.select("text")).count() == 0)
  }

  test("GenSf sparsebatch: day-2 batch is family-free except the 1% keepers") {
    import graft.ops.Dedup
    val out = java.nio.file.Files.createTempDirectory("graft-sfsp").toString
    graft.tools.GenSf.run(spark, sf, out, 2, "sparsebatch")
    assert(new java.io.File(out).list().toSet == Set("documents.parquet"))
    val base = graft.io.Tables.documents(spark, sf)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.count() == 2 * base.count())
    val mod = Dedup.NewBatchMod
    val isBatch = pmod(col("doc_id"), lit(mod)) === Dedup.Day2Res
    val isKeeper = pmod(col("doc_id"), lit(100L * mod)) === Dedup.Day2Res
    // keepers are the declared ~1% of the batch and carry grown-vocab
    // text (no per-doc ~u suffix) — they still touch their dup family
    val keepers = docs.filter(isBatch && isKeeper)
    assert(keepers.count() > 0 &&
      keepers.count() * 50 <= docs.filter(isBatch).count(),
      "keeper fraction must be ≤ 2% of the batch")
    assert(keepers.filter(col("text").contains("~u")).count() == 0)
    // every non-keeper batch token is globally unique to its document:
    // the suffix ~u<id> makes each batch doc's vocabulary disjoint from
    // EVERY other document, so it can join no dup family
    val batchTok = docs.filter(isBatch && !isKeeper)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val allTok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val shared = batchTok.select(col("w"), col("doc_id").as("b_id")).distinct()
      .join(allTok.select(col("w"), col("doc_id").as("o_id")).distinct(), Seq("w"))
      .filter(col("b_id") =!= col("o_id"))
    assert(shared.count() == 0,
      "a uniquified batch token appears in another document")
    // family-slice geometry: no token is shared by more than 4 docs,
    // so no dup family can exceed 4 members — the many-small-families
    // real-corpus shape (the driver fixture's mega-clusters are the
    // hot-key-diversion case, not the refresh-economics baseline)
    val widest = allTok.distinct().groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .agg(max(col("nd"))).first().getLong(0)
    assert(widest <= 4, s"a token spans $widest docs — families not sliced")
  }

  test("prunedToCells resolve is probe-bounded: a corpus-shaped frame trips") {
    import graft.ops.Vectors
    // the declared coarse-index lookup collects (probe, probed cell)
    // pairs — search parameters. The guard must refuse anything
    // corpus-shaped BEFORE materializing it on the driver (the limit
    // is pushed into the plan, so even the trip reads ≤ bound+1 rows).
    val probeShaped = spark.range(40)
      .select((col("id") % 10).as("probe_id"), col("id").as("cell"))
    assert(Vectors.resolveProbeCells(probeShaped) == (0L until 40L))
    val corpusShaped = spark.range(Vectors.MaxResolvedCells + 1L)
      .select(col("id").as("cell"))
    val e = intercept[IllegalArgumentException] {
      Vectors.resolveProbeCells(corpusShaped)
    }
    assert(e.getMessage.contains("not probe-shaped"))
  }
}
