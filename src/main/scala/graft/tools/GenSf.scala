package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Volume-fixture generator: expands the driver's sf0.1 tables ~10x into
  * a local sf1 directory (`/root/repo/testdata/sf1` by default) so the
  * suite's scale claims (star-CC round counts, LSH skew split, candidate
  * pair growth, window/shuffle sizing) can be exercised against real
  * volume instead of asserted from plan shape. The driver's testdata is
  * read-only; this writes only inside the repo.
  *
  * Construction: K key-offset replicas of every fact/doc table (dims
  * `region`/`nation` stay single-copy — their keys are referenced
  * unchanged). Replica 0 is VALUE-identical to the original data (not
  * bit-identical: n_chars is recomputed as int32, text round-trips
  * through split/join, and timestamp columns are normalized ns→µs), so
  * every invariant the fixtures guarantee (31-word vocabulary, ~377
  * shingle universe, dup-group structure) is preserved and merely
  * repeated:
  *
  *  - `documents`: texts are re-written through a per-replica BIJECTION
  *    of the fixed 31-word vocabulary (seeded shuffle; replica 0 =
  *    identity). The vocabulary — and so the fixture-scale mask caps
  *    (≤64 tokens, ≤512 shingles; Dedup.scala) — is unchanged, while
  *    token SETS differ per replica, so near-dup structure stays
  *    realistic (per-replica clusters plus a thin cross-replica noise
  *    floor) instead of collapsing into 10x-denser clusters whose pair
  *    count would grow 100x.
  *  - `embeddings`: vectors are cyclically rotated by the replica index
  *    (norm-preserving, deterministic) so ANN bucket occupancy grows
  *    ~10x without creating 10 exact copies of every vector.
  *  - `events`: ids/users offset; timestamps unchanged — the stream
  *    windows see 10x event density over the same wall-clock month,
  *    which is exactly what a scale-up looks like to a windowed agg.
  *  - TPC-H-ish facts: all primary/foreign keys offset consistently so
  *    referential integrity holds within each replica.
  */
object GenSf {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/root/repo/testdata/sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    // "bijection" (default): the full fixture described above — vocab
    // unchanged, every table written. "growvocab": DOCUMENTS ONLY, with
    // replica k > 0 suffix-tagging every word (w → w~k), so vocabulary
    // grows ×replicas and cross-replica token sets are disjoint. This is
    // the signature-path fixture: on the bijection fixture every replica
    // draws band keys from the same 31-word universe, so LSH buckets
    // collide across replicas ~10× more than any real corpus's would —
    // the superlinear candidate growth VERDICT r5 measured is partly
    // that artifact. The grown-vocab fixture restores real-corpus bucket
    // behavior (dup families stay intra-replica) while deliberately
    // breaking the ≤64-token mask invariant, so only the mask-free
    // signature queries (minhash_lsh/verify/clusters_sig/hot_keys) may
    // run against it. "sparsebatch": realistic daily-ingest geometry,
    // two rewrites at once. (1) MANY SMALL FAMILIES: every non-batch
    // token is suffixed with its doc's 4-id family slice (~g<id/4>),
    // which fragments the driver fixture's handful of mega dup
    // clusters into ≤4-doc families — the real-web shape, where dup
    // families are millions of small clusters and the rare
    // boilerplate mega-cluster is the hot-key-diversion case, not the
    // norm. (2) SPARSE BATCH: the day-2 batch (final doc_id ≡ Day2Res
    // mod NewBatchMod) gets PER-DOCUMENT suffixes (~u<id>) instead,
    // so each batch doc's token set is globally unique and joins no
    // family, EXCEPT the 1-in-100 keepers (doc_id ≡ Day2Res mod
    // 100·NewBatchMod) that keep the family-sliced text and touch
    // their ≤4-doc family. On growvocab/bijection geometry the 10%
    // batch touches components covering ~80% of the corpus (measured:
    // 50 keepers → 39.6k of 50k docs members, because each keeper
    // lands in a mega-family), which makes "refresh the touched
    // components" cost MORE than full recompute; a real daily batch
    // touches ~1% of small families, and this fixture measures THAT
    // regime.
    val mode = if (args.length > 3) args(3) else "bijection"

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, replicas, mode)
    spark.stop()
  }

  /** Session-borrowing body so specs can exercise both modes without
    * `main` stopping their shared test session. */
  def run(spark: SparkSession, src: String, dst: String, replicas: Int,
      mode: String = "bijection"): Unit = {
    require(Set("bijection", "growvocab", "sparsebatch", "skewvec",
      "skewjoin")(mode),
      s"unknown GenSf mode: $mode")

    // "skewjoin": the bijection fixture with HOT JOIN/GROUP KEYS — the
    // adversarial input for the relational families (round-16 verdict
    // #7: saltedJoin / AQE skew splits / hot-key diversion were
    // asserted from plan shape, never measured on genuinely skewed
    // data). A deterministic 25% slice of each fact table is
    // redirected to ONE dimension key — the real-web shape (one
    // mega-customer, one commodity part, one bot user):
    //   orders:   o_orderkey % 4 == 0  → o_custkey = 0
    //   lineitem: l_orderkey % 4 == 0  → l_partkey = 0, l_suppkey = 0
    //   events:   event_id % 4 == 0    → user_id = 0
    // Everything else (docs, embeddings, dims, the other 75%) is the
    // bijection fixture byte-for-byte, so a BENCH_skewjoin run against
    // the same-scale testdata/sf1 isolates the skew penalty itself.
    // Implemented as a rewrite pass over the bijection output: the
    // redirection is pure key arithmetic, content-independent.
    if (mode == "skewjoin") {
      run(spark, src, dst, replicas, "bijection")
      def rewrite(name: String)(f: DataFrame => DataFrame): Unit = {
        val cur = f(spark.read.parquet(s"$dst/$name.parquet"))
          .localCheckpoint() // materialize before overwriting the source dir
        cur.write.mode("overwrite").parquet(s"$dst/$name.parquet")
        println(s"GENSF $name rows=${spark.read.parquet(s"$dst/$name.parquet").count()} (skewjoin)")
      }
      rewrite("orders")(df => df.withColumn("o_custkey",
        when(pmod(col("o_orderkey"), lit(4)) === 0, lit(0L))
          .otherwise(col("o_custkey"))))
      rewrite("lineitem")(df => df
        .withColumn("l_partkey",
          when(pmod(col("l_orderkey"), lit(4)) === 0, lit(0L))
            .otherwise(col("l_partkey")))
        .withColumn("l_suppkey",
          when(pmod(col("l_orderkey"), lit(4)) === 0, lit(0L))
            .otherwise(col("l_suppkey"))))
      rewrite("events")(df => df.withColumn("user_id",
        when(pmod(col("event_id"), lit(4)) === 0, lit(0L))
          .otherwise(col("user_id"))))
      return
    }

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // "skewvec": EMBEDDINGS-ONLY adversarial fixture for the ANN cell
    // audits (round-16 verdict #1: both stock fixtures are isotropic,
    // so q_sim_ann_cell_stats measured imbalance ≈1.3 — nothing to
    // catch). The mega-cell mechanism is EXACT-DUPLICATE embeddings —
    // the real-web case (boilerplate/template pages embed identically),
    // and the only one that concentrates at ANY scale: identical
    // vectors tie on every centroid cosine, the deterministic
    // (ccos DESC, cent_id ASC) tie-break sends ALL of them to one
    // cell, and no amount of Lloyd re-seeding can pull ties apart. (A
    // first cut used a tight Gaussian family, σ=0.02: at 20 k vectors
    // the ~35 family seeds split it into ~seed-count cells of ≈ mean
    // occupancy — measured imbalance only 2.0. Gaussian modes are what
    // k-means is GOOD at; duplicates are what breaks it.)
    //   - 25% hot duplicate family: probes 1–5 plus the trailing
    //     vec_id ≥ ¾·n block, every one EXACTLY the fixed center
    //     c_hot. The block sits OUTSIDE the seed range (seeds are the
    //     first ⌈√n⌉ ids), so the only in-family seeds are the 5
    //     probes — one inherits the whole family, four sit empty, and
    //     a hot probe's nprobe picks the mega-cell + ~nprobe normal
    //     cells: the scanned-rows blowup the audit must surface.
    //   - 15% in 3 Gaussian satellites (vec_id%20 ∈ 6..8 outside the
    //     hot block, 5% each): σ=0.15 around distinct centers —
    //     moderate clustering texture.
    //   - 60% isotropic N(0,1) background — the stock fixtures'
    //     regime, so the balanced part of the index stays normal.
    // Probe coverage by construction: probes 1-5 hot duplicates, 6-8
    // satellite members, 0 and 9 background. All randomness is
    // md5-derived (Box-Muller over two 32-bit md5 uniforms) — the
    // fixture is a pure function of (vec_id, dim position).
    if (mode == "skewvec") {
      val emb = read("embeddings")
      val dims = emb.select(size(col("embedding")).as("d")).distinct()
        .collect().map(_.getInt(0))
      require(dims.length == 1,
        s"embeddings must share one dimension, found ${dims.toSeq}")
      val dim = dims.head
      val n = emb.count() * replicas
      val hotFrom = 3L * n / 4
      def u(t: String) =
        s"((CAST(conv(substring(md5(CAST(($t) AS BINARY)),1,8),16,10) " +
          "AS DOUBLE)+0.5)/4294967296.0)"
      def z(t: String) =
        s"(sqrt(-2*ln(${u(s"($t)||'_a'")})) * cos(2*pi()*${u(s"($t)||'_b'")}))"
      val embExpr =
        s"""transform(sequence(0, ${dim - 1}), p -> CAST(
           |  CASE
           |    WHEN vec_id >= $hotFrom OR vec_id BETWEEN 1 AND 5 THEN
           |      2*${u("'hotc_'||p")} - 1
           |    WHEN pmod(vec_id, 20) BETWEEN 6 AND 8 THEN
           |      3*(2*${u("'satc_'||pmod(vec_id,20)||'_'||p")} - 1)
           |        + 0.15 * ${z("'s'||vec_id||'_'||p")}
           |    ELSE ${z("'b'||vec_id||'_'||p")}
           |  END AS FLOAT))""".stripMargin
      spark.range(n).select(col("id").as("vec_id"))
        .selectExpr("vec_id", s"$embExpr AS embedding",
          "CAST(pmod(vec_id, 10) AS INT) AS label")
        .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      val written = spark.read.parquet(s"$dst/embeddings.parquet").count()
      println(s"GENSF embeddings rows=$written (skewvec)")
      return
    }

    // Per-table key strides = source cardinality (keys are dense 0..N-1
    // in the driver fixtures; computed, not assumed, so a different
    // source SF still yields disjoint replica key spaces).
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).first().getLong(0) + 1L

    val docs = read("documents")

    /** Seeded vocabulary bijection for replica k (k=0 ⇒ identity);
      * bijection mode only — the one-time vocabulary collection and its
      * mask-cap invariant check live inside the closure so growvocab
      * mode never pays (or requires) either. */
    lazy val perm: Int => Map[String, String] = {
      val vocab = docs
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .distinct().orderBy(col("w"))
        .collect().map(_.getString(0)).toSeq
      require(vocab.size <= 64,
        s"vocabulary ${vocab.size} exceeds the fixture mask cap; " +
          "permutation would not preserve the ≤64-token invariant")
      (k: Int) =>
        if (k == 0) vocab.map(w => w -> w).toMap
        else vocab.zip(new scala.util.Random(0xC0FFEE + k).shuffle(vocab)).toMap
    }

    /** Per-replica document text rewrite, by mode. `fid` is the FINAL
      * (offset) doc_id — sparsebatch keys its day-2-batch residue
      * arithmetic off the id the engine will see. */
    def textReplica(k: Int, fid: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column = {
      def grown =
        if (k == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          w => when(length(w) > 0, concat(w, lit(s"~$k"))).otherwise(w)), " ")
      mode match {
        case "growvocab" => grown
        case "sparsebatch" =>
          val mod = graft.ops.Dedup.NewBatchMod
          val day2 = graft.ops.Dedup.Day2Res
          // ≤4-doc family slice: ids 4k..4k+3 share a vocabulary, so a
          // dup family can never span more than 4 documents (and the
          // slice tag also separates replicas — no ~k tag needed)
          val grp = floor(fid.cast("double") / 4.0).cast("long")
          val fam = array_join(transform(split(col("text"), " "),
            w => when(length(w) > 0, concat(w, lit("~g"), grp)).otherwise(w)),
            " ")
          val uniq = array_join(transform(split(col("text"), " "),
            w => when(length(w) > 0, concat(w, lit("~u"), fid)).otherwise(w)),
            " ")
          when(pmod(fid, lit(mod)) === day2 &&
              pmod(fid, lit(100L * mod)) =!= day2, uniq)
            .otherwise(fam)
        case _ =>
          val m = typedLit(perm(k))
          array_join(transform(split(col("text"), " "),
            w => when(length(w) > 0, element_at(m, w)).otherwise(w)), " ")
      }
    }

    def offset(c: String, k: Int, s: Long) = (col(c) + lit(k * s)).as(c)

    def writeUnion(name: String, parts: Seq[DataFrame]): Unit = {
      parts.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      val n = spark.read.parquet(s"$dst/$name.parquet").count()
      println(s"GENSF $name rows=$n")
    }

    val dN = stride(docs, "doc_id")

    writeUnion("documents", (0 until replicas).map { k =>
      docs.select(
        offset("doc_id", k, dN),
        textReplica(k, col("doc_id") + lit(k * dN)).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
    })

    // Growvocab/sparsebatch are documents-only signature-path fixtures
    // — every other table is byte-identical to what bijection mode
    // writes, so regenerating them here would only double fixture disk.
    if (mode == "growvocab" || mode == "sparsebatch") return

    // Dims referenced by unchanged keys: single copy.
    Seq("region", "nation").foreach { t =>
      read(t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    val customer = read("customer"); val cN = stride(customer, "c_custkey")
    val supplier = read("supplier"); val sN = stride(supplier, "s_suppkey")
    val part     = read("part");     val pN = stride(part, "p_partkey")
    val orders   = read("orders");   val oN = stride(orders, "o_orderkey")
    val lineitem = read("lineitem")
    val emb = read("embeddings");    val vN = stride(emb, "vec_id")

    writeUnion("customer", (0 until replicas).map(k =>
      customer.select(offset("c_custkey", k, cN), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))))

    writeUnion("supplier", (0 until replicas).map(k =>
      supplier.select(offset("s_suppkey", k, sN), col("s_name"),
        col("s_nationkey"), col("s_acctbal"))))

    writeUnion("part", (0 until replicas).map(k =>
      part.select(offset("p_partkey", k, pN), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))))

    writeUnion("orders", (0 until replicas).map(k =>
      orders.select(offset("o_orderkey", k, oN), offset("o_custkey", k, cN),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))))

    writeUnion("lineitem", (0 until replicas).map(k =>
      lineitem.select(offset("l_orderkey", k, oN), offset("l_partkey", k, pN),
        offset("l_suppkey", k, sN), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))))

    // events.ts is TIMESTAMP(NANOS) in the driver parquet; normalize to
    // µs on write (graft.io.Tables.events accepts either encoding).
    val events = graft.io.Tables.events(spark, src)
    val eN = stride(events, "event_id")
    val uN = stride(events, "user_id")
    writeUnion("events", (0 until replicas).map(k =>
      events.select(offset("event_id", k, eN), col("ts"),
        offset("user_id", k, uN), col("event_type"), col("value"),
        col("props"))))

    // Dimension is derived from the data, and unimodality enforced —
    // a mixed-dim fixture would otherwise silently emit truncated
    // vectors through slice() (the vocab path has the analogous
    // require; this one was latent until audited).
    val dims = emb.select(size(col("embedding")).as("d")).distinct()
      .collect().map(_.getInt(0))
    require(dims.length == 1,
      s"embeddings must share one dimension, found ${dims.toSeq}")
    val dim = dims.head
    writeUnion("embeddings", (0 until replicas).map { k =>
      val rot = k % dim
      val rotated =
        if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), 1, rot))
      emb.select(offset("vec_id", k, vN), rotated.as("embedding"),
        col("label"))
    })
  }
}
