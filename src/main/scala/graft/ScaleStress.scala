package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off DECADE scale-stress (VERDICT r9 #2): every scale claim in tree
  * is argued from plan shape at sf0.1 — this main buys one decade of real
  * evidence. It derives a ~sf1 dataset from sf0.1 (x`reps` replication
  * with disjoint key spaces), times the heaviest declared queries at both
  * scales, and prints per-query wall-times with the empirical scaling
  * exponent alpha = ln(t_big/t_small)/ln(reps) — alpha ~ 1 is linear,
  * alpha >> 1 names the next weak component. Results are recorded in
  * BASELINE.md; this is NOT part of the standing bench.
  *
  * Replication is semantics-preserving per decade:
  *  - `lineitem` x10 with l_orderkey/l_partkey/l_suppkey shifted by
  *    10M/replica — 10 disjoint copies of the co-purchase graph, so the
  *    degree distribution (what graph cost scales with) is unchanged;
  *    price/quantity columns replicate, keeping value distributions.
  *  - `documents` x10 with doc_id shifted and replica r > 0 vocabularies
  *    SUBSTITUTED through a per-replica token cipher: every similarity
  *    relation within a replica is preserved exactly (isomorphic
  *    corpora), cross-replica vocabularies are disjoint — the duplication
  *    RATE stays the corpus's own, instead of every doc gaining 9
  *    near-copies.
  *  - `events` x10 with event_id/user_id shifted per replica (disjoint
  *    user populations, same temporal profile).
  *  - everything else copies through unchanged.
  */
object ScaleStress {

  private val Targets = Seq(
    "q_histogram_equidepth", "graph_pagerank", "graph_ppr", "graph_cc_star",
    "dedup_corpus", "dedup_clusters", "corpus_split_leakage_safe",
    "stream_late_drop",
    // second wave: the rest of the bench top — embedding-space dedup/ANN
    // (decade via the signed-permutation transform below), the remaining
    // text-dedup heavies, streaming index maintenance, graph census
    "dedup_embedding", "ann_whitened_topk", "ann_cosine_pairs",
    "dedup_minhash_est", "dedup_ngram_jaccard", "stream_dedup_incremental",
    "graph_modularity",
    // third wave: the q relational family (the largest bench family) —
    // orders/supplier/part/customer now replicate WITH shifted keys, so
    // every fact-dim join matches within its replica (a true decade, not
    // a 90%-dangling-FK join that silently drops 9 replicas)
    "q21_sole_late_supplier", "q16_supplier_variety", "q_distinct_agg",
    "q_ivm_join_view", "q1_pricing_summary",
    // store maintenance: min-of-2 serves the second run from the durable
    // store, so the measured cost is the MAINTENANCE path (batch-sized
    // probe + verify against the persisted index), not the store build
    "dedup_store_incremental")

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def unpersistAll(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

  /** Deterministic per-replica token SUBSTITUTION (a vocabulary cipher):
    * every token t becomes an 8-hex pseudo-token md5(t ++ replica tag).
    * This is the isomorphic-decade transform: sequence structure, token
    * frequencies, and every within-replica similarity relation are
    * preserved exactly (the mapping is per-replica consistent), while
    * cross-replica vocabularies are DISJOINT — so the scaled corpus has
    * the original's duplication profile at 10x the rows, rather than
    * manufactured cross-replica near-dups.
    *
    * (The first cut of this transform SORTED tokens by a per-replica
    * hash — which canonicalizes word order and turns every pair of docs
    * sharing vocabulary into sequence-near-dups: LSH candidates blew up
    * 20,000x while true pairs grew 10x. Kept as a cautionary note; that
    * adversarial corpus is reported separately in SCALESTRESS.md.) */
  private def cipheredText(r: Int) = expr(
    s"concat_ws(' ', transform(split(text, ' '), t -> substr(md5(concat(t, 'r$r')), 1, 8)))")

  private def buildScaled(spark: SparkSession, src: String, dst: String,
                          reps: Int): Unit = {
    val Shift = 10000000L
    def reps10(f: Int => DataFrame): DataFrame =
      (0 until reps).map(f).reduce(_ unionByName _)
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    write(reps10 { r =>
      li.select(
        (col("l_orderkey") + lit(r * Shift)).as("l_orderkey"),
        (col("l_partkey") + lit(r * Shift)).as("l_partkey"),
        (col("l_suppkey") + lit(r * Shift)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }, "lineitem")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    write(reps10 { r =>
      val text = if (r == 0) col("text") else cipheredText(r)
      docs.select((col("doc_id") + lit(r * Shift)).as("doc_id"),
        text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }, "documents")

    val ev = spark.read.parquet(s"$src/events.parquet")
    write(reps10 { r =>
      ev.select((col("event_id") + lit(r * Shift)).as("event_id"), col("ts"),
        (col("user_id") + lit(r * Shift)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }, "events")

    // embeddings x10 through a per-replica SIGNED PERMUTATION of the
    // dimensions (an orthogonal transform): every inner product within a
    // replica is preserved EXACTLY — the embedding-space isomorphism
    // matching the text cipher — while a vector and its cross-replica
    // image decorrelate like random pairs. Permutation/signs are
    // md5-derived per (replica, dim), built once on the driver.
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val d = emb.select(size(col("embedding"))).head().getInt(0)
    def h(r: Int, i: Int): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"perm|$r|$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    write(reps10 { r =>
      if (r == 0)
        emb.select(col("vec_id"), col("embedding"), col("label"))
      else {
        val perm = (0 until d).sortBy(h(r, _))
        val sign = (0 until d).map(i => if (h(r, i + d).head < '8') 1.0f else -1.0f)
        val mapped = array(perm.zip(sign).map { case (p, s) =>
          (element_at(col("embedding"), p + 1) * lit(s)).cast("float")
        }: _*)
        emb.select((col("vec_id") + lit(r * Shift)).as("vec_id"),
          mapped.as("embedding"), col("label"))
      }
    }, "embeddings")

    // dims replicate WITH shifted surrogate keys so every lineitem FK
    // resolves within its replica (nation/region keys are small fixed
    // vocabularies — they stay put, and the dim rows keep referencing
    // them). Without this the q-family joins silently drop 9/10 replicas.
    val ord = spark.read.parquet(s"$src/orders.parquet")
    write(reps10 { r =>
      ord.select((col("o_orderkey") + lit(r * Shift)).as("o_orderkey"),
        (col("o_custkey") + lit(r * Shift)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }, "orders")
    val cust = spark.read.parquet(s"$src/customer.parquet")
    write(reps10 { r =>
      cust.select((col("c_custkey") + lit(r * Shift)).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }, "customer")
    val sup = spark.read.parquet(s"$src/supplier.parquet")
    write(reps10 { r =>
      sup.select((col("s_suppkey") + lit(r * Shift)).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal"))
    }, "supplier")
    val prt = spark.read.parquet(s"$src/part.parquet")
    write(reps10 { r =>
      prt.select((col("p_partkey") + lit(r * Shift)).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice"))
    }, "part")

    Seq("region", "nation")
      .foreach(n => write(spark.read.parquet(s"$src/$n.parquet"), n))
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "10").toInt
    val spark = GraftSession.local("graft-scalestress", 32)
    val dst = java.nio.file.Files.createTempDirectory("graft-scalestress").toString
    System.err.println(s"[scalestress] building x$reps dataset at $dst")
    buildScaled(spark, src, dst, reps)

    def time(name: String, dir: String): Double = {
      // min of 2 (ambient-noise damping; same rationale as Bench)
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        force(SparkEntry.queries(name)(spark, dir))
        unpersistAll(spark)
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    // warmup
    try force(SparkEntry.queries("q1_pricing_summary")(spark, src))
    catch { case _: Throwable => () }
    unpersistAll(spark)

    // optional args = subset of Targets (re-measuring one family)
    val picked = if (args.isEmpty) Targets else Targets.filter(args.toSet)
    val rows = picked.map { name =>
      val small = time(name, src)
      System.err.println(f"[scalestress] $name%-28s sf0.1 $small%7.2f s")
      val big = time(name, dst)
      val alpha = math.log(big / small) / math.log(reps.toDouble)
      System.err.println(f"[scalestress] $name%-28s x$reps   $big%7.2f s  alpha=$alpha%5.2f")
      (name, small, big, alpha)
    }
    val table = rows.map { case (n, s, b, a) =>
      f"| $n | $s%.2f | $b%.2f | $a%.2f |"
    }.mkString(
      s"| query | sf0.1 s | x$reps s | alpha |\n|---|---|---|---|\n", "\n", "\n")
    // subset runs land in a side file: SCALESTRESS.md is the curated
    // cross-round table and a partial re-measure must not clobber it
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        if (args.isEmpty) "SCALESTRESS.md" else "SCALESTRESS_partial.md"),
      s"# Decade scale-stress (sf0.1 -> x$reps, min-of-2, local[32])\n\n" +
        "alpha = ln(t_big/t_small)/ln(reps); ~1.0 linear, >1.3 investigate.\n\n" +
        table)
    println(rows.map { case (n, s, b, a) =>
      s""""$n":{"small":${f"$s%.2f"},"big":${f"$b%.2f"},"alpha":${f"$a%.2f"}}"""
    }.mkString("{", ",", "}"))
    spark.stop()
  }
}
