package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** HyperLogLog register-table semantics: rho bounds, estimator accuracy,
  * and the merge law (max-per-register over partial sketches equals the
  * sketch of the union — the property that makes the register table a
  * durable rollup at scale). */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private lazy val ids = spark.range(1000).toDF("id")

  test("registers: indexes in [0, 64), rho in [1, 55], one row per (g, reg)") {
    val regs = Sketches.hllRegisters(ids, lit("g"), col("id")).collect()
    assert(regs.nonEmpty && regs.length <= Sketches.HllM)
    assert(regs.forall { r =>
      val reg = r.getAs[Long]("reg"); val mx = r.getAs[Int]("mx")
      reg >= 0 && reg < Sketches.HllM && mx >= 1 && mx <= 55
    })
  }

  test("estimate: within 3 standard errors of 1000 true distinct; duplicates don't move it") {
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(ids, lit("g"), col("id")))
      .collect().head.getAs[Double]("est")
    // rse = 1.04/sqrt(64) ≈ 13% ⇒ 3σ ≈ 390
    assert(est > 610 && est < 1390, s"est $est")
    val dupEst = Sketches.hllEstimate(Sketches.hllRegisters(
        ids.union(ids).union(ids), lit("g"), col("id")))
      .collect().head.getAs[Double]("est")
    assert(dupEst === est) // insertion is idempotent by construction
  }

  test("merge law: folding per-group sketches equals sketching the union") {
    val byParity = Sketches.hllRegisters(ids, (col("id") % 2).cast("string"), col("id"))
    val merged = Sketches.hllMerge(byParity, "ALL")
      .select("g", "reg", "mx").as[(String, Long, Int)].collect().toSet
    val direct = Sketches.hllRegisters(ids, lit("ALL"), col("id"))
      .select("g", "reg", "mx").as[(String, Long, Int)].collect().toSet
    assert(merged === direct)
  }

  test("small-range correction: a 3-element set estimates (near) exactly via linear counting") {
    val tiny = spark.range(3).toDF("id")
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(tiny, lit("g"), col("id")))
      .collect().head.getAs[Double]("est")
    // m·ln(m/V) with V = 61 zero registers ⇒ ~3.05; far from alpha·m²/Z
    assert(est > 2.0 && est < 4.5, s"est $est")
  }

  test("hist sketch: quantiles of a uniform 0..999 stream land on the exact ranks") {
    val vals = spark.range(1000).toDF("id").select(col("id").cast("double").as("v"))
    val q = Sketches.histQuantiles(
        Sketches.histRegisters(vals, lit("g"), col("v"), width = 10.0), width = 10.0)
      .collect().head
    // each width-10 bin holds ranks [10b+1, 10b+10]; interpolation is exact
    // for uniform data: p50 → rank 500 ⇒ value 500.0 (bin 49 end)
    assert(q.getAs[Long]("n") === 1000L)
    assert(math.abs(q.getAs[Double]("p50") - 500.0) <= 10.0, s"p50 ${q.getAs[Double]("p50")}")
    assert(math.abs(q.getAs[Double]("p90") - 900.0) <= 10.0, s"p90 ${q.getAs[Double]("p90")}")
    assert(math.abs(q.getAs[Double]("p99") - 990.0) <= 10.0, s"p99 ${q.getAs[Double]("p99")}")
  }

  test("hist sketch merge law: per-group bins fold to the bins of the union") {
    val vals = spark.range(1000).toDF("id")
      .select((col("id") % 2).cast("string").as("par"), col("id").cast("double").as("v"))
    val parts = Sketches.histRegisters(vals, col("par"), col("v"), width = 7.0)
    val merged = Sketches.histMerge(parts, "ALL")
      .select("g", "bin", "cnt").as[(String, Long, Long)].collect().toSet
    val direct = Sketches.histRegisters(vals, lit("ALL"), col("v"), width = 7.0)
      .select("g", "bin", "cnt").as[(String, Long, Long)].collect().toSet
    assert(merged === direct)
  }

  test("set algebra: disjoint segments union to the sum, inclusion-exclusion nets ~0 overlap") {
    // segments A = 0..499, B = 500..999 — no shared members
    val rows = ((0 until 500).map(i => ("A", i.toLong)) ++
      (500 until 1000).map(i => ("B", i.toLong))).toDF("seg", "k")
    val regs = Sketches.hllRegisters(rows, col("seg"), col("k"))
    val est = Sketches.hllEstimate(
        regs.unionByName(Sketches.hllMerge(regs, "U")))
      .select("g", "est").as[(String, Double)].collect().toMap
    // union of disjoint 500+500 ≈ 1000 within HLL rse (m=64 → ~13%)
    assert(math.abs(est("U") - 1000.0) < 3 * 0.13 * 1000.0, est.toString)
    // inclusion-exclusion overlap estimate nets out near zero relative
    // to the union size for truly disjoint segments
    val inter = est("A") + est("B") - est("U")
    assert(math.abs(inter) < 0.5 * est("U"), s"overlap $inter vs ${est("U")}")
  }
}
