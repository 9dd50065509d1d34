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
}
