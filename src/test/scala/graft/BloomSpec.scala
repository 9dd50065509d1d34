package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.{keys, BloomRuntime, BloomSet}
import graft.operators.CorpusPipeline

class BloomSpec extends SparkSuite {
  import spark.implicits._

  private val bits = 1 << 16
  private val k = 5

  private def image(df: org.apache.spark.sql.DataFrame, nBits: Int = bits): Array[Byte] =
    df.agg(BloomSet.bloomAgg(keys.md5Raw(col("s")), nBits, k).as("b"))
      .head().getAs[Array[Byte]]("b")

  test("bloom has no false negatives and a sane false-positive rate") {
    val inserted = (0 until 2000).map(i => s"gram-$i")
    val img = image(inserted.toDF("s"))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def m(s: String) = md5.digest(s.getBytes("UTF-8"))
    assert(inserted.forall(s => BloomRuntime.mightContain(img, m(s), k)),
      "an inserted key answered might_contain = false")
    // 2000 keys in 2^16 bits, k=5 → theoretical fpp ≈ (1-e^(-5*2000/65536))^5 ≈ 0.05%
    val probes = (0 until 20000).map(i => s"absent-$i")
    val fp = probes.count(s => BloomRuntime.mightContain(img, m(s), k))
    assert(fp < 200, s"false-positive rate implausibly high: $fp / 20000")
  }

  test("bloom image is bit-identical under any partitioning (OR-merge)") {
    val vals = (0 until 5000).map(i => s"v$i")
    val one = image(vals.toDF("s").repartition(1))
    val many = image(vals.toDF("s").repartition(13))
    assert(java.util.Arrays.equals(one, many),
      "partial-aggregate merge changed the bloom image")
  }

  test("empty input yields the all-zeros image (nothing matches)") {
    val img = image(Seq.empty[String].toDF("s"))
    assert(img.length == bits / 8 && img.forall(_ == 0))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    assert(!BloomRuntime.mightContain(img, md5.digest("x".getBytes("UTF-8")), k))
  }

  test("bloom-prefiltered decontamination equals the plain exact form") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val train = docs.where(pmod(col("doc_id"), lit(50)) =!= 0)
    val eval = docs.where(pmod(col("doc_id"), lit(50)) === 0)
    val plain = CorpusPipeline.evalNgramDecontaminate(train, eval, 3)
      .select("doc_id").as[Long].collect().sorted
    val bloomed = CorpusPipeline.evalNgramDecontaminateBloom(train, eval, 3)
      .select("doc_id").as[Long].collect().sorted
    assert(plain.sameElements(bloomed),
      "bloom prefilter changed the decontamination answer")
    assert(plain.nonEmpty)
  }

  test("the probe expression compiles into codegen (no eval fallback)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val img = image(docs.limit(10).select(col("text").as("s")), nBits = 1024)
    // probe over a real (non-local) scan so the filter plans a codegen span
    val probed = docs.select(col("doc_id"), col("text"))
      .where(BloomSet.mightContain(lit(img), keys.md5Raw(col("text")), k))
    assert(probed.count() >= 10, "inserted texts must probe true")
    // the `*(n)` markers are the WholeStageCodegen spans in tree form
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter bloom_might_contain"),
      s"probe fell out of whole-stage codegen:\n$plan")
  }
}
