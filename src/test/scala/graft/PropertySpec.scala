package graft

import graft.functions.keys
import graft.operators.RegionSort
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2): key-width, unsigned
  * ordering, reversal, salt-range, and partitioner-routing laws.
  * ScalaCheck is used as the generator (fixed seed ⇒ reproducible);
  * samples are batched into one DataFrame per law so each property is a
  * single Spark job. */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val asciiStr = Gen.asciiPrintableStr.map(_.take(80))

  test("md5CompositeKey width = 16 × #fields for arbitrary strings") {
    val rows = samples(Gen.zip(asciiStr, asciiStr, asciiStr, asciiStr), 200)
    val widths = rows.toDF("a", "b", "c", "d")
      .select(length(keys.md5CompositeKey(Seq(col("a"), col("b"), col("c"), col("d")))))
      .as[Int].collect()
    assert(widths.forall(_ === 64))
  }

  test("reverse ∘ reverse = identity on key strings") {
    val rows = samples(asciiStr, 200)
    val got = rows.toDF("v").select(col("v"), reverse(reverse(col("v"))))
      .as[(String, String)].collect()
    assert(got.forall { case (orig, rt) => orig == rt })
  }

  test("unsignedBytes is a total order consistent with HBase semantics") {
    val bytesGen = Gen.listOfN(8, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    val cmp = RegionSort.unsignedBytes
    samples(Gen.zip(bytesGen, bytesGen, bytesGen), 300).foreach { case (a, b, c) =>
      assert(math.signum(cmp.compare(a, b)) === -math.signum(cmp.compare(b, a)))
      if (cmp.compare(a, b) <= 0 && cmp.compare(b, c) <= 0)
        assert(cmp.compare(a, c) <= 0)
      assert(cmp.compare(a, a ++ Array[Byte](0)) < 0) // strict prefix sorts first
    }
  }

  test("salt prefix is always one ASCII digit within bucket range") {
    val ks = samples(Gen.chooseNum(Long.MinValue + 10, Long.MaxValue), 300)
    val salts = ks.toDF("k").select(keys.saltPrefix(col("k"), 10).cast("string"))
      .as[String].collect()
    assert(salts.forall(s => s.length == 1 && s.head.isDigit))
  }

  test("RegionPartitioner routes every key to the unique region containing it") {
    val splits = RegionSort.saltSplits(10)
    val p = new RegionSort.RegionPartitioner(splits)
    val keyGen = Gen.listOfN(6, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    samples(keyGen, 500).foreach { k =>
      val r = p.getPartition(k)
      assert(r >= 0 && r < 10)
      if (r > 0) assert(RegionSort.unsignedBytes.compare(splits(r - 1), k) <= 0)
      if (r < splits.length) assert(RegionSort.unsignedBytes.compare(k, splits(r)) < 0)
    }
  }

  test("cells explode: count = Σ non-null fields, for arbitrary null patterns") {
    val rows = samples(Gen.listOfN(5, Gen.option(asciiStr)), 100)
    val df = rows.map(f => (f(0).orNull, f(1).orNull, f(2).orNull, f(3).orNull, f(4).orNull))
      .toDF("c0", "c1", "c2", "c3", "c4")
    val cellCount = graft.operators.CellOps.explodeIndexed(
      df, keys.md5Raw(lit("k")), "c", (0 until 5).map(i => col(s"c$i"))).count()
    assert(cellCount === rows.map(_.count(_.isDefined)).sum)
  }
}
