package graft

import graft.functions.keys
import org.apache.spark.sql.functions._

/** Byte-fidelity vectors for the row-key expressions — everything downstream
  * depends on these exact bytes (SURVEY.md §7.4: byte fidelity is the top
  * risk; test vectors come before anything else). */
class KeyFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def bytesOf(c: org.apache.spark.sql.Column): Array[Byte] =
    Seq("x").toDF("v").select(c).head().getAs[Array[Byte]](0)

  test("md5Raw matches the RFC 1321 test vector, raw 16 bytes not hex") {
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72 (RFC 1321 A.5)
    val got = bytesOf(keys.md5Raw(lit("abc")))
    assert(got.length === 16)
    assert(got.map("%02x".format(_)).mkString === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("md5CompositeKey of 4 fields is 64 bytes = 4 concatenated digests") {
    val got = bytesOf(keys.md5CompositeKey(Seq(lit("a"), lit("b"), lit("c"), lit("d"))))
    assert(got.length === 64)
    val d1 = bytesOf(keys.md5Raw(lit("a")))
    assert(got.slice(0, 16).sameElements(d1))
    val d4 = bytesOf(keys.md5Raw(lit("d")))
    assert(got.slice(48, 64).sameElements(d4))
  }

  test("md5Raw digests UTF-8 bytes (non-ASCII input)") {
    // md5 of the UTF-8 encoding of "é" (0xC3 0xA9)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("é".getBytes("UTF-8"))
    assert(bytesOf(keys.md5Raw(lit("é"))).sameElements(expected))
  }

  test("beInt4 is big-endian 4-byte, matching HBase Bytes.toBytes(int)") {
    assert(bytesOf(keys.beInt4(lit(0))).sameElements(Array[Byte](0, 0, 0, 0)))
    assert(bytesOf(keys.beInt4(lit(1))).sameElements(Array[Byte](0, 0, 0, 1)))
    assert(bytesOf(keys.beInt4(lit(0x01020304))).sameElements(Array[Byte](1, 2, 3, 4)))
    assert(bytesOf(keys.beInt4(lit(-1))).sameElements(Array[Byte](-1, -1, -1, -1)))
    assert(bytesOf(keys.beInt4(lit(Int.MaxValue))).sameElements(
      Array[Byte](0x7f, -1, -1, -1)))
  }

  test("reversedKey reverses digits and yields UTF-8 bytes") {
    assert(new String(bytesOf(keys.reversedKey(lit(12345))), "UTF-8") === "54321")
  }

  test("saltPrefix is pmod-based ASCII decimal, stable for negatives") {
    assert(new String(bytesOf(keys.saltPrefix(lit(17), 10)), "UTF-8") === "7")
    assert(new String(bytesOf(keys.saltPrefix(lit(-3), 10)), "UTF-8") === "7")
  }

  test("saltedKey = salt bytes ++ key bytes") {
    val got = bytesOf(keys.saltedKey(lit(12), 10, keys.md5Raw(lit("x"))))
    assert(got.length === 17)
    assert(got(0) === '2'.toByte)
  }

  test("GraftExtensions injects SQL functions with no runtime registration") {
    // newSession() rebuilds session state from the injected extensions and
    // does NOT inherit temp functions registered elsewhere — resolving
    // be_int4/array_dot here proves the spark.sql.extensions deployment
    // path alone, as a cluster job using GraftSession would see it
    val fresh = spark.newSession()
    val r = fresh.sql(
      "SELECT lower(hex(be_int4(7))) AS q, array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d"
    ).head()
    assert(r.getString(0) === "00000007")
    assert(r.getDouble(1) === 11.0)
  }

  test("norm_text: NFC composes, ROOT lowercases, whitespace collapses, edges trim") {
    import graft.functions.NormalizeText.normText
    val r = spark.range(1).select(
      // A+combining-acute composes to Á before lowercasing; TAB/NL/VT and
      // space runs collapse to single spaces; edges trim away
      normText(lit("\t Á  b\n\nC ")).as("a"),
      normText(lit("STRAßE éÉ")).as("b"),
      normText(lit(" \t\n ")).as("c"),
      normText(lit(null).cast("string")).as("d")).head()
    assert(r.getString(0) === "á b c")
    assert(r.getString(1) === "straße éé")
    assert(r.getString(2) === "")
    assert(r.isNullAt(3))
  }

  test("norm_text resolves through the extensions-injected SQL registry") {
    val r = spark.newSession()
      .sql("SELECT norm_text('  Mixed   CASE\ttext ') AS x").head()
    assert(r.getString(0) === "mixed case text")
  }

  test("keyValueWire: exact KeyValue byte layout for a hand-computed cell") {
    // row="r", family="c", qualifier=BE int 1, value="v", ts=5:
    // keylen = 2+1+1+1+4+8+1 = 18, valuelen = 1
    val kv = bytesOf(keys.keyValueWire(
      lit("r").cast("binary"), lit("c").cast("binary"),
      keys.beInt4(lit(1)), lit("v").cast("binary"), lit(5L)))
    val expect = Array[Int](
      0, 0, 0, 18,            // keylen
      0, 0, 0, 1,             // valuelen
      0, 1, 'r',              // rowlen + row
      1, 'c',                 // famlen + family
      0, 0, 0, 1,             // qualifier
      0, 0, 0, 0, 0, 0, 0, 5, // timestamp
      4,                      // type = Put
      'v'                     // value
    ).map(_.toByte)
    assert(kv.toSeq === expect.toSeq)
  }

  test("md5Prefix64 is bit-identical to conv(substring(md5(x),1,n),16,10)") {
    import org.apache.spark.sql.types.{BinaryType, LongType}
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "héllo 世界", "RFC 1321 test vector")
      .toDF("s")
    for (n <- Seq(4, 7, 8, 15)) {
      val rows = inputs.select(
        keys.md5Prefix64(col("s").cast(BinaryType), n).as("fused"),
        conv(substring(md5(col("s").cast(BinaryType)), 1, n), 16, 10)
          .cast(LongType).as("composed")).collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1), s"n=$n"))
    }
    // n=16 fills the long (unsigned wrap; conv→cast overflows to null
    // there, so the expected value comes from the JVM digest directly)
    val full = inputs.select(col("s"),
      keys.md5Prefix64(col("s").cast(BinaryType), 16).as("fused")).collect()
    full.foreach { r =>
      val hex = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(r.getString(0).getBytes("UTF-8"))
      val expected = java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16)
      assert(r.getLong(1) === expected, r.getString(0))
    }
    intercept[IllegalArgumentException](keys.md5Prefix64(col("s"), 17))
  }

  test("keyValueWire fails fast on oversized fields instead of corrupting length prefixes") {
    import org.apache.spark.sql.types.BinaryType
    import spark.implicits._
    // a 65,536-byte row key needs 5 hex digits — lpad would TRUNCATE the
    // 2-byte rowlen prefix; the guard raises instead
    val df = Seq(1).toDF("x").select(
      keys.keyValueWire(
        encode(lpad(lit("r"), 65536, "r"), "UTF-8"),
        encode(lit("c"), "UTF-8"),
        encode(lit("q"), "UTF-8"),
        encode(lit("v"), "UTF-8"),
        lit(0L)).as("kv"))
    val e = intercept[Exception](df.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("does not fit")), e.toString)
    // in-range cells still serialize (same call shape, 1-byte row)
    val ok = Seq(1).toDF("x").select(keys.keyValueWire(
      encode(lit("r"), "UTF-8"), encode(lit("c"), "UTF-8"),
      encode(lit("q"), "UTF-8"), encode(lit("v"), "UTF-8"), lit(0L)).as("kv"))
    assert(ok.head().getAs[Array[Byte]](0).length > 0)
  }
}
