package graft

import graft.operators.Bpe

/** Semantics of distributed BPE merge induction on constructed corpora
  * with hand-computed merge tables. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("merges follow frequency order with lexicographic tie-break") {
    // word freqs: the×2, cat, hat, then
    // round 1 pairs: (t,h)=3 (h,e)=3 (a,t)=2 (c,a)=1 (h,a)=1 (e,n)=1
    //   tie at 3 → lexicographic: (h,e) wins
    // round 2: the→[t,he], then→[t,he,n] ⇒ (t,he)=3 wins
    // round 3: (a,t)=2 from cat+hat
    val docs = Seq((0L, "the cat"), (1L, "the hat"), (2L, "then"))
      .toDF("doc_id", "text")
    val got = Bpe.merges(docs, 3).orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "h", "e", 3L), (2, "t", "he", 3L), (3, "a", "t", 2L)))
  }

  test("merge rewrite matches the canonical leftmost-greedy fold on pair chains") {
    // "ababab": round 1 merges (a,b)=3 → canonically [ab,ab,ab], which a
    // SINGLE replace pass cannot reach (consecutive ␟a␟b␟ occurrences
    // share a separator char; pass 1 rewrites the 1st and 3rd only) —
    // the round-2 count (ab,ab)=2 is visible proof the multi-pass
    // rewrite reached the canonical form
    val docs = Seq((0L, "ababab")).toDF("doc_id", "text")
    val got = Bpe.merges(docs, 3).orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "a", "b", 3L), (2, "ab", "ab", 2L), (3, "abab", "ab", 1L)))
  }

  test("word filter drops triple-run junk and out-of-range lengths") {
    val docs = Seq((0L, "aaaa ok x verylongwordthatkeepsgoingforever ok")).toDF("doc_id", "text")
    val wf = Bpe.wordFreq(docs).as[(String, Long)].collect().toMap
    assert(wf === Map("ok" -> 2L))
  }

  test("fertility applies the learned merges back to the corpus") {
    // after 3 merges (h,e)(t,he)(a,t): the→[the], then→[the,n],
    // cat→[c,at], hat→[h,at]
    val docs = Seq((0L, "the cat"), (1L, "the hat"), (2L, "then"))
      .toDF("doc_id", "text")
    val got = Bpe.fertility(docs, 3).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (0L, 2L, 3L, 1.5),   // the=1 sub, cat=2 subs
      (1L, 2L, 3L, 1.5),   // the=1, hat=2
      (2L, 1L, 2L, 2.0)))  // then=[the, n]
  }

  test("empty corpus yields zero merges") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.merges(docs, 2).count() === 0L)
  }
}
