package graft.functions

import org.apache.spark.sql.functions._

import graft.ext.TextStats
import graft.pumle.SparkSpec

/** The compiled `bpe_tokens` expression must be bit-identical to the
  * replace-chain form ([[TextStats.bpeEncode]]) it scales past — same
  * split semantics, same in-table-order merge application, same
  * resume-after-replacement quirk, same `</w>` joining — and must keep
  * working where the chain can't go (≥1k merges). */
class BpeTokensSpec extends SparkSpec {

  private val merges = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")

  private def assertEqualForms(docs: org.apache.spark.sql.DataFrame,
      ms: Seq[(String, String)]): Unit = {
    val chain = TextStats.bpeEncode(docs, ms).orderBy("doc_id").collect()
    val fast = TextStats.bpeEncodeFast(docs, ms).orderBy("doc_id").collect()
    assert(chain.length == fast.length)
    chain.zip(fast).foreach { case (a, b) =>
      assert(a == b, s"chain $a != compiled $b")
    }
  }

  test("bpe_tokens == replace chain on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val alpha = "theinandor"
    val docs = (0 until 60).map { i =>
      val words = (0 until 1 + rnd.nextInt(30)).map { _ =>
        (0 until 1 + rnd.nextInt(8)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    assertEqualForms(docs, merges)
  }

  test("bpe_tokens replicates replace's resume-after-replacement quirk") {
    import spark.implicits._
    // "abab..." runs: ' a b a b ' -> ' ab a b ' (the merged pair
    // consumes its trailing delimiter, blocking the NEXT pair), plus
    // self-pair runs 'aaaa' and cascade merges (th -> the)
    val docs = Seq(
      (0L, "abab ababab aaaa aaa aa"),
      (1L, "ththe thethe ththth"),
      (2L, "inin anan andand rere"),
      (3L, "a  b "), (4L, ""), (5L, " "), (6L, "x"),
      (7L, "the the the")).toDF("doc_id", "text")
    assertEqualForms(docs, Seq("a" -> "b", "a" -> "a") ++ merges)
  }

  test("bpe_tokens splits symbols by code point (supplementary chars)") {
    import spark.implicits._
    val docs = Seq((0L, "a😀b a😀"), (1L, "😀😀"))
      .toDF("doc_id", "text")
    // merge on the emoji itself: surrogate pairs must stay one symbol
    assertEqualForms(docs, Seq("a" -> "😀", "😀" -> "😀"))
  }

  test("bpe_tokens caps at 4096 words like the chain form") {
    import spark.implicits._
    val docs = Seq((0L, Seq.fill(5000)("th").mkString(" "))).toDF("doc_id", "text")
    val r = TextStats.bpeEncodeFast(docs, merges).head()
    // 4096 words of 'th' -> one 'th' token each + 4095 markers
    assert(r.getAs[Long]("n_tokens") == 4096L + 4095L)
    assertEqualForms(docs, merges)
  }

  test("two merge tables coexist: registration binds at analysis time") {
    import spark.implicits._
    val docs = Seq((0L, "abc")).toDF("doc_id", "text")
    val fa = TextStats.bpeEncodeFast(docs, Seq("a" -> "b"))
    val fb = TextStats.bpeEncodeFast(docs, Seq("b" -> "c"))
    assert(fa.head().getString(1) == "ab c")
    assert(fb.head().getString(1) == "a bc")
    assert(fa.head().getString(1) == "ab c") // fa unchanged after fb's re-registration
  }

  test("bpe_tokens handles a 1k-merge table (the chain form's design limit)") {
    import spark.implicits._
    // synthesize a deterministic 1.3k-entry table: all letter pairs
    // 'aa'..'zz' plus chained growth on 'a'
    val letters = ('a' to 'z').map(_.toString)
    val pairs = for (l <- letters; r <- letters) yield (l, r)
    val chained = (1 to 700).scanLeft("aa") { case (acc, _) => acc + "a" }
      .sliding(2).map(w => (w(0), "a")).toSeq
    val table = (pairs ++ chained).take(1300)
    assert(table.length >= 1000)
    val docs = Seq((0L, "the quick brown fox aaaaaaaa zz"),
      (1L, Seq.fill(50)("jumps").mkString(" "))).toDF("doc_id", "text")
    val out = TextStats.bpeEncodeFast(docs, table).orderBy("doc_id").collect()
    // 'aa' merges first (table order), then 'aaa', ... so 'aaaaaaaa'
    // collapses under the chained merges; spot-pin doc 0
    assert(out(0).getString(1).nonEmpty)
    // and the encode is deterministic across a second run (memo cache)
    val again = TextStats.bpeEncodeFast(docs, table).orderBy("doc_id").collect()
    assert(out.toSeq == again.toSeq)
  }

  test("BpeTable.encodeWord: exact segmentation spot checks") {
    val t = new BpeTable(Seq(("a", "b"), ("ab", "c")))
    // second 'ab c' blocked: the first 'abc' consumed its trailing space
    assert(t.encodeWord("abcabc") == "abc ab c")
    assert(t.encodeWord("ababab") == "ab a b ab") // quirk: 2nd pair blocked
    assert(t.encodeWord("") == "")
    assert(t.encodeWord("z") == "z")
    val self = new BpeTable(Seq(("a", "a")))
    assert(self.encodeWord("aaaa") == "aa a a") // ' a a a a ' -> ' aa a a '
  }
}
