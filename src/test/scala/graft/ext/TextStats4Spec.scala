package graft.ext

import org.apache.spark.sql.functions._

import graft.pumle.SparkSpec

/** Specs for the round-4 text/profiling additions: per-source length
  * z-score, OOV rate, BPE pair statistics, and the composite Gopher
  * quality gate. Invariant-style (laws that hold for any corpus) plus
  * planted-signal checks. */
class TextStats4Spec extends SparkSpec {

  private def randomDocs(n: Int, seed: Long, vocab: Int = 40, len: Int = 25) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val t = Seq.fill(1 + rnd.nextInt(len))("w" + rnd.nextInt(vocab)).mkString(" ")
      (i.toLong, t, "src" + (i % 3), t.length.toLong)
    }.toDF("doc_id", "text", "source", "n_chars")
  }

  test("lengthZscore: constant-length group has z=0 everywhere; planted extreme is the outlier") {
    import spark.implicits._
    val const = (0 until 10).map(i => (i.toLong, "aaaa", "constant", 100L))
    val spread = (10 until 29).map(i => (i.toLong, "bbbb", "spread", 100L + (i % 5))) :+
      ((29L, "cccc", "spread", 100000L)) // the planted anomaly
    val docs = (const ++ spread).toDF("doc_id", "text", "source", "n_chars")
    val out = TextStats.lengthZscore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("z"), r.getAs[Boolean]("is_outlier"))).toMap
    (0L until 10L).foreach { id =>
      assert(out(id)._1 == 0.0 && !out(id)._2, s"constant group doc $id: ${out(id)}")
    }
    assert(out(29L)._2, "planted 100000-char doc not flagged")
    assert(out(29L)._1 > 2.0)
    // z-scores within a group sum to ~0 (population standardization)
    val spreadZ = (10L to 29L).map(out(_)._1).sum
    assert(math.abs(spreadZ) < 1e-3, s"spread-group z sum $spreadZ")
    assert(out.size == 30)
  }

  test("oovRate: a vocab covering every word gives rate 0; rates always in [0,1]") {
    val docs = randomDocs(30, seed = 3, vocab = 12)
    val full = TextStats.oovRate(docs, vocabSize = 1000).collect()
    assert(full.length == 30)
    full.foreach(r => assert(r.getAs[Long]("n_oov") == 0L
      && r.getAs[Double]("oov_rate") == 0.0, s"full-vocab OOV: $r"))
    val tight = TextStats.oovRate(docs, vocabSize = 4).collect()
    tight.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0, s"rate out of range: $r")
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_words"))
    }
    // a 4-word vocab over 12 distinct words must leave OOV somewhere
    assert(tight.map(_.getAs[Long]("n_oov")).sum > 0)
  }

  test("bpePairStats matches a hand-computed pair count") {
    import spark.implicits._
    // "abab" -> ab, ba, ab ; "abc" -> ab, bc ; single chars contribute none
    val docs = Seq((0L, "abab abc a"), (1L, "abc")).toDF("doc_id", "text")
    val got = TextStats.bpePairStats(docs, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 4L, "ba" -> 1L, "bc" -> 2L), s"got $got")
  }

  test("normalize: casefold + control strip + whitespace collapse, idempotent") {
    import spark.implicits._
    val docs = Seq(
      (0L, "Hello  World"),              // case + double space
      (1L, "hello world"),               // already canonical
      (2L, "hello\tworld\r"),            // control chars
      (3L, "HELLO WORLD ")).toDF("doc_id", "text")
    val out = TextStats.normalize(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2), r.getString(3))).toMap
    assert(out.values.map(_._1).toSet == Set("hello world"))
    // all four collapse to ONE canonical hash — the dedup prerequisite
    assert(out.values.map(_._3).toSet.size == 1)
    assert(!out(1L)._2 && out(0L)._2 && out(2L)._2 && out(3L)._2)
    // idempotent: normalizing the canonical form changes nothing
    val again = TextStats.normalize(
      docs.select(col("doc_id"), lit("hello world").as("text"))).collect()
    assert(again.forall(!_.getBoolean(2)))
  }

  test("normalizeUnicode folds accents and NFC-equivalent forms together") {
    import spark.implicits._
    val docs = Seq(
      (0L, "Café Résumé"),        // precomposed é
      (1L, "Café Résumé"),     // combining acute
      (2L, "cafe resume")).toDF("doc_id", "text")
    val out = TextStats.normalizeUnicode(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out.values.toSet.size == 1, s"forms did not fold together: $out")
  }

  test("bpeTrain learns the hand-computed merge sequence with deterministic tie-breaks") {
    import spark.implicits._
    // corpus "aaab aab bb":
    //   iter1 pair counts (overlapping): (a,a)=3, (a,b)=2, (b,b)=1 → merge aa (3)
    //   rewrite: [aa,a,b], [aa,b], [b,b]
    //   iter2: (aa,a)=1, (a,b)=1, (aa,b)=1, (b,b)=1 → tie, lex order → (a,b) (1)
    //   rewrite: [aa,ab], [aa,b], [b,b]
    //   iter3: (aa,ab)=1, (aa,b)=1, (b,b)=1 → tie → (aa,ab) (1)
    val docs = Seq((0L, "aaab aab bb")).toDF("doc_id", "text")
    val merges = TextStats.bpeTrain(docs, nMerges = 3)
    assert(merges == Seq(
      (1, "a", "a", "aa", 3L),
      (2, "a", "b", "ab", 1L),
      (3, "aa", "ab", "aaab", 1L)), s"got $merges")
  }

  test("bpeTrainVocab: trained symbols reconstruct every word and agree with bpeEncode") {
    import spark.implicits._
    val docs = randomDocs(30, seed = 11, vocab = 12, len = 20)
      .select(col("doc_id"), col("text"))
    val (merges, vocab) = TextStats.bpeTrainVocab(docs, nMerges = 6)
    assert(merges.size == 6)
    val rows = vocab.select(col("w"), col("syms")).collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
    assert(rows.nonEmpty)
    // lossless segmentation: the symbol sequence concatenates back to w
    rows.foreach { case (w, syms) => assert(syms.mkString == w, s"$w -> $syms") }
    // the trained vocabulary IS the encode: per-word segmentation equals
    // applying the merge table in order (the q150 join-encode contract)
    val enc = TextStats.bpeEncode(docs.limit(5), merges.map(m => (m._2, m._3)))
      .select(col("doc_id"), col("tokens")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val texts = docs.limit(5).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySym = rows.toMap
    texts.foreach { case (id, text) =>
      val expect = text.split(" ").filter(_.nonEmpty)
        .map(w => bySym(w).mkString(" ")).mkString(" </w> ")
      assert(enc(id) == expect, s"doc $id: ${enc(id)} != $expect")
    }
    vocab.unpersist(false)
  }

  test("bpeTrain greedy fold is exact on repeated-pair runs (the 'aaaaa' trap)") {
    import spark.implicits._
    // corpus "aaaaa aaaa abab ab" — hand-computed fold trajectory:
    //   step1: (a,a)=4+3=7 wins → aaaaa=[aa,aa,a], aaaa=[aa,aa]
    //     (a single space-padded replace would give [aa,a,aa] / [aa,a,a];
    //      iterating that replace to a fixed point still mis-orders the
    //      odd run as [aa,a,aa] — only the pending-symbol fold is right)
    //   step2: (a,b)=3 beats (aa,aa)=2 → abab=[ab,ab], ab=[ab]
    //   step3: (aa,aa)=2 wins ONLY under fold order → aaaaa=[aaaa,a]
    val docs = Seq((0L, "aaaaa aaaa abab ab")).toDF("doc_id", "text")
    val (merges, vocab) = TextStats.bpeTrainVocab(docs, nMerges = 3)
    assert(merges == Seq(
      (1, "a", "a", "aa", 7L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "aa", "aaaa", 2L)), s"got $merges")
    val segs = vocab.select(col("w"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(segs("aaaaa") == List("aaaa", "a"), s"got ${segs("aaaaa")}")
    assert(segs("aaaa") == List("aaaa"))
    assert(segs("abab") == List("ab", "ab"))
    vocab.unpersist(false)
  }

  test("bpeTrain stops early when no pairs remain and escapes quote symbols") {
    import spark.implicits._
    // single-char words only → zero adjacent pairs → no merges
    val empty = Seq((0L, "a b c")).toDF("doc_id", "text")
    assert(TextStats.bpeTrain(empty, nMerges = 5).isEmpty)
    // a quote character must survive the literal interpolation
    val quoted = Seq((0L, "a'b a'b")).toDF("doc_id", "text")
    val m = TextStats.bpeTrain(quoted, nMerges = 2)
    assert(m.head._4 == "a'" || m.head._4 == "'b", s"got $m")
    assert(m.size == 2) // second merge completes the word
  }

  test("bpeEncode round-trips: train → encode → detokenize == text") {
    val docs = randomDocs(30, seed = 9, vocab = 12, len = 20)
      .select(col("doc_id"), col("text"))
    val merges = TextStats.bpeTrain(docs, nMerges = 6).map(m => (m._2, m._3))
    assert(merges.nonEmpty)
    val enc = TextStats.bpeEncode(docs, merges)
    val joined = enc.join(docs, Seq("doc_id"))
      .withColumn("detok",
        regexp_replace(regexp_replace(col("tokens"), " ", ""), "</w>", " "))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[String]("detok") == r.getAs[String]("text"),
        s"round-trip broke: $r")
    }
    // the learned merges actually compress: fewer tokens than the
    // unmerged char count (chars-minus-spaces + word markers)
    val totalTokens = joined.map(_.getAs[Long]("n_tokens")).sum
    val naive = joined.map { r =>
      val t = r.getAs[String]("text")
      t.count(_ != ' ').toLong + t.count(_ == ' ').toLong // chars + markers
    }.sum
    assert(totalTokens < naive, s"no merge applied: $totalTokens vs $naive")
  }

  test("bpeEncode applies merges in table order (priority semantics)") {
    import spark.implicits._
    val d = Seq((1L, "abc")).toDF("doc_id", "text")
    // (a,b) first consumes the 'b' — the later (b,c) merge finds nothing
    val ab = TextStats.bpeEncode(d, Seq("a" -> "b", "b" -> "c"))
      .head().getAs[String]("tokens")
    assert(ab == "ab c", s"got '$ab'")
    // reversed priority: (b,c) first, so (a,b) finds nothing
    val bc = TextStats.bpeEncode(d, Seq("b" -> "c", "a" -> "b"))
      .head().getAs[String]("tokens")
    assert(bc == "a bc", s"got '$bc'")
  }

  test("gopherFilter: keep == (reason_mask == 0) and each bit matches its signal") {
    import spark.implicits._
    // small vocab → real violations (entropy ≤ ln 8 < 2.8 floors them all);
    // 30-unique-word docs pass every rule (entropy ln 30 ≈ 3.4, no dups,
    // top bigram 1/29) so BOTH verdicts occur
    val violators = randomDocs(60, seed = 5, vocab = 8, len = 60)
    val keepers = (100 until 110).map { i =>
      (i.toLong, (0 until 30).map(j => s"u${i}_$j").mkString(" "),
        "src" + (i % 3), 30L)
    }.toDF("doc_id", "text", "source", "n_chars")
    val out = TextStats.gopherFilter(violators.union(keepers)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val mask = r.getAs[Long]("reason_mask")
      assert(r.getAs[Boolean]("keep") == (mask == 0L), s"keep/mask mismatch: $r")
      val nWords = r.getAs[Long]("n_words")
      assert(((mask & 1L) != 0L) == (nWords < 20 || nWords > 10000), s"bit1: $r")
      assert(((mask & 2L) != 0L) == (r.getAs[Double]("dup_word_frac") > 0.6), s"bit2: $r")
      assert(((mask & 4L) != 0L) == (r.getAs[Double]("top_bigram_frac") > 0.06), s"bit4: $r")
      assert(((mask & 8L) != 0L) == (r.getAs[Double]("entropy") < 2.8), s"bit8: $r")
    }
    // the 8-word vocab at len<=60 must produce BOTH verdicts
    assert(out.exists(_.getAs[Boolean]("keep")) && out.exists(!_.getAs[Boolean]("keep")))
  }

  test("wordEntropy: 6-dp-midpoint doc rounds like the exact decimal value (precision-cap regression)") {
    import spark.implicits._
    // count multiset {1×6, 2×12, 3×3, 4×2, 5×1} (52 words, 24 distinct —
    // sf0.1 doc 2600): the raw entropy is 3.0731554999…, one 9th-decimal
    // slip in any summed term flips the 6-dp rounding to 3.073156. A
    // LongType multiplier used to widen the product past DECIMAL(38,.)
    // and silently drop the terms to scale 8 — this pins the fix.
    val words = Seq.fill(6)(1).zipWithIndex.flatMap { case (c, i) => Seq.fill(c)(s"a$i") } ++
      Seq.fill(12)(2).zipWithIndex.flatMap { case (c, i) => Seq.fill(c)(s"b$i") } ++
      Seq.fill(3)(3).zipWithIndex.flatMap { case (c, i) => Seq.fill(c)(s"c$i") } ++
      Seq.fill(2)(4).zipWithIndex.flatMap { case (c, i) => Seq.fill(c)(s"d$i") } ++
      Seq.fill(1)(5).zipWithIndex.flatMap { case (c, i) => Seq.fill(c)(s"e$i") }
    val docs = Seq((2600L, words.mkString(" "))).toDF("doc_id", "text")
    val rel = TextStats.wordEntropy(docs).head()
    assert(rel.getAs[Long]("n_words") == 52 && rel.getAs[Long]("n_distinct") == 24)
    assert(rel.getAs[Double]("entropy") == 3.073155, s"relational: $rel")
    val nar = TextStats.gopherFilterNarrow(docs).select("entropy").head()
    assert(nar.getDouble(0) == 3.073155, s"narrow: $nar")
  }

  test("urlNormalize: the full canonicalization contract on hand-built edge cases") {
    import spark.implicits._
    val cases = Seq(
      // (id, raw, expected (url_norm, host, registered_domain) — null = malformed)
      (1L, "HTTP://WWW.Example.COM:80/Path/A?utm_source=x&q=1&ref=h#frag",
        Some(("http://www.example.com/Path/A?q=1", "www.example.com", "example.com"))),
      (2L, "https://Example.co.uk:443/", // default port + bare root drop
        Some(("https://example.co.uk", "example.co.uk", "example.co.uk"))),
      (3L, "https://a.b.Example.com:8443/x/", // non-default port + deep trailing slash kept
        Some(("https://a.b.example.com:8443/x/", "a.b.example.com", "example.com"))),
      (4L, "http://user:pw@Host.IO/p?gclid=1&FBCLID=2&keep=3", // userinfo + case-insensitive keys
        Some(("http://host.io/p?keep=3", "host.io", "host.io"))),
      (5L, "ftp://Mirror.ac.jp:21/f", // non-http scheme: port kept, 2-level suffix
        Some(("ftp://mirror.ac.jp:21/f", "mirror.ac.jp", "mirror.ac.jp"))),
      (6L, "http://localhost/x", // single-label host: rd = host
        Some(("http://localhost/x", "localhost", "localhost"))),
      (7L, "http://e.com?utm_a=1&utm_b=2", // query only, all tracking → no '?'
        Some(("http://e.com", "e.com", "e.com"))),
      (8L, "  http://Pad.org/t  ", // surrounding whitespace trims
        Some(("http://pad.org/t", "pad.org", "pad.org"))),
      (9L, "not a url", None),
      (10L, "://nohost.com/x", None),
      (11L, "ht tp://bad-scheme.com", None),
      (12L, "http://", None)) // empty host
    val out = graft.ext.TextStats.urlNormalize(
        cases.map { case (id, raw, _) => (id, raw) }.toDF("doc_id", "url"))
      .orderBy("doc_id").collect()
    cases.zip(out).foreach { case ((id, raw, want), got) =>
      assert(got.getLong(0) == id)
      want match {
        case Some((n, h, rd)) =>
          assert((got.getString(2), got.getString(3), got.getString(4)) ==
            ((n, h, rd)), s"case $id: $raw")
        case None =>
          assert(got.isNullAt(2) && got.isNullAt(3) && got.isNullAt(4),
            s"case $id should be malformed: $raw → ${got}")
      }
    }
    // null input row → null outputs, no crash
    val nul = graft.ext.TextStats.urlNormalize(
      Seq((1L, Option.empty[String])).toDF("doc_id", "url")).collect()
    assert(nul(0).isNullAt(2))
  }

  test("gopherFilter signals agree with repetition() and wordEntropy() outputs") {
    val docs = randomDocs(25, seed = 9, vocab = 10)
    val gate = TextStats.gopherFilter(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_word_frac"), r.getAs[Double]("entropy"))).toMap
    val rep = TextStats.repetition(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_word_frac")).toMap
    val ent = TextStats.wordEntropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    gate.foreach { case (id, (dwf, e)) =>
      assert(dwf == rep(id), s"dup_word_frac diverges for $id")
      assert(e == ent(id), s"entropy diverges for $id")
    }
  }
}
