package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.TextExpressions._
import graft.functions.{VectorFunctions => V}

class TextExpressionsSpec extends SparkSpec with Matchers {

  test("embed_text: deterministic, unit-norm, fixed dim") {
    val s = spark
    import s.implicits._
    val d = Seq("the quick brown fox", "the quick brown fox", "entirely different words here")
      .toDF("text")
    val out = d.select(embed_text(col("text"), 32).as("v"))
      .select(col("v"), org.apache.spark.sql.functions.size(col("v")).as("n"),
        V.l2norm(col("v")).as("norm"))
      .collect()
    out.foreach { r => r.getInt(1) shouldBe 32 }
    out(0).getDouble(2) shouldBe 1.0 +- 1e-6
    out(0).getSeq[Float](0) shouldBe out(1).getSeq[Float](0) // deterministic
    out(0).getSeq[Float](0) should not be out(2).getSeq[Float](0)
  }

  test("word_shingle_hashes: set-equal to FNV of the HOF string-shingle composition") {
    val s = spark
    import s.implicits._
    // edge cases: empty, whitespace-only, leading/trailing non-space ws,
    // short docs (< n words), repeated shingles, multi-byte UTF-8, case
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "", "   ", "\tleading tab", "trailing newline\n", "a\t\nb",
      "one", "one two", "one two three",
      "dup dup dup dup dup dup",
      "Ünïcödé ÉSZAKI szöveg próba Ünïcödé ÉSZAKI szöveg",
      "MIXED Case TEXT mixed case text MIXED Case TEXT")
    val df = texts.toDF("text")
    val viaStrings = df.select(
        graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
      .collect()
      .map(_.getSeq[String](0).map(graft.functions.Hashing.fnv1a64).toSet)
    val viaOnePass = df.select(word_shingle_hashes(col("text"), 3).as("hs"))
      .collect()
      .map(_.getSeq[Long](0).toSet)
    viaOnePass should contain theSameElementsInOrderAs viaStrings
    // n=1 (unigram) path too
    val uni = df.select(word_shingle_hashes(col("text"), 1)).collect()
      .map(_.getSeq[Long](0).toSet)
    val uniStr = df.select(
        graft.functions.TextFunctions.wordShingles(col("text"), 1).as("sh"))
      .collect().map(_.getSeq[String](0).map(graft.functions.Hashing.fnv1a64).toSet)
    uni should contain theSameElementsInOrderAs uniStr
  }

  test("minhash_sig: identical signatures from string shingles and hashed shingles") {
    val s = spark
    import s.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog and runs away fast")
      .toDF("text")
    val fromStrings = df.select(
      minhash_sig(graft.functions.TextFunctions.wordShingles(col("text"), 3), 64))
      .first().getSeq[Long](0)
    val fromHashes = df.select(
      minhash_sig(word_shingle_hashes(col("text"), 3), 64))
      .first().getSeq[Long](0)
    fromHashes shouldBe fromStrings
  }

  test("simhash64: near-identical texts are close in Hamming space, unrelated far") {
    val s = spark
    import s.implicits._
    val d = Seq(
      ("a", "the cat sat on the mat and looked at the dog outside the window today"),
      ("b", "the cat sat on the mat and looked at the dog outside the door today"),
      ("c", "completely unrelated gibberish tokens quantum flux reactor panels seven")).toDF("id", "t")
    val fp = d.select(col("id"), simhash64(col("t")).as("h"))
    val m = fp.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    java.lang.Long.bitCount(m("a") ^ m("b")) should be < 16
    java.lang.Long.bitCount(m("a") ^ m("c")) should be > 16
  }

  test("rolling_hash: deterministic, content-sensitive, in [0, 2^61)") {
    val s = spark
    import s.implicits._
    val d = Seq("abc", "abc", "abd").toDF("t")
    val hs = d.select(rolling_hash(col("t"))).collect().map(_.getLong(0))
    hs(0) shouldBe hs(1)
    hs(0) should not be hs(2)
    all(hs) should be >= 0L
    all(hs) should be < (1L << 61)
  }

  test("hamming64 exact") {
    val s = spark
    import s.implicits._
    val d = Seq((0L, 7L)).toDF("a", "b")
    d.select(hamming64(col("a"), col("b"))).collect()(0).getInt(0) shouldBe 3
  }

  test("gptPretokens: GPT-2-style splits — contractions, space-prefixed runs") {
    val s = spark
    import s.implicits._
    val toks = Seq("It's 42 words, isn't it?").toDF("t")
      .select(graft.functions.TextFunctions.gptPretokens(col("t")))
      .collect()(0).getSeq[String](0)
    // contraction suffixes split off; letter/digit/punct runs carry their
    // leading space; whitespace-only runs survive as tokens
    toks shouldBe Seq("It", "'s", " 42", " words", ",", " isn", "'t", " it", "?")
  }

  test("repetitionSignals (q68 core): planted repetitive vs clean docs") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "spam spam spam spam"),            // 4 toks, 1 distinct; 3 identical bigrams
      (2L, "all words here are unique ones"), // 6 toks, 6 distinct; 5 distinct bigrams
      (3L, "one"),                            // single token: no bigrams
      (4L, "go go stop go go"),               // top bigram "go go" = 2 of 4
      (5L, null.asInstanceOf[String])         // NULL text ≡ '' (1 empty token)
    ).toDF("doc_id", "text")
    val out = graft.queries.TextQueries.repetitionSignals(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    out(1L) shouldBe ((4, 0.75, 3L, 3L, 1.0))
    out(2L) shouldBe ((6, 0.0, 5L, 1L, 0.2))
    out(3L) shouldBe ((1, 0.0, 0L, 0L, 0.0))
    out(4L) shouldBe ((5, 0.6, 4L, 2L, 0.5))
    out(5L) shouldBe ((1, 0.0, 0L, 0L, 0.0)) // not (-1, …): the null guard
  }

  test("q69 split assignment: id-keyed (content-independent), total, ~98/1/1") {
    val s = spark
    import s.implicits._
    val q = graft.queries.TextQueries.defs("q69_split_assign")
    val out = q(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    out.size shouldBe 500 // total: every document assigned exactly once
    val frac = out.values.count(_ == "train").toDouble / out.size
    frac should (be >= 0.93 and be <= 1.0) // 98% ± binomial noise at n=500
    // id-keyed: the same ids at a different SF (different text lengths,
    // same id range) get IDENTICAL splits — re-cleaning can't leak eval
    val other = q(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    other.foreach { case (id, split) => out(id) shouldBe split }
  }

  test("q70 stratified sampling: small strata kept whole, capped strata near cap") {
    val rows = graft.queries.TextQueries.defs("q70_stratified_sample")(
      spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows should not be empty
    rows.foreach { case (_, _, nTotal, threshold, nKept) =>
      nKept should be <= nTotal
      if (nTotal <= 20) { // under the cap: threshold saturates, nothing dropped
        threshold shouldBe (1L << 32)
        nKept shouldBe nTotal
      } else { // capped: E[kept] = cap, binomial spread
        threshold should be < (1L << 32)
        nKept.toDouble shouldBe 20.0 +- (4 * math.sqrt(20.0)) // ±4σ
      }
    }
  }

  test("q71 sequence packing: per-lane offsets are a gapless token stream") {
    val rows = graft.queries.TextQueries.defs("q71_sequence_pack")(
      spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    rows.length shouldBe 500 // totality
    rows.groupBy(_._2).foreach { case (_, lane) =>
      val byId = lane.sortBy(_._1)
      byId.head._4 shouldBe 0L // first doc starts the lane's stream
      byId.sliding(2).foreach {
        case Array(a, b) => b._4 shouldBe a._5 // next start = prev end: gapless
        case _ =>
      }
      byId.foreach { case (_, _, nTok, start, end, nWin) =>
        end - start shouldBe nTok
        nWin shouldBe (end - 1) / 512 - start / 512 + 1 // windows spanned
        nWin should be >= 1L
      }
    }
  }

  test("q72 tf-idf: rk 1..3 per doc, integer ordering respected, score consistent") {
    val rows = graft.queries.TextQueries.defs("q72_tfidf")(
      spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    val n = 500.0 // sf0.01 corpus size
    rows.groupBy(_._1).foreach { case (_, doc) =>
      doc.map(_._5).sorted shouldBe (1L to doc.length).toSeq // dense ranks from 1
      doc.length should be <= 3
      // ranking is (tf desc, df asc, term asc) — verify pairwise
      val byRank = doc.sortBy(_._5)
      byRank.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi._3 > lo._3 || (hi._3 == lo._3 && hi._4 < lo._4) ||
            (hi._3 == lo._3 && hi._4 == lo._4 && hi._2 < lo._2))
        case _ =>
      }
      // r8 integer surface: score_mnats = tf × round(1000·(ln N − ln df))
      // — idf quantized once per distinct df, then an exact int multiply
      doc.foreach { case (_, _, tf, df, _, scoreMnats) =>
        scoreMnats shouldBe tf * BigDecimal((math.log(n) - math.log(df.toDouble)) * 1000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }
  }

  test("q73 dedup clusters: total, canonical = min member, sizes consistent") {
    val rows = graft.queries.TextQueries.defs("q73_dedup_clusters")(
      spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    rows.length shouldBe 500 // totality: every document labeled once
    rows.map(_._1).distinct.length shouldBe 500
    val clusters = rows.groupBy(_._2)
    clusters.foreach { case (canonical, members) =>
      canonical shouldBe members.map(_._1).min // canonical = min doc_id
      members.foreach(_._3 shouldBe members.length.toLong) // size consistent
      members.count(_._4) shouldBe 1 // exactly one kept per cluster
      members.find(_._4).get._1 shouldBe canonical
    }
    // the corpus has planted near-dups: at least one non-trivial cluster
    clusters.values.map(_.length).max should be > 1
  }

  test("q75 filter cascade: verdict enum, kept ⟺ keep, rule order respected") {
    val rows = graft.queries.TextQueries.defs("q75_filter_cascade")(
      spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    rows.length shouldBe 500
    val enum0 = Set("too_short", "too_long", "dup_tokens", "high_punct",
      "low_stopword", "keep")
    rows.foreach { case (_, nTok, verdict, kept) =>
      enum0 should contain(verdict)
      kept shouldBe (verdict == "keep")
      if (nTok < 10) verdict shouldBe "too_short" // first rule wins
      if (verdict == "too_long") nTok should be > 1000L
    }
    rows.count(_._4) should be > 0 // the corpus is not all rejected
  }

  test("q76 split leakage: summary equals recomputation from q73 × q69") {
    val dir = "/root/testdata/sf0.01"
    val canon = graft.queries.TextQueries.defs("q73_dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val split = graft.queries.TextQueries.defs("q69_split_assign")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val per = canon.groupBy(_._2).map { case (c, ms) =>
      val splits = ms.keys.map(split).toSeq
      (c, ms.size, splits.distinct.size, splits.count(_ != "train"))
    }
    val expected = (
      per.size.toLong,
      per.count(_._3 > 1).toLong,
      per.filter(_._3 > 1).map(_._2.toLong).sum,
      per.filter(_._3 > 1).map(_._4.toLong).sum)
    val got = graft.queries.TextQueries.defs("q76_split_leakage")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    got shouldBe expected
  }

  test("q77 unigram surprisal: equals a from-scratch Scala recomputation") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "coalesce(text, '') AS text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+", -1).toSeq)
      .toMap
    val all = docs.values.flatten.toSeq
    val n = all.size.toDouble
    val counts = all.groupBy(identity).map { case (t, xs) => t -> xs.size }
    def mnats(t: String): Long =
      BigDecimal((math.log(n) - math.log(counts(t).toDouble)) * 1000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = graft.queries.TextQueries.defs("q77_unigram_surprisal")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.length shouldBe docs.size // totality
    rows.foreach { case (id, nTok, sumM, avgU) =>
      nTok shouldBe docs(id).size.toLong
      sumM shouldBe docs(id).map(mnats).sum
      avgU shouldBe (sumM * 1000) / nTok // exact integer mean
      sumM should be >= 0L // c ≤ N ⇒ every term's surprisal ≥ 0
    }
  }

  test("q82 span dedup: planted boilerplate removed everywhere but first, totality, md5 exact") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions.col
    // boilerplate = one exact 5-token span shared by docs 1, 2, 3 at
    // different positions; doc 4 is clean; doc 5 repeats the span TWICE
    val bp = "one two three four five"
    val planted = Seq(
      (1L, s"$bp alpha beta gamma delta epsilon"),
      (2L, s"zeta eta theta iota kappa $bp"),
      (3L, s"$bp zeta eta theta iota kappa"),
      (4L, "unique tokens only in this document yes"),
      (5L, s"$bp $bp"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("q82spec").toString
    planted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueries.defs("q82_span_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L)  // total
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1 holds the first occurrence (min doc_id, span_idx) → keeps all
    out(1L) shouldBe ((2L, 0L, md5hex(s"$bp alpha beta gamma delta epsilon")))
    // doc 2's copy sits at span_idx 1 → removed
    out(2L) shouldBe ((2L, 1L, md5hex("zeta eta theta iota kappa")))
    // doc 3: bp duplicates doc 1's, AND its "zeta…" span duplicates doc
    // 2's first span — both removed, empty survivor
    out(3L) shouldBe ((2L, 2L, md5hex("")))
    // clean doc untouched (2 spans: 5 + 3 tokens)
    out(4L)._2 shouldBe 0L
    out(4L)._3 shouldBe md5hex("unique tokens only in this document yes")
    // doc 5: BOTH its copies are non-first occurrences → empty survivor
    out(5L) shouldBe ((2L, 2L, md5hex("")))
  }

  test("q83 long-repeat dedup: variable-length repeats removed at any offset, first kept, merge exact") {
    val s2 = spark
    import s2.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // a 12-token repeat (> k=8, NOT k-aligned) planted at offset 0 of doc
    // 1 and offset 3 of doc 2 — q82's disjoint fixed windows cannot see
    // a shifted repeat like this, which is exactly what q83 exists for
    val rep = (1 to 12).map(i => s"r$i").mkString(" ")
    val planted = Seq(
      (1L, s"$rep tail1 tail2 tail3"),
      (2L, s"pre1 pre2 pre3 $rep post1 post2"),
      (3L, "all unique tokens in this one here so no window repeats"),
      // 7-token repeat of doc 3's head — BELOW k: must survive untouched
      (4L, "all unique tokens in this one here plus own suffix material"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("q83spec").toString
    planted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueries.defs("q83_longrepeat_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L)   // total
    // doc 1 holds the first occurrence of every repeated window → intact
    out(1L) shouldBe ((15L, 0L, md5hex(s"$rep tail1 tail2 tail3")))
    // doc 2: the overlapping seeds (starts 3..7) merge into ONE interval
    // covering exactly the 12 repeat tokens — pre/post survive
    out(2L) shouldBe ((17L, 12L, md5hex("pre1 pre2 pre3 post1 post2")))
    // sub-k overlap (7 tokens) seeds nothing
    out(3L)._2 shouldBe 0L
    out(4L)._2 shouldBe 0L
    out(4L)._3 shouldBe md5hex("all unique tokens in this one here plus own suffix material")
  }

  test("q105 DSIR resampling: k rows, deterministic, biased toward high weights") {
    val q = graft.queries.TextQueries.defs("q105_dsir_resample")
    val w89 = graft.queries.TextQueries.defs("q89_dsir_weights")
    val sel = q(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    sel.length shouldBe 100 // exactly k winners
    sel.map(_._1).distinct.length shouldBe 100 // without replacement
    // deterministic: same draw twice (md5 Gumbel keys, no RNG state)
    val again = q(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    again.toSeq.sorted shouldBe sel.toSeq.sorted
    // P ∝ exp(weight): the winners' mean weight must sit well above the
    // corpus mean (the whole point of importance resampling)
    val all = w89(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getAs[Long]("sum_mnats").toDouble)
    val corpusMean = all.sum / all.length
    val selMean = sel.map(_._2.toDouble).sum / sel.length
    selMean should be > corpusMean
  }

  test("q103 bpe_merge_once: greedy left-to-right, overlap parity, no-match identity") {
    import graft.functions.TextExpressions.bpe_merge_once
    val s = spark
    import s.implicits._
    def apply1(ts: Seq[String], a: String, b: String): Seq[String] =
      Seq(Tuple1(ts)).toDF("ts")
        .select(bpe_merge_once(col("ts"), a, b)).first().getSeq[String](0)
    apply1(Seq("a", "b", "c"), "a", "b") shouldBe Seq("ab", "c")
    apply1(Seq("a", "a", "a"), "a", "a") shouldBe Seq("aa", "a")     // greedy run parity
    apply1(Seq("a", "a", "a", "a"), "a", "a") shouldBe Seq("aa", "aa")
    apply1(Seq("a", "b", "a", "b"), "a", "b") shouldBe Seq("ab", "ab")
    apply1(Seq("x", "y"), "a", "b") shouldBe Seq("x", "y")           // identity
    apply1(Seq("b", "a", "b"), "a", "b") shouldBe Seq("b", "ab")     // no re-match within a pass
    apply1(Seq("ab"), "a", "b") shouldBe Seq("ab")                   // singleton untouched
  }

  test("q103 BPE training: known merges on a handcrafted corpus") {
    val s = spark
    import s.implicits._
    // "low lower lowest" × weights via repetition — classic BPE example:
    // first merges are driven by the repeated 'l o' / 'o w' stems
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "lowest")).toDF("doc_id", "text")
    // drive the kernel logic directly:
    // wf: low ×5, lower ×2, lowest ×1. Pair counts round 1:
    // (l,o)=8, (o,w)=8 → tie → (l,o) wins lexicographically.
    // Round 2: (lo,w)=8 wins. Round 3: (low,e)=3 (from lower, lowest).
    import graft.functions.TextExpressions.bpe_merge_once
    var words = Seq(("low", 5L), ("lower", 2L), ("lowest", 1L)).toDF("w", "f")
      .select(col("f"), split(col("w"), "").as("ts"))
    def bestPair(): (String, String, Long) = {
      val row = words.filter(org.apache.spark.sql.functions.size(col("ts")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(ts) - 1), " +
            "i -> struct(element_at(ts, i) AS a, element_at(ts, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("f")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()(0)
      (row.getString(0), row.getString(1), row.getLong(2))
    }
    val m1 = bestPair()
    m1 shouldBe (("l", "o", 8L))
    words = words.select(col("f"), bpe_merge_once(col("ts"), m1._1, m1._2).as("ts"))
    val m2 = bestPair()
    m2 shouldBe (("lo", "w", 8L))
    words = words.select(col("f"), bpe_merge_once(col("ts"), m2._1, m2._2).as("ts"))
    val m3 = bestPair()
    m3 shouldBe (("low", "e", 3L))
  }
}
