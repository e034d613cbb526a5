package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.dedup.Dedup
import graft.schemas.Tables

class DedupSpec extends SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"

  test("incremental ingest gate: planted exact/near dups dropped, fresh doc kept (q98)") {
    val s = spark
    import s.implicits._
    val storeText = (1 to 20).map(i => s"store token s$i").mkString(" ")
    val docs = Seq(
      (1L, storeText),                                          // store
      (2L, (1 to 20).map(i => s"other token o$i").mkString(" ")), // store
      (13L, storeText.toUpperCase),     // NEW: exact dup modulo normalize
      (23L, storeText + " tail tweak"), // NEW: near dup (most 8-grams shared)
      (33L, (1 to 20).map(i => s"fresh token f$i").mkString(" "))) // NEW: novel
      .toDF("doc_id", "text")
    val r = graft.dedup.Dedup.incrementalIngestGate(
        docs, "doc_id", "text", isNew = col("doc_id") >= 10)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Boolean]("exact_dup"), x.getAs[Boolean]("drop_doc"))).toMap
    r.keySet shouldBe Set(13L, 23L, 33L) // only the new batch is gated
    r(13L) shouldBe ((true, true))
    r(23L)._1 shouldBe false // not byte-identical
    r(23L)._2 shouldBe true  // but >= half its 8-grams exist in the store
    r(33L) shouldBe ((false, false))
  }

  test("incremental ingest gate: null text normalizes to \"\" (r9 ADVICE — engine parity)") {
    val s = spark
    import s.implicits._
    // null-text docs must behave exactly like empty-text docs: sig =
    // md5(""), n_grams = 0 (NOT size(null) = -1), and a new null-text doc
    // is an exact dup of a stored empty/null-text doc — the convention a
    // SQL oracle reproduces with coalesce(text, '')
    val docs = Seq[(Long, String)](
      (1L, null),                // store, null text
      (13L, null),               // NEW: null text — exact dup of 1 under ""
      (23L, ""),                 // NEW: empty text — same signature class
      (33L, (1 to 20).map(i => s"live token l$i").mkString(" "))) // NEW: novel
      .toDF("doc_id", "text")
    val r = graft.dedup.Dedup.incrementalIngestGate(
        docs, "doc_id", "text", isNew = col("doc_id") >= 10)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Boolean]("exact_dup"), x.getAs[Long]("n_grams"),
         x.getAs[Boolean]("drop_doc"))).toMap
    r(13L) shouldBe ((true, 0L, true))  // null ≡ "" ≡ stored null
    r(23L) shouldBe ((true, 0L, true))  // "" shares the md5("") signature
    r(33L) shouldBe ((false, 53L, false)) // novel: 60 tokens → 53 grams, kept
  }

  test("MinHash-LSH finds every true near-dup pair (recall vs brute force)") {
    val docs = Tables.load(spark, dir, "documents")
    val sh = Dedup.shingled(docs, "doc_id", "text").cache()
    // brute-force ground truth (only viable at test scale)
    val truth = Dedup.jaccardOfPairs(
      sh.select(col("doc_id").as("doc_a")).crossJoin(sh.select(col("doc_id").as("doc_b")))
        .filter(col("doc_a") < col("doc_b")), sh)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    truth should not be empty // the generator plants near-dups
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh shouldBe truth // LSH (16 bands × 4 rows) recalls all ≥0.5 pairs here,
    //                    and the exact-verify stage removes false positives
    // r12 collapse-tier twin: forcing the exact-dup collapse on the same
    // (dup-light) corpus must reproduce the pair set bit-for-bit
    val collapsed = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5, collapseRatio = 0.0)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    collapsed shouldBe truth
  }

  test("minhash near-dups: dup-heavy corpus takes the collapse tier and matches brute (r12)") {
    // 3-way replicate under shifted ids: every shingle set has 3 exact
    // copies, tripping the 1.25 collapse gate NATURALLY — the pair set
    // (within-group 1.0-Jaccard pairs included) must equal brute truth
    val base = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).localCheckpoint()
    val sh = Dedup.shingled(docs, "doc_id", "text").cache()
    val truth = Dedup.jaccardOfPairs(
      sh.select(col("doc_id").as("doc_a")).crossJoin(sh.select(col("doc_id").as("doc_b")))
        .filter(col("doc_a") < col("doc_b")), sh)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sh.unpersist(blocking = false)
    graft.util.BlockRelease.release(docs)
    truth should not be empty
    lsh shouldBe truth
  }

  test("cosine-LSH near-dups equal brute force on hashed doc embeddings (q24 ground truth)") {
    import graft.functions.TextExpressions.embed_text
    // both test scales — sf0.01 is the driver's correctness SF
    for (d <- Seq(dir, "/root/testdata/sf0.01")) {
      val docs = Tables.load(spark, d, "documents")
        .select(col("doc_id"), embed_text(col("text"), 64).as("v"))
      val truth = Dedup.cosineNearDupsBrute(docs, "doc_id", "v", tau = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      truth should not be empty // planted rewordings embed nearly identically
      val lsh = Dedup.cosineNearDups(docs, "doc_id", "v", tau = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      lsh shouldBe truth // banding recalls every ≥0.9 pair here (miss ≈ 2.6e-3
      //                    per borderline pair, deterministic hyperplanes);
      //                    the exact-verify stage removes all false positives
      // r12 collapse-tier twin: forced collapse must reproduce
      // (pair, sim) rows bit-for-bit on the same dup-light corpus
      val collapsed = Dedup.cosineNearDups(docs, "doc_id", "v", tau = 0.9,
          collapseRatio = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      collapsed shouldBe truth
    }
  }

  test("cosine-LSH float tier: dup-heavy corpus takes the collapse tier and matches brute (r12)") {
    import graft.functions.TextExpressions.embed_text
    // 3-way replicate: identical embeddings trip the 1.25 gate NATURALLY;
    // (pair, sim) rows — within-group sim computed from the rep, not
    // assumed — must equal the brute twin's
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), embed_text(col("text"), 64).as("v"))
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("v")))
      .reduce(_ unionByName _).localCheckpoint()
    val truth = Dedup.cosineNearDupsBrute(docs, "doc_id", "v", tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.cosineNearDups(docs, "doc_id", "v", tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.util.BlockRelease.release(docs)
    truth should not be empty
    lsh shouldBe truth
  }

  test("exact dedup groups: one group per normalized text") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactDuplicateGroups(docs, "doc_id", "text").collect()
    out.length shouldBe 2
    out.find(_.getLong(1) == 2L).get.getLong(2) shouldBe 1L // canonical = min id
  }

  test("SimHash pigeonhole banding finds planted near-identical docs") {
    val s = spark
    import s.implicits._
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.replace("token7", "tokenX")), // one-token change → tiny hamming
      (3L, (100 to 140).map(i => s"zz$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs should not contain ((1L, 3L))
    pairs should not contain ((2L, 3L))
    // r12 collapse-tier twin: forced collapse must reproduce the pair set
    val collapsed = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 8,
        collapseRatio = 0.0)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    collapsed shouldBe pairs
  }

  test("ngram jaccard: dup-heavy corpus takes the collapse tier and matches the direct tier (r12)") {
    // 3-way replicate under shifted ids: identical (source, shingle set)
    // triples trip the 1.25 gate NATURALLY; (pair, jaccard) rows must
    // equal the direct tier's (forced via collapseRatio = +∞),
    // within-group 1.0-Jaccard pairs included
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text"), col("source")))
      .reduce(_ unionByName _).localCheckpoint()
    def run(ratio: Double) =
      Dedup.ngramJaccardNearDups(docs, "doc_id", "text", scopeCol = "source",
          threshold = 0.5, collapseRatio = ratio)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = run(Double.PositiveInfinity)
    val collapsed = run(1.25)
    graft.util.BlockRelease.release(docs)
    direct should not be empty
    collapsed shouldBe direct
  }

  test("shingle-cosine verify: dup-heavy corpus takes the doc-level collapse tier and matches (r12)") {
    // 3-way replicate: identical (source, text) docs trip the 1.25 gate
    // NATURALLY; (pair, cos) rows must equal the direct tier's (forced
    // via collapseRatio = +∞), within-group cos-1.0 pairs included
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text"), col("source")))
      .reduce(_ unionByName _).localCheckpoint()
    def run(ratio: Double) =
      Dedup.shingleCosineVerify(docs, "doc_id", "text", scopeCol = "source",
          tauCos = 0.6, collapseRatio = ratio)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = run(Double.PositiveInfinity)
    val collapsed = run(1.25)
    graft.util.BlockRelease.release(docs)
    direct should not be empty
    direct.exists(_._3 == 1.0) shouldBe true // within-group pairs present
    collapsed shouldBe direct
  }

  test("simhash md5 tier: dup-heavy corpus takes the collapse tier, pairs+distances match (r12)") {
    // 3-way replicate: every fingerprint has 3 exact copies; collapse is
    // OPT-IN for simhash (measured slower at realistic dup ratios — see
    // pigeonholePairs scaladoc), so the twin forces BOTH tiers and pins
    // (pair, dist) equality, within-group dist-0 pairs included
    val base = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).localCheckpoint()
    def run(ratio: Double) =
      Dedup.simhashNearDupsMd5(docs, "doc_id", "text", maxDist = 3,
          collapseRatio = ratio)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = run(Double.PositiveInfinity)
    val collapsed = run(1.25)
    graft.util.BlockRelease.release(docs)
    direct should not be empty
    collapsed shouldBe direct
  }

  test("decontamination: planted 8-gram overlap flagged, 7-gram overlap is not") {
    val s = spark
    import s.implicits._
    val run8 = (1 to 8).map(i => s"leak$i").mkString(" ")
    val run7 = (1 to 7).map(i => s"part$i").mkString(" ")
    val docs = Seq(
      (0L, s"benchmark question alpha $run8 beta gamma delta epsilon"),
      (1L, s"training doc containing $run8 verbatim and more words here"),
      (2L, s"training doc containing only $run7 so it stays clean words"),
      (3L, "completely unrelated training document with its own tokens kept"),
      (4L, "short doc")).toDF("doc_id", "text")
    val out = Dedup.flagContaminated(docs, "doc_id", "text",
        isBench = $"doc_id" === 0L, n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L) // benchmark doc excluded
    out(1L)._2 shouldBe true
    out(1L)._1 shouldBe 1L // exactly the one shared 8-gram
    out(2L) shouldBe ((0L, false)) // 7-token run is below the shingle width
    out(3L) shouldBe ((0L, false))
    out(4L) shouldBe ((0L, false)) // < 8 tokens: no shingles at all
  }

  test("PII redaction: planted email/IP/phone replaced, counts exact, clean text untouched") {
    val s = spark
    import s.implicits._
    import graft.functions.TextFunctions._
    val docs = Seq(
      (1L, "reach me at jane.doe+x@sub.example.org or 192.168.001.1 now"),
      (2L, "call +123 456-7890 no wait 555-042-1234 that dash style"),
      (3L, "nothing sensitive here at all")).toDF("id", "t")
    val out = docs.select($"id", redactPii($"t").as("r"),
        piiCount($"t", EmailRe).as("e"), piiCount($"t", Ipv4Re).as("ip"),
        piiCount($"t", PhoneRe).as("p"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    out(1L)._1 shouldBe "reach me at <EMAIL> or <IP> now"
    out(1L)._2 shouldBe 1
    out(1L)._3 shouldBe 1
    // the pattern allows mixed separators, so "+123 456-7890" is
    // phone-shaped too (digits split 3/3/4 by [- ])
    out(2L)._1 shouldBe "call <PHONE> no wait <PHONE> that dash style"
    out(2L)._4 shouldBe 2
    out(3L)._1 shouldBe "nothing sensitive here at all"
    out(3L) shouldBe (("nothing sensitive here at all", 0, 0, 0))
  }

  test("md5-SimHash tier: planted pair found, pigeonhole candidates complete vs brute Hamming") {
    // unit-level redundancy for the q35 oracle: the md5 tier must (a)
    // find the planted near-identical pair, and (b) return EXACTLY the
    // pairs a brute all-pairs Hamming over its own fingerprints would —
    // pigeonhole banding is complete for the distance bound, so any
    // difference is a banding bug
    val s = spark
    import s.implicits._
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.replace("token7", "tokenX")),
      (3L, (100 to 140).map(i => s"zz$i").mkString(" ")),
      (4L, (200 to 230).map(i => s"qq$i").mkString(" "))).toDF("doc_id", "text")
    val banded = Dedup.simhashNearDupsMd5(docs, "doc_id", "text", maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    banded.map(p => (p._1, p._2)) should contain((1L, 2L))
    // brute: recompute fingerprints through the same tier at the loosest
    // bound (63 = any pair shares a chunk? no — derive ground truth by
    // joining the banded tier at maxDist=63 with 8 chunks... simpler:
    // maxDist=7 uses 8-bit chunks; a full-distance reference comes from
    // pairing every doc via a crafted run at the maximum supported bound)
    val all = Dedup.simhashNearDupsMd5(docs, "doc_id", "text", maxDist = 63)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // maxDist=63 with 64 1-bit chunks: every pair within distance 63
    // shares a chunk unless fingerprints differ in EVERY bit — our
    // fixture pairs all share ≥1 bit, so `all` is the complete pair set
    val expected = all.filter(_._2 <= 7).map { case ((a, b), d) => (a, b, d) }.toSet
    banded shouldBe expected
  }

  test("auto-banding law: small-n config unchanged, bits track corpus size, recall bound holds") {
    // historical fixed config reproduced exactly at spec scale — goldens
    // and measured recalls for small corpora are untouched by the law
    Dedup.autoBanding(0.9, 500) shouldBe ((12, 48))
    Dedup.autoBanding(0.9, 5000)._1 shouldBe 15
    Dedup.autoBanding(0.9, 500000)._1 shouldBe 21
    // the miss bound is corpus-size-invariant: every returned config
    // keeps per-pair miss at s = τ under 3e-4 (+ceil slack)
    val p = 1.0 - math.acos(0.9) / math.Pi
    for (n <- Seq(100L, 5000L, 500000L, 50000000L, 5000000000L)) {
      val (b, t) = Dedup.autoBanding(0.9, n)
      math.pow(1.0 - math.pow(p, b), t) should be <= 3.1e-4
    }
    // explicit overrides bypass the law independently
    Dedup.autoBanding(0.9, 500000, bitsOverride = 12, tablesOverride = 96) shouldBe ((12, 96))
  }

  test("rational-threshold exact tier: cos = 0.9 boundary decided exactly, LSH == brute at both SFs") {
    val s = spark
    import s.implicits._
    // hand-built integer vectors around the τ = 9/10 boundary:
    //   (1,1,1,1)·(4,2,2,1) = 9, |a|² = 4, |b|² = 25 → cos = 9/√100 = 0.9
    //   EXACTLY — must be INCLUDED (≥); a float verify can land either
    //   side of this after normalize+dot rounding, the integer predicate
    //   cannot. (1,2,3,4) (cos ≈ 0.9129) in, (1,2,3,5) (≈ 0.8812) out.
    val fixture = Seq(
      (1L, Seq(1.0, 1.0, 1.0, 1.0)),
      (2L, Seq(4.0, 2.0, 2.0, 1.0)), // boundary-exact with 1
      (3L, Seq(1.0, 2.0, 3.0, 4.0)), // just above τ with 1
      (4L, Seq(1.0, 2.0, 3.0, 5.0)), // just below τ with 1
      (5L, Seq(0.0, 0.0, 0.0, 0.0))  // zero vector: no cosine, excluded
    ).toDF("doc_id", "v")
    val pairs = Dedup.cosineNearDupsBruteExact(fixture, "doc_id", "v", 9, 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L)) // the boundary-exact pair
    pairs should contain((1L, 3L))
    pairs should not contain ((1L, 4L))
    pairs.flatMap(p => Seq(p._1, p._2)) should not contain 5L
    // and the q24 contract itself: the 96-table banded tier reproduces the
    // brute pair set EXACTLY (not ≈) on the real testdata at both spec SFs
    import graft.functions.TextFunctions.md5Embed
    for (d <- Seq(dir, "/root/testdata/sf0.01")) {
      val docs = Tables.load(spark, d, "documents")
        .select(col("doc_id"), md5Embed(col("text")).as("v")).localCheckpoint()
      val truth = Dedup.cosineNearDupsBruteExact(docs, "doc_id", "v", 9, 10)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth should not be empty
      val lsh = Dedup.cosineNearDupsExact(docs, "doc_id", "v", 9, 10, tables = 96, dim = 16)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // r12 collapse-tier twin: forcing the exact-dup collapse on the
      // same (dup-light) corpus must reproduce the pair set bit-for-bit
      val collapsed = Dedup.cosineNearDupsExact(docs, "doc_id", "v", 9, 10,
          tables = 96, dim = 16, collapseRatio = 0.0)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.util.BlockRelease.release(docs)
      lsh shouldBe truth
      collapsed shouldBe truth
    }
  }

  test("exact tier: dup-heavy corpus takes the collapse tier and matches brute (r12)") {
    import graft.functions.TextFunctions.md5Embed
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), md5Embed(col("text")).as("v"))
    // 3-way replicate under shifted ids: every vector has 3 exact copies,
    // so the probe's members/distinct ≈ 3 trips the 1.25 collapse gate
    // NATURALLY (no override) — and the pair set, within-group pairs
    // included, must equal the all-pairs brute twin's
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("v")))
      .reduce(_ unionByName _).localCheckpoint()
    val truth = Dedup.cosineNearDupsBruteExact(docs, "doc_id", "v", 9, 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.cosineNearDupsExact(docs, "doc_id", "v", 9, 10, tables = 96, dim = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.util.BlockRelease.release(docs)
    truth should not be empty
    lsh shouldBe truth
  }

  test("cosineNearDupGroups == components of the pair tier; zero vectors group by exact equality only") {
    import graft.functions.TextFunctions.md5Embed
    val s2 = spark
    import s2.implicits._
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), md5Embed(col("text")).as("v"))
      .limit(80)
    // multiplicity 4 (trips the collapse regime the operator exists
    // for) + two identical zero-vector docs and one lone zero
    val zeros = Seq(
      (900001L, Seq.fill(16)(0.0)), (900002L, Seq.fill(16)(0.0)))
      .toDF("doc_id", "v")
    val docs = (0 until 4).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("v")))
      .reduce(_ unionByName _)
      .unionByName(zeros)
      .localCheckpoint()
    val groups = Dedup
      .cosineNearDupGroups(docs, "doc_id", "v", 9, 10, tables = 96, dim = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // expected: union-find over the PAIR tier's output plus the
    // exact-dup relation (identical vectors), canon = component min
    val pairs = Dedup
      .cosineNearDupsExact(docs, "doc_id", "v", 9, 10, tables = 96, dim = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val sameVec = docs.select(col("doc_id"),
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("v"))).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val uf = new graft.util.UnionFind.Longs
    pairs.foreach { case (a, b) => uf.union(a, b) }
    sameVec.foreach { case (a, g) => uf.union(a, g) }
    val byRoot = ids.groupBy(uf.find)
    val expected = byRoot.values.flatMap { members =>
      val canon = members.min
      members.map(m => m -> (canon, members.length.toLong))
    }.toMap
    groups shouldBe expected
    // the zero twins share a group; no zero ever links to a nonzero doc
    groups(900001L)._1 shouldBe groups(900002L)._1
    groups(900001L)._2 shouldBe 2L
    // dup-heavy corpus: groups are real (multiplicity >= 4 somewhere)
    groups.values.map(_._2).max should be >= 4L
    graft.util.BlockRelease.release(docs)
  }

  /** Pin a `*NearDupGroups` output against a driver union-find over the
    * PAIR form's own output (the q110 discipline applied to the text
    * kernels): the group form must equal components-of-pairs exactly —
    * canon = component min, singletons self-canonical, sizes total. */
  private def expectGroupsEqualPairs(
      groups: Map[Long, (Long, Long)],
      pairs: Array[(Long, Long)], ids: Array[Long]): Unit = {
    val uf = new graft.util.UnionFind.Longs
    pairs.foreach { case (a, b) => uf.union(a, b) }
    val expected = ids.groupBy(uf.find).values.flatMap { members =>
      val canon = members.min
      members.map(m => m -> (canon, members.length.toLong))
    }.toMap
    groups shouldBe expected
  }

  test("pair-amplification guard: multiplicity 30 crosses the measured ceiling, 2 does not") {
    // amplification = sum C(k,2) / members = (k-1)/2 for uniform groups;
    // the r13 k-cells place the pair form's ceiling between multiplicity
    // 10 and 30 (BENCH_LOCAL_r13.md §7), so the guard threshold (10) must
    // separate those decades: k=30 -> 14.5 warns, k=2 -> 0.5 stays quiet
    val m30 = spark.range(300).select((col("id") % 10).as("gid"))
    Dedup.pairAmplification(m30, "gid") shouldBe 14.5 +- 1e-9
    (Dedup.pairAmplification(m30, "gid") >
      Dedup.PairAmplificationWarnAt) shouldBe true
    val m2 = spark.range(100).select((col("id") % 50).as("gid"))
    Dedup.pairAmplification(m2, "gid") shouldBe 0.5 +- 1e-9
    (Dedup.pairAmplification(m2, "gid") >
      Dedup.PairAmplificationWarnAt) shouldBe false
    // degenerate: empty corpus probes 0 without dividing by zero
    Dedup.pairAmplification(m30.limit(0), "gid") shouldBe 0.0
  }

  test("minhashNearDupGroups == components of the pair form on a dup-heavy corpus") {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).limit(80)
    // multiplicity 3: identical texts share a shingle list, tripping the
    // gid collapse the group form is built around
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).localCheckpoint()
    val groups = Dedup.minhashNearDupGroups(docs, "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    expectGroupsEqualPairs(groups, pairs, ids)
    groups.values.map(_._2).max should be >= 3L
    graft.util.BlockRelease.release(docs)
  }

  test("simhashNearDupGroupsMd5 == components of the pair form (exact pigeonhole, no recall pin)") {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).limit(80)
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).localCheckpoint()
    val groups = Dedup.simhashNearDupGroupsMd5(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = Dedup.simhashNearDupsMd5(docs, "doc_id", "text", 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    expectGroupsEqualPairs(groups, pairs, ids)
    groups.values.map(_._2).max should be >= 3L
    graft.util.BlockRelease.release(docs)
  }

  test("shingleCosineGroups == components of the pair form (per-text eligibility inherited)") {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source")).limit(80)
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"), col("source")))
      .reduce(_ unionByName _).localCheckpoint()
    val groups = Dedup
      .shingleCosineGroups(docs, "doc_id", "text", "source", 0.6, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = Dedup
      .shingleCosineVerify(docs, "doc_id", "text", "source", 0.6, 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    expectGroupsEqualPairs(groups, pairs, ids)
    groups.values.map(_._2).max should be >= 3L
    graft.util.BlockRelease.release(docs)
  }

  test("jaccardNearDupGroups == components of the scoped pair form; groups never cross scopes") {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source")).limit(80)
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"), col("source")))
      .reduce(_ unionByName _).localCheckpoint()
    val groups = Dedup
      .jaccardNearDupGroups(docs, "doc_id", "text", "source", 0.5, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = Dedup
      .ngramJaccardNearDups(docs, "doc_id", "text", "source", 0.5, 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    expectGroupsEqualPairs(groups, pairs, ids)
    groups.values.map(_._2).max should be >= 3L
    // scope isolation: every member of a group shares the canon's source
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    groups.foreach { case (id, (canon, _)) =>
      srcOf(id) shouldBe srcOf(canon)
    }
    graft.util.BlockRelease.release(docs)
  }

  test("gidByContent == content-window min-id, incl. null-content grouping (r15)") {
    val s2 = spark
    import s2.implicits._
    // a hot key ("" x 40), a medium key, singletons, and nulls — the
    // hash-keyed groupBy+min must reproduce the window's grouping
    // exactly (nulls group together, like a window partition key)
    val rows = (1L to 40L).map(i => (i, "")) ++
      (41L to 50L).map(i => (i, "dup dup dup")) ++
      Seq((51L, "alone"), (52L, "solo")) ++
      (53L to 55L).map(i => (i, null.asInstanceOf[String]))
    val frame = rows.toDF("id", "text").repartition(8).localCheckpoint()
    val (withGid, gidScratch) = Dedup.gidByContent(frame, Seq("text"))
    val got = withGid.select("id", "gid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = frame.select(col("id"),
        min(col("id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("text"))).as("gid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expected
    got(1L) shouldBe 1L; got(40L) shouldBe 1L // hot key collapsed
    got(53L) shouldBe 53L; got(55L) shouldBe 53L // nulls group together
    withGid.columns should not contain ("_gh1")
    graft.util.BlockRelease.release(frame +: gidScratch)
  }

  test("gidByContent big-distinct branch: heavy-hitter split == window min-id (r15)") {
    val s2 = spark
    import s2.implicits._
    // force the non-broadcast join-back (distinct side "too big") and a
    // tiny hot-key bound so the broadcast/anti/shuffle three-way split
    // actually executes — the branch a real run only takes past 2M
    // distinct contents, where a correctness bug would otherwise
    // surface for the first time at cluster scale
    sys.props("graft.sizegate.rows") = "10"
    sys.props("graft.hotkey.rows") = "16"
    try {
      val rows = (1L to 40L).map(i => (i, "hot hot hot")) ++ // ≥ 16: hot
        (41L to 50L).map(i => (i, "warm warm")) ++ // 10 < 16: rest
        (51L to 70L).map(i => (i, s"unique text $i")) ++ // rest singles
        (71L to 73L).map(i => (i, null.asInstanceOf[String]))
      val frame = rows.toDF("id", "text").repartition(8).localCheckpoint()
      val (withGid, gidScratch) = Dedup.gidByContent(frame, Seq("text"))
      val got = withGid.select("id", "gid").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = frame.select(col("id"),
          min(col("id")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("text"))).as("gid"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe expected // complete AND duplicate-free across branches
      got(40L) shouldBe 1L // hot key via the broadcast branch
      got(50L) shouldBe 41L // warm key via the shuffle branch
      graft.util.BlockRelease.release(frame +: gidScratch)
    } finally {
      sys.props.remove("graft.sizegate.rows")
      sys.props.remove("graft.hotkey.rows")
    }
  }

  test("group forms: forced big-distinct join-backs match the broadcast path (r15)") {
    val s2 = spark
    import s2.implicits._
    // exercises the rare branches of groupsFromReps' canon/size attaches
    // and shingleCosineGroups' repFlags attach: same corpus, same
    // queries, with every join-back forced through the heavy-hitter
    // split (hot broadcast + anti + shuffle) instead of the whole-side
    // broadcast — outputs must be identical row for row
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val hot = base.limit(1).select(col("doc_id"), col("text"), col("source"))
    val docs = ((0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text"),
        col("source"))) ++
      (0 until 30).map(i => hot.select(
        (col("doc_id") + lit((i + 10) * 1000000L)).as("doc_id"),
        col("text"), col("source"))))
      .reduce(_ unionByName _).localCheckpoint()
    def runBoth(f: => org.apache.spark.sql.DataFrame):
        (Set[(Long, Long, Long)], Set[(Long, Long, Long)]) = {
      val plain = f.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      sys.props("graft.sizegate.rows") = "10"
      sys.props("graft.hotkey.rows") = "16"
      try {
        val forced = f.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        (plain, forced)
      } finally {
        sys.props.remove("graft.sizegate.rows")
        sys.props.remove("graft.hotkey.rows")
      }
    }
    val (mhP, mhF) = runBoth(
      Dedup.minhashNearDupGroups(docs, "doc_id", "text", 0.5))
    mhF shouldBe mhP
    val (scP, scF) = runBoth(
      Dedup.shingleCosineGroups(docs, "doc_id", "text", "source", 0.6, 3))
    scF shouldBe scP
    mhP should not be empty
    graft.util.BlockRelease.release(docs)
  }

  test("gidByContent: null LAYOUT is part of the key for same-typed columns (r15)") {
    val s2 = spark
    import s2.implicits._
    // xxhash64 SKIPS null inputs, so without the null-pattern signature
    // (scope="x", text=null) and (scope=null, text="x") would feed the
    // hash chain identical bytes in ALL three seeded hashes — a
    // structural silent merge a content-partitioned window never had.
    val rows = Seq(
      (1L, "x", null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String], "x"),
      (3L, "x", null.asInstanceOf[String]),
      (4L, "x", "x"))
    val frame = rows.toDF("id", "scope", "text").repartition(4)
      .localCheckpoint()
    val (withGid, gidScratch) =
      Dedup.gidByContent(frame, Seq("scope", "text"))
    val got = withGid.select("id", "gid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got(1L) shouldBe 1L
    got(3L) shouldBe 1L // exact twins (incl. null layout) share a gid
    got(2L) shouldBe 2L // swapped null layout must NOT merge with 1
    got(4L) shouldBe 4L
    graft.util.BlockRelease.release(frame +: gidScratch)
  }

  test("group forms: degenerate hot content — contracts hold at multiplicity (r15)") {
    val s2 = spark
    import s2.implicits._
    // degenerate hot content a crawl corpus carries by the million:
    // whitespace-only texts, < n-token boilerplate, and null texts.
    // WordShingleHashes (all three kernels' shingling) emits >= 1
    // shingle for ANY non-null text, so whitespace/boilerplate twins
    // legitimately pair (jaccard / cos == 1) and must come back as ONE
    // group — collapsed map-side by the hash-keyed gid stage, never a
    // single hot window task; null text has null shingles / a null
    // embedding and must be a singleton (the pair forms emit nothing
    // for it). Components-of-pairs is the master pin either way.
    val realBase = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source")).limit(30)
    val degenerate = ((1000001L to 1000020L).map(i => (i, "   ", "web")) ++
      (1000021L to 1000040L).map(i => (i, "404 error", "web")) ++
      (1000041L to 1000045L).map(i => (i, null.asInstanceOf[String], "web")))
      .toDF("doc_id", "text", "source")
    val docs = realBase.unionByName(degenerate).localCheckpoint()
    val ids = docs.select("doc_id").collect().map(_.getLong(0))

    def check(groups: Map[Long, (Long, Long)],
        pairs: Array[(Long, Long)]): Unit =
      expectGroupsEqualPairs(groups, pairs, ids)

    val mh = Dedup.minhashNearDupGroups(docs, "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    check(mh,
      Dedup.minhashNearDups(docs, "doc_id", "text", 0.5)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))))
    mh(1000001L) shouldBe ((1000001L, 20L)) // whitespace twins: one group
    mh(1000021L) shouldBe ((1000021L, 20L)) // boilerplate twins: one group
    (1000041L to 1000045L).foreach(i => mh(i) shouldBe ((i, 1L))) // nulls

    val jc = Dedup
      .jaccardNearDupGroups(docs, "doc_id", "text", "source", 0.5, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    check(jc,
      Dedup.ngramJaccardNearDups(docs, "doc_id", "text", "source", 0.5, 3)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))))
    jc(1000001L) shouldBe ((1000001L, 20L))
    (1000041L to 1000045L).foreach(i => jc(i) shouldBe ((i, 1L)))

    val sc = Dedup
      .shingleCosineGroups(docs, "doc_id", "text", "source", 0.6, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    check(sc,
      Dedup.shingleCosineVerify(docs, "doc_id", "text", "source", 0.6, 3)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))))
    sc(1000001L) shouldBe ((1000001L, 20L)) // whitespace twins: one group
    sc(1000021L) shouldBe ((1000021L, 20L)) // boilerplate twins: one group
    (1000041L to 1000045L).foreach(i => sc(i) shouldBe ((i, 1L))) // nulls
    graft.util.BlockRelease.release(docs)
  }

  test("pair-amplification guard projects over ELIGIBLE members only (r15 ADVICE)") {
    // 290 pair-ineligible docs share the empty-content gid (the shape
    // that inflated the r14 projection) + 10 eligible docs in
    // multiplicity-2 groups: the guard's filtered projection must stay
    // below the threshold where the unfiltered one fired spuriously
    val m = spark.range(300).select(
      when(col("id") < 290, lit(0L)).otherwise(lit(290L) + (col("id") % 5))
        .as("gid"),
      (col("id") >= 290).as("eligible"))
    (Dedup.pairAmplification(m, "gid") >
      Dedup.PairAmplificationWarnAt) shouldBe true // the r14 overcount
    val filtered = Dedup.pairAmplification(m.filter(col("eligible")), "gid")
    filtered shouldBe 0.5 +- 1e-9
    (filtered > Dedup.PairAmplificationWarnAt) shouldBe false
  }

  test("star verify forced: all five group forms equal their pair forms on a near-dup-noised corpus (r16)") {
    import graft.functions.TextFunctions.md5Embed
    // suffix-NOISED replicas: texts DISTINCT (the exact-dup gid stage
    // cannot collapse them) but near-identical — near-dup-DENSE rep
    // buckets, the regime the star verify exists for. Gate factor 0
    // forces the star path through EVERY bucket (including fail-heavy
    // false-positive buckets, so the repair round's exactness is pinned
    // in both regimes); outputs must equal components over the pair
    // forms' own output, which the un-forced default path already pins
    // against brute truth elsewhere in this suite.
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source")).limit(40)
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" nearvar$i")).as("text"),
        col("source")))
      .reduce(_ unionByName _).localCheckpoint()
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    def groupsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def pairsOf(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
      df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1)))
    sys.props("graft.stardedup.factor") = "0"
    // keep the repair round engaged even where this corpus is
    // fail-heavy — the adaptive bound would otherwise fall back to
    // pair-complete, which the default-path specs already cover
    sys.props("graft.stardedup.repair") = "1e9"
    try {
      expectGroupsEqualPairs(
        groupsOf(Dedup.minhashNearDupGroups(docs, "doc_id", "text", 0.5)),
        pairsOf(Dedup.minhashNearDups(docs, "doc_id", "text", 0.5),
          "doc_a", "doc_b"), ids)
      expectGroupsEqualPairs(
        groupsOf(Dedup.jaccardNearDupGroups(
          docs, "doc_id", "text", "source", 0.5, 3)),
        pairsOf(Dedup.ngramJaccardNearDups(
          docs, "doc_id", "text", "source", 0.5, 3), "doc_a", "doc_b"), ids)
      expectGroupsEqualPairs(
        groupsOf(Dedup.shingleCosineGroups(
          docs, "doc_id", "text", "source", 0.6, 3)),
        pairsOf(Dedup.shingleCosineVerify(
          docs, "doc_id", "text", "source", 0.6, 3), "doc_a", "doc_b"), ids)
      expectGroupsEqualPairs(
        groupsOf(Dedup.simhashNearDupGroupsMd5(docs, "doc_id", "text", 3)),
        pairsOf(Dedup.simhashNearDupsMd5(docs, "doc_id", "text", 3),
          "doc_a", "doc_b"), ids)
      val vecs = docs.select(col("doc_id"), md5Embed(col("text")).as("v"))
        .localCheckpoint()
      expectGroupsEqualPairs(
        groupsOf(Dedup.cosineNearDupGroups(
          vecs, "doc_id", "v", 9, 10, tables = 96, dim = 16)),
        pairsOf(Dedup.cosineNearDupsExact(
          vecs, "doc_id", "v", 9, 10, tables = 96, dim = 16),
          "id_a", "id_b"), ids)
      graft.util.BlockRelease.release(vecs)
    } finally {
      sys.props.remove("graft.stardedup.factor")
      sys.props.remove("graft.stardedup.repair")
    }
    graft.util.BlockRelease.release(docs)
  }

  test("star repair round is load-bearing: a non-center chain connects only through round 2 (r16)") {
    val s2 = spark
    import s2.implicits._
    // n = 1 shingles = the words themselves, so Jaccard is word-set
    // Jaccard. A = {w1..w4, x}, C = {w5..w8, x}, B = {w1..w8, x},
    // D = {w5..w8, y1..y12}:
    //   J(A,B) = J(B,C) = 5/9 ≥ 0.5;  J(A,C) = 1/9 < 0.5;
    //   J(D,C) = 4/17 < 0.5;  J(D,B) = 4/21 < 0.5.
    // Bucket "x" = {A,C,B} with center A: star (A,C) FAILS, (A,B)
    // passes. Buckets w5..w8 = {D,C,B} with center D (min id): BOTH
    // star edges fail. The load-bearing edge (C,B) is therefore never a
    // star pair anywhere — it exists ONLY as a round-2 repair pair (C
    // failed in every bucket containing B) — yet the true components
    // are {A,B,C} + {D}. A star-only implementation would leave C a
    // singleton; the pin catches it.
    val a = (1 to 4).map(i => s"w$i").mkString(" ") + " x"
    val c = (5 to 8).map(i => s"w$i").mkString(" ") + " x"
    val b = (1 to 8).map(i => s"w$i").mkString(" ") + " x"
    val d = (5 to 8).map(i => s"w$i").mkString(" ") + " " +
      (1 to 12).map(i => s"y$i").mkString(" ")
    val docs = Seq((0L, d, "s"), (1L, a, "s"), (2L, c, "s"), (3L, b, "s"))
      .toDF("doc_id", "text", "source").localCheckpoint()
    sys.props("graft.stardedup.factor") = "0"
    sys.props("graft.stardedup.repair") = "1e9"
    try {
      val groups = Dedup
        .jaccardNearDupGroups(docs, "doc_id", "text", "source", 0.5, 1)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      groups shouldBe Map(
        0L -> (0L, 1L), 1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L))
      // and the pair form agrees (components-of-pairs)
      val pairs = Dedup
        .ngramJaccardNearDups(docs, "doc_id", "text", "source", 0.5, 1)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      expectGroupsEqualPairs(groups, pairs, Array(0L, 1L, 2L, 3L))
    } finally {
      sys.props.remove("graft.stardedup.factor")
      sys.props.remove("graft.stardedup.repair")
    }
    graft.util.BlockRelease.release(docs)
  }

  test("star adaptive repair bound: fail-heavy regime falls back to pair-complete, output unchanged (r16)") {
    val s2 = spark
    import s2.implicits._
    // the chain corpus again, but with the DEFAULT repair bound: round
    // 1 fails (A,C) in bucket x and both star edges in buckets w5..w8,
    // so the exact repair projection (~18) exceeds 0.10 × 19 projected
    // pair-complete candidates — the helper must fall back, and the
    // output must STILL equal the pair form's components (pair-complete
    // recomputes everything; v1 is discarded)
    val a = (1 to 4).map(i => s"w$i").mkString(" ") + " x"
    val c = (5 to 8).map(i => s"w$i").mkString(" ") + " x"
    val b = (1 to 8).map(i => s"w$i").mkString(" ") + " x"
    val d = (5 to 8).map(i => s"w$i").mkString(" ") + " " +
      (1 to 12).map(i => s"y$i").mkString(" ")
    val docs = Seq((0L, d, "s"), (1L, a, "s"), (2L, c, "s"), (3L, b, "s"))
      .toDF("doc_id", "text", "source").localCheckpoint()
    val buf = new java.io.ByteArrayOutputStream()
    val oldErr = System.err
    sys.props("graft.stardedup.factor") = "0"
    try {
      System.setErr(new java.io.PrintStream(buf, true))
      val groups = Dedup
        .jaccardNearDupGroups(docs, "doc_id", "text", "source", 0.5, 1)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      groups shouldBe Map(
        0L -> (0L, 1L), 1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L))
    } finally {
      System.setErr(oldErr)
      sys.props.remove("graft.stardedup.factor")
    }
    buf.toString should include ("falling back to pair-complete")
    graft.util.BlockRelease.release(docs)
  }

  test("simhash carried-column star: cheap repair bound engages and falls back by knob, output invariant (r16)") {
    val s2 = spark
    import s2.implicits._
    // Templated text + a variant token (the simband cell's shape, mini):
    // distinct fingerprints share template-dominated chunks, so buckets
    // are dense and verify is mixed pass/fail. The simhash form's verify
    // reads ONLY the carried fingerprint longs, so it rides the CHEAP
    // repair bound (graft.stardedup.repair.cheap). Pin both sides of the
    // knob end-to-end — bound 0 must fall back (stderr), bound 1e9 must
    // run the repair round (stderr shows tried counts) — and the output
    // must equal the pair form's components either way.
    // 64 template tokens -> ~6 of the 64 bit-sums sit at ±1 (flippable
    // by one variant token), so variant pairs differ by ~3 bits: MIXED
    // pass/fail at maxDist 3, dense chunk buckets — deterministic via
    // md5, asserted below before the knob legs run
    val tpl = (1 to 64).map(i => s"boiler token t$i").mkString(" ")
    val docs = (0 until 80).map(i => (i.toLong, s"$tpl u${i % 16}", "s"))
      .toDF("doc_id", "text", "source").localCheckpoint()
    val ids = (0L until 80L).toArray
    val truth = Dedup.simhashNearDupsMd5(docs, "doc_id", "text", 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def runWith(cheap: String): (Map[Long, (Long, Long)], String) = {
      val buf = new java.io.ByteArrayOutputStream()
      val oldErr = System.err
      sys.props("graft.stardedup.factor") = "0"
      sys.props("graft.stardedup.repair.cheap") = cheap
      try {
        System.setErr(new java.io.PrintStream(buf, true))
        val g = Dedup.simhashNearDupGroupsMd5(docs, "doc_id", "text", 3)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        (g, buf.toString)
      } finally {
        System.setErr(oldErr)
        sys.props.remove("graft.stardedup.factor")
        sys.props.remove("graft.stardedup.repair.cheap")
      }
    }
    val (gFallback, errFallback) = runWith("1e-12")
    errFallback should include ("falling back to pair-complete")
    expectGroupsEqualPairs(gFallback, truth, ids)
    val (gStar, errStar) = runWith("1e9")
    errStar should include ("star verify tried")
    (errStar should not).include("falling back to pair-complete")
    expectGroupsEqualPairs(gStar, truth, ids)
    graft.util.BlockRelease.release(docs)
  }
}
