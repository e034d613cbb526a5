package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.BloomSketch._

class BloomSketchSpec extends SparkSpec with Matchers {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("no false negatives, ever: every inserted key probes true (all m, k)") {
    val s = spark
    import s.implicits._
    for (m <- Seq(64, 4096, 1 << 17); k <- Seq(1, 2, 3)) {
      val keys = (0 until 300).map(i => md5Hex(s"key$i")).toDF("h").repartition(4)
      val bloom = keys.agg(bloom_build_hex($"h", m, k).as("bloom"))
      val missed = keys.crossJoin(bloom)
        .filter(!bloom_probe_hex($"h", $"bloom", m, k))
        .count()
      assert(missed == 0L, s"false negative at m=$m k=$k")
    }
  }

  test("absent keys: exact rejection at big m, deterministic FPs at tiny m") {
    val s = spark
    import s.implicits._
    val in = (0 until 200).map(i => md5Hex(s"in$i")).toDF("h")
    val out = (0 until 2000).map(i => md5Hex(s"out$i")).toDF("h")

    // big m: 3*200/131072 load → FP p ≈ 1e-7; expect zero over 2000 probes
    val big = in.agg(bloom_build_hex($"h", 1 << 17, 3).as("bloom"))
    out.crossJoin(big).filter(bloom_probe_hex($"h", $"bloom", 1 << 17, 3))
      .count() shouldBe 0L

    // tiny m = 256 bits/row: per-row load 200/256 ≈ 0.78 → FP rate ~0.16,
    // and the FP SET is a pure function of md5 given these fixed keys —
    // a deterministic nonzero count, identical across independent builds
    val tiny = in.agg(bloom_build_hex($"h", 256, 3).as("bloom"))
    val fp1 = out.crossJoin(tiny).filter(bloom_probe_hex($"h", $"bloom", 256, 3))
      .select($"h").collect().map(_.getString(0)).sorted
    fp1.length should be > 0
    val tiny2 = in.repartition(7).agg(bloom_build_hex($"h", 256, 3).as("bloom"))
    val fp2 = out.crossJoin(tiny2).filter(bloom_probe_hex($"h", $"bloom", 256, 3))
      .select($"h").collect().map(_.getString(0)).sorted
    fp2 shouldBe fp1
  }

  test("merge is partition-invariant: bitset identical at 1 vs 13 partitions") {
    val s = spark
    import s.implicits._
    val keys = (0 until 500).map(i => md5Hex(s"m$i")).toDF("h")
    val a = keys.coalesce(1).agg(bloom_build_hex($"h", 4096, 3)).collect()(0).getSeq[Long](0)
    val b = keys.repartition(13).agg(bloom_build_hex($"h", 4096, 3)).collect()(0).getSeq[Long](0)
    a shouldBe b
    a.length shouldBe 3 * 4096 / 64
  }

  test("empty input builds the all-zero bitset (rejects everything)") {
    val s = spark
    import s.implicits._
    val none = Seq.empty[String].toDF("h")
    val bloom = none.agg(bloom_build_hex($"h", 4096, 3).as("bloom"))
    val probes = (0 until 50).map(i => md5Hex(s"p$i")).toDF("h")
    probes.crossJoin(bloom).filter(bloom_probe_hex($"h", $"bloom", 4096, 3))
      .count() shouldBe 0L
  }

  test("probe positions match the oracle formulation (u60 17-bit slices)") {
    val s = spark
    import s.implicits._
    // one key, k=3, m=2^17: the set bits must be exactly the three
    // (r, (u60 >> 17r) & (m-1)) positions in row-partitioned word space
    val h = md5Hex("golden")
    val bloom = Seq(h).toDF("h").agg(bloom_build_hex($"h", 1 << 17, 3))
      .collect()(0).getSeq[Long](0)
    val u = java.lang.Long.parseLong(h.substring(0, 15), 16)
    val expect = (0 until 3).map { r =>
      val p = (u >>> (17 * r)) & ((1 << 17) - 1)
      (r * 2048 + (p >>> 6).toInt, p & 63)
    }
    val setBits = bloom.zipWithIndex.flatMap { case (w, i) =>
      (0 until 64).collect { case b if ((w >>> b) & 1L) == 1L => (i, b.toLong) }
    }
    setBits.toSet shouldBe expect.toSet
  }
}
