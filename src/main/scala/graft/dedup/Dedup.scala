package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.TextExpressions._

/** Large-scale deduplication operators (LLM-data-pipeline extension set).
  *
  * Scale design: every variant avoids the O(n²) all-pairs join —
  * candidates come from equality joins on content keys (hash buckets,
  * LSH bands, SimHash chunks), so the shuffle is proportional to
  * data-plus-collisions, not pairs. That is the only formulation that
  * survives 100 TB.
  */
object Dedup {

  /** Exact duplicate groups by normalized content hash: collapse
    * whitespace, lowercase, md5. One shuffle (hash partial-agg). */
  def exactDuplicateGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " "))
    docs
      .select(col(idCol).as("doc_id"), fp.as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
  }

  /** Distinct word-shingle sets (the unit of Jaccard similarity). */
  def shingled(docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
      keep: Seq[String] = Nil): DataFrame =
    docs.select(
      (col(idCol).as("doc_id") +: keep.map(col)) :+
        wordShingles(col(textCol), n).as("shingles"): _*)

  /** MinHash-LSH candidate pairs: shingle → k-minhash signature → band
    * buckets → equality self-join per bucket. Pairs agreeing on ≥1 of
    * `bands` bands surface as candidates (recall tuned by bands×rows). */
  def minhashCandidates(sh: DataFrame, k: Int = 64, bands: Int = 16): DataFrame = {
    val rows = k / bands
    val banded = sh
      .select(col("doc_id"),
        lshBands(minhashSignature(col("shingles"), k), bands, rows).as("bh"))
      .select(col("doc_id"), explode(col("bh")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.h").as("h"))
      .localCheckpoint() // signatures are expensive; never recompute for the self-join
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard for given candidate pairs (verification stage): joins
    * shingle sets back in and computes |∩| / |∪|. */
  def jaccardOfPairs(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sized = sh.select(col("doc_id"), col("shingles"), size(col("shingles")).as("n"))
    pairs
      .join(sized.select(col("doc_id").as("doc_a"), col("shingles").as("sa"), col("n").as("na")), "doc_a")
      .join(sized.select(col("doc_id").as("doc_b"), col("shingles").as("sb"), col("n").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
  }

  /** Full MinHash near-dup pipeline: candidates → exact-verify → threshold. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 64, bands: Int = 16): DataFrame = {
    val sh = shingled(docs, idCol, textCol).cache()
    jaccardOfPairs(minhashCandidates(sh, k, bands), sh)
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs with Hamming ≤ maxDist: pigeonhole banding —
    * split the 64-bit fingerprint into maxDist+1 chunks; any pair within
    * distance shares ≥1 exact chunk, so an equality join on
    * (chunk_idx, chunk_value) finds all of them without O(n²). */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val fp = docs.select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sh"))
    val banded = fp.select(col("doc_id"), col("sh"),
        explode(sequence(lit(0), lit(chunks - 1))).as("c"))
      .withColumn("chunk",
        expr(s"shiftrightunsigned(sh, c * $width)")
          .bitwiseAND(lit((1L << width) - 1)))
    banded.as("a").join(banded.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh").as("sha"), col("b.sh").as("shb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"), hamming64(col("sha"), col("shb")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
