package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.TextExpressions._
import graft.util.Checkpointer.CheckpointSyntax

/** Large-scale deduplication operators (LLM-data-pipeline extension set).
  *
  * Scale design: every variant avoids the O(n²) all-pairs join —
  * candidates come from equality joins on content keys (hash buckets,
  * LSH bands, SimHash chunks), so the shuffle is proportional to
  * data-plus-collisions, not pairs. That is the only formulation that
  * survives 100 TB.
  *
  * Exact-dup collapse (r12): the near-dup operators additionally detect
  * duplicate-heavy corpora (members ≥ ~1.25 × distinct content keys —
  * the shape of every real crawl) and run their candidate machinery on
  * one representative per distinct key, expanding surviving group pairs
  * back to member pairs with output-sized joins — bit-identical pair
  * sets at a fraction of the bucket-join work. One honest limit: the
  * pair-complete CONTRACT is itself quadratic in dup-group size (a
  * 10M-copy boilerplate group owes 5·10¹³ within-pairs from ANY
  * implementation), so at extreme multiplicities consume the compact
  * form instead — [[exactDuplicateGroups]] for canonicalization, or the
  * collapse tier's group-pair stage, which is exactly the pre-expansion
  * representation.
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

  /** Distinct word-shingle HASH sets — same sets as [[shingled]] but as
    * 64-bit content hashes from the one-pass [[graft.functions
    * .WordShingleHashes]] scan (the HOF string composition re-ran the
    * tokenizing regex per shingle index — the dominant cost of the whole
    * dedup tier). Jaccard over these hash sets equals Jaccard over the
    * string sets (collisions negligible), and MinHash signatures computed
    * from them are BIT-IDENTICAL (same per-element FNV-1a). */
  def shingledHashes(docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
      keep: Seq[String] = Nil): DataFrame =
    docs.select(
      (col(idCol).as("doc_id") +: keep.map(col)) :+
        word_shingle_hashes(col(textCol), n).as("shingles"): _*)

  /** MinHash-LSH candidate pairs: shingle → k-minhash signature → band
    * buckets → equality self-join per bucket. Pairs agreeing on ≥1 of
    * `bands` bands surface as candidates (recall tuned by bands×rows). */
  def minhashCandidates(sh: DataFrame, k: Int = 64, bands: Int = 16): DataFrame = {
    val banded = minhashBanded(sh, k, bands)
    // materialize the (small, collision-sized) pair set so the banded
    // blocks can be released NOW — leaked corpus×bands checkpoints stack
    // across calls in a long session until memory pressure drags every
    // later job
    val pairs = minhashBandedPairs(banded)
    graft.util.BlockRelease.release(banded)
    pairs
  }

  /** The checkpointed (doc_id, band, h) banding frame behind
    * [[minhashCandidates]] — factored r16 so the group form can gate its
    * verify on the bucket-size profile before committing to the
    * pair-complete self-join. */
  private[graft] def minhashBanded(sh: DataFrame, k: Int,
      bands: Int): DataFrame = {
    val rows = k / bands
    sh.select(col("doc_id"),
        lshBands(minhashSignature(col("shingles"), k), bands, rows).as("bh"))
      .select(col("doc_id"), explode(col("bh")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.h").as("h"))
      .repartition(col("band"), col("h")) // spread buckets — don't inherit
      //                                     a single-file scan's partitioning
      .cp() // signatures are expensive; never recompute for the self-join
  }

  /** The pair-complete candidate self-join over a [[minhashBanded]]
    * frame (deduped, checkpointed). */
  private[graft] def minhashBandedPairs(banded: DataFrame): DataFrame =
    banded.as("a").hint("merge").join(banded.as("b").hint("merge"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .cp()

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

  /** Full MinHash near-dup pipeline: candidates → exact-verify → threshold.
    * Runs on shingle HASH sets end-to-end (one-pass shingling, long-array
    * intersections in the verify); signatures and surviving pairs are
    * identical to the string-shingle formulation.
    *
    * EXACT-DUP COLLAPSE tier (r12 — the [[cosineNearDupsExact]]
    * precedent, same argument in Jaccard space): identical shingle sets
    * produce identical MinHash signatures and identical Jaccard against
    * any third set, so banding each copy multiplies bucket-pair work by
    * the square of the dup multiplicity for zero information. When the
    * probe (one agg over the already-cached shingles — no extra scan)
    * sees members ≥ collapseRatio × approx-distinct sets, the pipeline
    * runs on one representative per distinct set and expands surviving
    * group pairs back to member pairs (output-sized joins); within-group
    * pairs have Jaccard ≡ 1.0 when the set is nonempty, and empty-set
    * pairs have NO Jaccard (0/0 → null in the direct tier, dropped by
    * the threshold) — mirrored by the nz guard. Pair set and Jaccard
    * values are bit-for-bit the direct tier's (DedupSpec pins both a
    * forced-collapse dup-light twin and a natural-trigger replicated
    * corpus against brute truth). */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 64, bands: Int = 16,
      collapseRatio: Double = 1.25): DataFrame = {
    val sh = shingledHashes(docs, idCol, textCol).cache()
    val probe = sh.agg(count(lit(1)), approx_count_distinct(col("shingles"))).first()
    val (nDocs, nDistinct) = (probe.getLong(0), probe.getLong(1))
    if (nDocs < collapseRatio * nDistinct) {
      // direct tier: dup-light corpus — near-dup pairs are output-sized:
      // materialize them and release the corpus-sized shingle cache and
      // the candidate checkpoint before returning
      val cand = minhashCandidates(sh, k, bands)
      val out = jaccardOfPairs(cand, sh)
        .filter(col("jaccard") >= threshold)
        .cp()
      sh.unpersist(blocking = false)
      graft.util.BlockRelease.release(cand)
      out
    } else {
      // collapse tier: gid = min member id per distinct shingle set —
      // via the group family's hash-keyed map-side-combined gid stage
      // (r15: this tier triggers EXACTLY in the high-multiplicity regime
      // where a shingle-list-partitioned window's hot key serializes one
      // task; [[gidByContent]] is the same fix the group forms got)
      val (withG0, gidScratch) = gidByContent(
          sh.select(col("doc_id").as("id"), col("shingles")),
          Seq("shingles"), checkpointKeyed = false,
          knownRows = nDocs) // sh is cached
      val withG = withG0
        .select(col("id").as("doc_id"), col("shingles"), col("gid"))
        .cp()
      graft.util.BlockRelease.release(gidScratch)
      sh.unpersist(blocking = false)
      warnPairAmplification(withG, "gid", "minhashNearDups",
        "minhashNearDupGroups", eligible = size(col("shingles")) > 0)
      val reps = withG.filter(col("doc_id") === col("gid"))
        .select(col("doc_id"), col("shingles")).cache()
      val memIds = withG.select(col("doc_id"), col("gid"),
        (size(col("shingles")) > 0).as("nz"))
      val cand = minhashCandidates(reps, k, bands)
      val gpairs = jaccardOfPairs(cand, reps)
        .filter(col("jaccard") >= threshold)
      // merge-hinted like the cosine tier: memIds is corpus-sized and
      // checkpoint stats under-estimate (the banding broadcast hazard)
      val cross = gpairs.hint("merge")
        .join(memIds.select(col("gid").as("doc_a"), col("doc_id").as("ida"))
          .hint("merge"), "doc_a")
        .hint("merge")
        .join(memIds.select(col("gid").as("doc_b"), col("doc_id").as("idb"))
          .hint("merge"), "doc_b")
        .select(least(col("ida"), col("idb")).as("doc_a"),
          greatest(col("ida"), col("idb")).as("doc_b"), col("jaccard"))
      val within = memIds.as("x").hint("merge").join(memIds.as("y").hint("merge"),
          col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id") &&
            col("x.nz"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          lit(1.0).as("jaccard"))
        .filter(lit(1.0) >= threshold)
      val out = cross.unionByName(within).cp()
      graft.util.BlockRelease.release(Seq(withG, cand))
      reps.unpersist(blocking = false)
      out
    }
  }

  /** Exact n-gram Jaccard near-dup pairs within each `scopeCol` value
    * (q33's kernel, factored r12): hashed word-shingles → inverted index
    * (one row per (doc, shingle), repartitioned by shingle so a
    * single-file scan can't serialize the self-join) → per-pair
    * intersection counts via one equality self-join + groupBy → exact
    * Jaccard ≥ threshold. Shuffle ∝ postings + co-occurrences, never
    * all pairs.
    *
    * EXACT-DUP COLLAPSE tier (the [[minhashNearDups]] argument — the
    * inverted-index join is quadratic in duplicate multiplicity):
    * identical (scope, shingle set) docs contribute identical posting
    * rows, so past the gate the index is built over one representative
    * per distinct (scope, shingle set), surviving group pairs expand to
    * member pairs (output-sized joins), and within-group pairs emit at
    * Jaccard ≡ 1.0 (nonempty sets only — empty sets have no postings in
    * the direct tier and thus no pairs, mirrored by the nz guard).
    * DedupSpec pins forced twins both ways on a replicated corpus. */
  def ngramJaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
      scopeCol: String, threshold: Double = 0.5, n: Int = 3,
      collapseRatio: Double = 1.25): DataFrame = {
    val sh = shingledHashes(docs, idCol, textCol, n, keep = Seq(scopeCol)).cache()
    val probe = sh.agg(count(lit(1)),
      approx_count_distinct(struct(col(scopeCol), col("shingles")))).first()
    val (nDocs, nDistinct) = (probe.getLong(0), probe.getLong(1))
    // inverted-index pair stage shared by both tiers
    def pairs(src: DataFrame, la: String, lb: String): (DataFrame, DataFrame) = {
      val ex = src.select(col("doc_id"), col(scopeCol),
          size(col("shingles")).as("n"), explode(col("shingles")).as("s"))
        .repartition(col("s"))
        .cp() // shingling is the expensive part; never twice
      val out = ex.as("a").join(ex.as("b"),
          col("a.s") === col("b.s") &&
            col(s"a.$scopeCol") === col(s"b.$scopeCol") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as(la), col("b.doc_id").as(lb))
        .agg(count(lit(1)).as("inter"), max(col("a.n")).as("na"),
          max(col("b.n")).as("nb"))
        .select(col(la), col(lb),
          (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
      (ex, out)
    }
    if (nDocs < collapseRatio * nDistinct) {
      val (ex, out0) = pairs(sh, "doc_a", "doc_b")
      val out = out0.cp() // pair set is output-sized:
      // materialize and free the corpus×shingles index blocks
      sh.unpersist(blocking = false)
      graft.util.BlockRelease.release(ex)
      out
    } else {
      // hash-keyed gid stage, the minhash tier's argument (r15)
      val (withG0, gidScratch) = gidByContent(
          sh.select(col("doc_id").as("id"), col(scopeCol), col("shingles")),
          Seq(scopeCol, "shingles"), checkpointKeyed = false,
          knownRows = nDocs) // sh cached
      val withG = withG0
        .select(col("id").as("doc_id"), col(scopeCol), col("shingles"),
          col("gid"))
        .cp()
      graft.util.BlockRelease.release(gidScratch)
      sh.unpersist(blocking = false)
      warnPairAmplification(withG, "gid", "ngramJaccardNearDups",
        "jaccardNearDupGroups", eligible = size(col("shingles")) > 0)
      val reps = withG.filter(col("doc_id") === col("gid"))
      val (exR, gpairs) = pairs(reps, "ga", "gb")
      val memIds = withG.select(col("doc_id"), col("gid"),
        (size(col("shingles")) > 0).as("nz"))
      val cross = gpairs.hint("merge")
        .join(memIds.select(col("gid").as("ga"), col("doc_id").as("ida"))
          .hint("merge"), "ga")
        .hint("merge")
        .join(memIds.select(col("gid").as("gb"), col("doc_id").as("idb"))
          .hint("merge"), "gb")
        .select(least(col("ida"), col("idb")).as("doc_a"),
          greatest(col("ida"), col("idb")).as("doc_b"), col("jaccard"))
      val within = memIds.as("x").hint("merge").join(memIds.as("y").hint("merge"),
          col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id") &&
            col("x.nz"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          lit(1.0).as("jaccard"))
        .filter(lit(1.0) >= threshold)
      val out = cross.unionByName(within).cp()
      graft.util.BlockRelease.release(Seq(withG, exR))
      out
    }
  }

  /** Shingle-candidate + cosine-verify near-dup pairs (q38's kernel,
    * factored r12): candidates are doc pairs sharing ≥1 exact hashed
    * n-word shingle within a `scopeCol` value (inverted-index equality
    * self-join, repartitioned by shingle), each verified by exact cosine
    * ≥ tau over the [[graft.functions.TextFunctions.md5Embed]] vectors.
    * The embedding projection is checkpointed BEFORE the pair join —
    * Catalyst otherwise collapses it past the join and re-evaluates the
    * (interpreted higher-order) md5 vector fold once per candidate pair
    * side instead of once per document (measured 14 s → <1 s on 56k
    * sf0.1 candidates).
    *
    * EXACT-DUP COLLAPSE tier — at the DOCUMENT level, upstream of every
    * expensive stage: the group key (scope, text) determines the shingle
    * set AND the embedding, so past the gate the shingling, the
    * embedding fold, the inverted-index join and the verify all run on
    * one representative per distinct (scope, text); surviving group
    * pairs expand to member pairs (output-sized joins), and
    * within-group pairs emit at cos ≡ 1.0 exactly (dot(v,v) is
    * bit-equal to n² by identical fold order, and √(n²·n²) = n² exactly
    * for these integer-valued sums) — guarded by the SAME conditions
    * the direct tier imposes: a nonempty shingle set (no postings → no
    * candidate) and n² > 0. DedupSpec pins forced twins both ways on a
    * replicated corpus. */
  def shingleCosineVerify(docs: DataFrame, idCol: String, textCol: String,
      scopeCol: String, tauCos: Double = 0.6, n: Int = 3,
      collapseRatio: Double = 1.25): DataFrame = {
    val d0 = docs.select(col(idCol).as("doc_id"), col(scopeCol).as("scope"),
      col(textCol).as("text"))
    // pair stage shared by both tiers (and by the r14 group form)
    def verifiedPairs(src: DataFrame, la: String, lb: String):
        (DataFrame, DataFrame, DataFrame) =
      shingleCosinePairStage(src, la, lb, tauCos, n)
    val probe = d0.agg(count(lit(1)),
      approx_count_distinct(struct(col("scope"), col("text")))).first()
    val (nDocs, nDistinct) = (probe.getLong(0), probe.getLong(1))
    if (nDocs < collapseRatio * nDistinct) {
      val (shr, emb, out) = verifiedPairs(d0, "doc_a", "doc_b")
      graft.util.BlockRelease.release(Seq(shr, emb))
      out
    } else {
      // hash-keyed gid stage, the minhash tier's argument (r15); d0 is a
      // plain column-pruned projection, cheap to evaluate twice
      val (withG0, gidScratch) = gidByContent(
          d0.select(col("doc_id").as("id"), col("scope"), col("text")),
          Seq("scope", "text"), checkpointKeyed = false, knownRows = nDocs)
      val withG = withG0
        .select(col("id").as("doc_id"), col("scope"), col("text"),
          col("gid"))
        .cp()
      graft.util.BlockRelease.release(gidScratch)
      val reps = withG.filter(col("doc_id") === col("gid"))
        .select(col("doc_id"), col("scope"), col("text"))
      val (shr, emb, gout) = verifiedPairs(reps, "ga", "gb")
      val memIds = withG.select(col("doc_id"), col("gid"))
      val cross = gout.hint("merge")
        .join(memIds.select(col("gid").as("ga"), col("doc_id").as("ida"))
          .hint("merge"), "ga")
        .hint("merge")
        .join(memIds.select(col("gid").as("gb"), col("doc_id").as("idb"))
          .hint("merge"), "gb")
        .select(least(col("ida"), col("idb")).as("doc_a"),
          greatest(col("ida"), col("idb")).as("doc_b"), col("cos"))
      // within-group pairs obey the direct tier's emission conditions:
      // ≥1 shingle (else no candidate) and n² > 0 (the verify guard)
      val repFlags = shr.select(col("doc_id").as("gid"),
          (size(col("shingles")) > 0).as("nz"))
        .join(emb.select(col("doc_id").as("gid"), (col("n2") > 0).as("pos")), "gid")
      val within = memIds.as("x").hint("merge").join(memIds.as("y").hint("merge"),
          col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.gid").as("gid"))
        .join(repFlags, "gid")
        .filter(col("nz") && col("pos") && lit(1.0) >= tauCos)
        .select(col("doc_a"), col("doc_b"), lit(1.0).as("cos"))
      val out = cross.unionByName(within).cp()
      graft.util.BlockRelease.release(Seq(withG, shr, emb, gout))
      out
    }
  }

  /** The shingle-candidate + cosine-verify pair stage over `src`
    * (doc_id, scope, text) — factored r14 so [[shingleCosineVerify]]'s
    * tiers and [[shingleCosineGroups]] share one definition of the
    * near-dup relation. Returns (shingled frame, embedding frame,
    * verified pairs) — all three localCheckpointed; the CALLER releases
    * them. The embedding projection is checkpointed BEFORE the pair join
    * (Catalyst otherwise collapses it past the join and re-evaluates the
    * interpreted higher-order md5 fold once per candidate SIDE instead
    * of once per document — measured 14 s → <1 s at sf0.1). */
  private def shingleCosinePairStage(src: DataFrame, la: String,
      lb: String, tauCos: Double, n: Int):
      (DataFrame, DataFrame, DataFrame) = {
    val shr = shingledHashes(src, "doc_id", "text", n, keep = Seq("scope"))
      .cp() // shingling runs once: postings + nz flags
    val ex = shr.select(col("doc_id"), col("scope"),
        explode(col("shingles")).as("k"))
      .repartition(col("k")) // spread the inverted index
      .cp()
    val cand = ex.as("a").join(ex.as("b"),
        col("a.k") === col("b.k") && col("a.scope") === col("b.scope") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as(la), col("b.doc_id").as(lb)).distinct()
      .cp()
    graft.util.BlockRelease.release(ex)
    val emb = src.select(col("doc_id"), md5Embed(col("text")).as("v"))
      .withColumn("n2", aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x))
      .cp()
    val out = cand
      .join(emb.select(col("doc_id").as(la), col("v").as("va"), col("n2").as("na2")), la)
      .join(emb.select(col("doc_id").as(lb), col("v").as("vb"), col("n2").as("nb2")), lb)
      .filter(col("na2") > 0 && col("nb2") > 0)
      .select(col(la), col(lb),
        round(aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) / sqrt(col("na2") * col("nb2")), 4)
          .as("cos"))
      .filter(col("cos") >= tauCos)
      .cp()
    graft.util.BlockRelease.release(cand)
    (shr, emb, out)
  }

  /** Group-form variant of [[shingleCosinePairStage]] (r16): same shr /
    * ex / emb construction and the same exact-cosine verify, but the
    * candidate+verify stage rides [[gatedBucketEdges]] — pair-complete
    * when the posting buckets are dup-light (the oracle regime, plan
    * unchanged), star+repair when they are near-dup-dense. Returns
    * (shingled frame, embedding frame, verified edges (ga, gb)) — all
    * checkpointed; the CALLER releases them. */
  private def shingleCosineRepStage(src: DataFrame, tauCos: Double,
      n: Int): (DataFrame, DataFrame, DataFrame) = {
    val shr = shingledHashes(src, "doc_id", "text", n, keep = Seq("scope"))
      .cp()
    val ex = shr.select(col("doc_id"), col("scope"),
        explode(col("shingles")).as("k"))
      .repartition(col("k"))
      .cp()
    val emb = src.select(col("doc_id"), md5Embed(col("text")).as("v"))
      .withColumn("n2", aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x))
      .cp()
    def withVecs(c: DataFrame): DataFrame = c
      .join(emb.select(col("doc_id").as("ga"), col("v").as("va"),
        col("n2").as("na2")), "ga")
      .join(emb.select(col("doc_id").as("gb"), col("v").as("vb"),
        col("n2").as("nb2")), "gb")
    val cosExpr =
      round(aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) / sqrt(col("na2") * col("nb2")), 4)
    val edges = gatedBucketEdges(ex, "doc_id", Seq("scope", "k"),
      "shingleCosineGroups",
      pairComplete = () => {
        val cand = ex.as("a").join(ex.as("b"),
            col("a.k") === col("b.k") && col("a.scope") === col("b.scope") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("ga"), col("b.doc_id").as("gb"))
          .distinct()
          .cp()
        val e = withVecs(cand)
          .filter(col("na2") > 0 && col("nb2") > 0)
          .select(col("ga"), col("gb"), cosExpr.as("cos"))
          .filter(col("cos") >= tauCos)
          .select(col("ga"), col("gb"))
          .cp()
        graft.util.BlockRelease.release(cand)
        e
      },
      verify = c => withVecs(c)
        .select(col("ga"), col("gb"),
          when(col("na2") > 0 && col("nb2") > 0, cosExpr).as("cos"))
        .withColumn("_pass", coalesce(col("cos") >= tauCos, lit(false))),
      "ga", "gb")
    graft.util.BlockRelease.release(ex)
    (shr, emb, edges)
  }

  /** COMPACT GROUP form of [[shingleCosineVerify]] — the last of the
    * four text near-dup kernels to get the q110 escape hatch (q38's
    * pair form materialized 41.7M rows at dup multiplicity 30, the
    * largest pair-complete output in the family). Emits (doc_id,
    * canon_id, group_size): components of the "shares ≥1 scoped shingle
    * AND exact cosine ≥ tauCos" relation, linear in group members —
    * exact-dup groups by one (scope, text) window, the shingling /
    * embedding / inverted-index / verify all on REPRESENTATIVES only
    * (the collapse-tier argument: the group key determines the shingle
    * set AND the embedding), components over the rep graph, members
    * attach via gid.
    *
    * Pair-ineligibility is per TEXT, so it is decided on the REP and
    * inherited: docs whose text yields no shingles (no postings → no
    * candidate) or a zero embedding (the verify's n² > 0 guard) can
    * never pair — even with an identical twin — and stay singletons
    * (gid overridden to the doc's own id), exactly the pair form's
    * emission conditions. Requires tauCos ≤ 1 (identical eligible texts
    * must be near-dups: their rounded cosine is exactly 1.0). */
  def shingleCosineGroups(docs: DataFrame, idCol: String, textCol: String,
      scopeCol: String, tauCos: Double = 0.6, n: Int = 3): DataFrame = {
    require(tauCos <= 1.0,
      "group form needs tauCos <= 1 (identical docs must be near-dups)")
    val d0 = docs.select(col(idCol).cast("long").as("id"),
      col(scopeCol).as("scope"), col(textCol).as("text"))
    // null-text docs are singletons by the eligibility contract above
    // (null shingles, null embedding — the pair stage emits nothing for
    // them): route them AROUND the gid stage (r15). NON-null degenerate
    // texts (whitespace, < n tokens) are NOT bypassable here — the pair
    // stage's WordShingleHashes floors at one shingle, so identical
    // degenerate twins DO pair (cos ≡ 1) and must group; their hot
    // content key is handled by gidByContent's map-side combine instead.
    val trivial = col("text").isNull
    val singletons = d0.filter(trivial)
      .select(col("id"), col("id").as("gid"))
    val (withGid, gidScratch) = gidByContent(d0.filter(!trivial),
      Seq("scope", "text"), checkpointKeyed = false) // plain pruned scan
    val mem0 = withGid.select(col("id"), col("scope"), col("text"),
        col("gid"))
      .cp()
    graft.util.BlockRelease.release(gidScratch)
    val reps = mem0.filter(col("id") === col("gid"))
      .select(col("id").as("doc_id"), col("scope"), col("text"))
    val (shr, emb, gout) = shingleCosineRepStage(reps, tauCos, n)
    // eligibility flags per rep (inherited by the whole exact-dup group)
    val repFlags = shr.select(col("doc_id").as("gid"),
        (size(col("shingles")) > 0).as("nz"))
      .join(emb.select(col("doc_id").as("gid"), (col("n2") > 0).as("pos")),
        "gid")
    // checkpointed so groupsFromReps' leaf-walking release never reaches
    // the caller's input through the singleton branch (d0 is a leaf here)
    // same hot-gid probe shape as groupsFromReps' attaches: small
    // repFlags broadcasts whole (covers every rep gid by construction);
    // a big one is completed with member counts and heavy-hitter-split
    // (joinBackBounded's discipline)
    val memProbe = mem0.select(col("id"), col("gid"))
    val (memFlagged, flagsScratch) =
      if (repFlags.count() < graft.util.SizeGate.DefaultRows)
        (memProbe.join(
          org.apache.spark.sql.functions.broadcast(repFlags), Seq("gid"),
          "left"), Nil)
      else {
        val flagsFull = memProbe.groupBy(col("gid"))
          .agg(count(lit(1)).as("_mcnt"))
          .join(repFlags, Seq("gid"), "left")
          .cp(false) // lazy: buildCounts materializes it
        (joinBackBounded(memProbe, flagsFull, Seq("gid"), "_mcnt",
          counts = Some(buildCounts(flagsFull, "_mcnt"))),
          Seq(flagsFull))
      }
    val mem = memFlagged
      .select(col("id"),
        when(col("nz") && col("pos"), col("gid")).otherwise(col("id"))
          .as("gid"))
      .unionByName(singletons)
      .cp()
    val out = groupsFromReps(mem,
      gout.select(col("ga").as("src"), col("gb").as("dst")))
    graft.util.BlockRelease.release(Seq(mem0, shr, emb, gout) ++
      flagsScratch)
    out
  }

  /** Embedding-cosine near-duplicate pairs at threshold `tau` via
    * signed-random-projection LSH banding (the 100 TB path for vector
    * dedup): each vector gets `tables` b-bit hyperplane-sign signatures;
    * candidates come from equality self-joins on (table, signature) —
    * shuffle ∝ data + collisions, never all pairs — then candidates are
    * verified with the exact dot product.
    *
    * Recall per pair at similarity s: 1 − (1 − p^bits)^tables with
    * p = 1 − acos(s)/π. At bits=12, tables=48: miss ≈ 3e-4 at s = 0.9 and
    * ≈ 1.5e-10 at s = 0.97 — true near-duplicates (the use case) sit at
    * the top of that range. NOT suitable for low thresholds (τ ≲ 0.6):
    * weakly-similar pairs need tables growing like p^-bits, and the exact
    * tier (brute τ-join) is the right tool there.
    *
    * **Banding resolution AUTO-SCALES with corpus size** (bits/tables = −1,
    * the default): random-pair bucket collisions cost ~n²·tables·2^-bits
    * verify evaluations, so FIXED bits turn quadratic one decade above
    * whatever corpus they were tuned for (measured: 12 bits = 15 s at 50k
    * docs but 1102 s at 500k — collisions, not signatures, dominate).
    * bits = max(12, ⌈log2 n⌉ + 2) pins the expected bucket size to O(1)
    * (collisions ∝ n·tables/4), and tables is re-solved from the recall
    * law for miss ≤ 3e-4 at s = τ, so recall is corpus-size-invariant.
    * At 500k/τ=0.9 this picks (21, 207): banding 103M skinny rows
    * (linear·log), collisions ~1e7 (vs 1.5e9 at fixed 12 bits) —
    * measured 1102 s → 209 s at 500k, 15.1 → 7.6 s at 50k (with the
    * skinny-banding restructure below). Explicit bits/tables skip the
    * count probe and the scaling (the oracle-pinned exact tier passes
    * fixed values).
    *
    * Shape:
    *  - ALL tables' signatures in one codegen pass ([[graft.functions
    *    .HyperplaneSigs]]) — the per-table literal-array composition was
    *    12k+ Catalyst nodes that fell out of whole-stage codegen;
    *  - banding is SKINNY — (id, t, s) rows, ~24 B each — because with
    *    auto-scaled tables the banding is what the self-join sorts;
    *    carrying the vector through it multiplies shuffle/sort bytes by
    *    dim·8 (measured 47 s vs 7.6 s at 50k, 54 GB of banded state at
    *    500k). Repartitioned BY (t, s) so a few-file corpus scan's
    *    partitioning doesn't serialize the bucket join;
    *  - candidate id-pairs are DEDUPED before vectors are fetched, then
    *    one sort-merge verify join computes each candidate's dot product
    *    exactly once. The round-4 objection to staged candidates (8.6M
    *    materialized for 4.8k pairs at fixed 12 bits in a dense cluster)
    *    is dissolved by the auto-scaling: collisions are bounded at
    *    ~n·tables/4, so the candidate set is collision-sized, not
    *    dense-cluster-quadratic.
    *
    * EXACT-DUP COLLAPSE tier (r12 — the [[cosineNearDupsExact]] argument,
    * float edition): past members ≥ collapseRatio × approx-distinct
    * normalized vectors (the gate rides the SAME probe action that feeds
    * autoBanding's count — no extra scan), banding runs on one
    * representative per distinct nv and group pairs expand output-sized;
    * within-group sim is COMPUTED from the rep (the direct tier's own
    * verify expression), never assumed 1.0. Pair set and sims bit-equal
    * at any config (DedupSpec: forced twin at both spec SFs + replicated
    * corpus vs brute).
    *
    * @param vecs (id, vector) — vectors need not be pre-normalized
    * @param dim embedding width; callers know it (it's their embed config) —
    *            the default −1 falls back to a one-row probe, which costs a
    *            driver action (an extra scan-capable job per call at scale)
    * @return (id_a, id_b, sim) with id_a < id_b and sim = cosine rounded 4dp
    */
  def cosineNearDups(vecs: DataFrame, idCol: String, vCol: String,
      tau: Double = 0.9, bits: Int = -1, tables: Int = -1,
      dim: Int = -1, collapseRatio: Double = 1.25): DataFrame = {
    import graft.functions.VectorFunctions
    val d = if (dim > 0) dim else vecs.select(size(col(vCol))).first().getInt(0)
    val n0 = vecs
      .select(col(idCol).as("id"), VectorFunctions.l2normalize(col(vCol)).as("nv"))
      .cp() // normalize once: banding AND verify read it
    // ONE probe action carries the autoBanding count AND the r12
    // exact-dup collapse gate (members vs approx-distinct normalized
    // vectors) — the separate vecs.count() scan is absorbed
    val probe = n0.agg(count(lit(1)), approx_count_distinct(col("nv"))).first()
    val (cnt, nDistinct) = (probe.getLong(0), probe.getLong(1))
    val (b, t) =
      if (bits > 0 && tables > 0) (bits, tables)
      else autoBanding(tau, cnt, bits, tables)
    // SKINNY banding — (id, t, s) only, ~24 B/row: with auto-scaled bits
    // the banding carries each id `tables` times, and `tables` grows with
    // ⌈log2 n⌉, so banding bytes are what the self-join sorts/shuffles.
    // Carrying the vector through the banding (the old verify-in-join
    // shape) multiplied that by dim·8 B — measured 47 s vs 11 s at 50k
    // docs, 54 GB of banded state at 500k.
    //
    // hint("merge") on BOTH sides (here and in every banding self-join):
    // the banded set is corpus×tables-sized BY CONSTRUCTION, never a
    // broadcast candidate — but localCheckpoint propagates the
    // PRE-checkpoint size estimate, so a stat-less source (in-memory
    // range/Dataset, no parquet footers) reads as kilobytes and the
    // static planner elects a broadcast that only fails when the 14.6 GiB
    // build side materializes (measured, 500k-doc ScaleBench corpus).
    // AQE cannot demote it: the build side has no shuffle stage to
    // re-estimate. SMJ is what accurate stats pick here anyway.
    //
    // Candidate id-pairs are deduped BEFORE the vectors are fetched: a
    // true near-dup pair collides in ~tables·p^bits tables, and the
    // auto-scaled config bounds random collisions at ~n·tables/4, so the
    // distinct candidate set is collision-sized, and each candidate's
    // vectors are joined back exactly once for the verify dot product.
    // Merge-hinted verify joins: neither side may be a broadcast (the
    // stat-misestimate hazard above) nor a per-partition hash build (the
    // candidates+vectors intermediate of the second join measured ~7 GB
    // at 500k docs and blew the per-task memory grant as a hash
    // relation); sort-merge streams both sides and AQE skew-splits it.
    def bandPairs(src: DataFrame, la: String, lb: String): DataFrame = {
      val allSigs = graft.functions.VectorExpressions
        .hyperplane_sigs(col("nv"), d, "neardup", b, t)
      val banded = src.select(col("id"), posexplode(allSigs).as(Seq("t", "s")))
        .repartition(col("t"), col("s"))
        .cp() // sigs computed once, spread over buckets
      val candidates = banded.as("a").hint("merge").join(banded.as("b").hint("merge"),
          col("a.t") === col("b.t") && col("a.s") === col("b.s") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as(la), col("b.id").as(lb))
        .dropDuplicates(la, lb)
      val withA = candidates.hint("merge")
        .join(src.select(col("id").as(la), col("nv").as("va")), la)
      val out = withA.hint("merge")
        .join(src.select(col("id").as(lb), col("nv").as("vb")), lb)
        .select(col(la), col(lb),
          round(VectorFunctions.dot(col("va"), col("vb")), 4).as("sim"))
        .filter(col("sim") >= tau)
        .cp()
      graft.util.BlockRelease.release(banded)
      out
    }
    if (cnt < collapseRatio * nDistinct) {
      // direct tier: dup-light corpus — band every row as before
      val out = bandPairs(n0, "id_a", "id_b")
      graft.util.BlockRelease.release(n0)
      out
    } else {
      // r12 EXACT-DUP COLLAPSE tier (the [[cosineNearDupsExact]]
      // argument, float edition): identical normalized vectors sign
      // identically in every table and score identically against any
      // third vector, so band one representative per distinct nv and
      // expand group pairs output-sized. Within-group sim is COMPUTED
      // from the rep (round(dot(nv,nv), 4) — the exact expression the
      // direct tier's verify evaluates for such a pair), never assumed
      // 1.0: zero or denormal vectors fall out of the threshold the
      // same way in both tiers.
      // hash-keyed gid stage, the minhash tier's argument (r15)
      val (withG0, gidScratch) = gidByContent(n0.select(col("id"), col("nv")),
          Seq("nv"), checkpointKeyed = false,
          knownRows = cnt) // n0 is checkpointed
      val withG = withG0.cp()
      graft.util.BlockRelease.release(gidScratch :+ n0)
      val reps = withG.filter(col("id") === col("gid")).select(col("id"), col("nv"))
      val gout = bandPairs(reps, "ga", "gb")
      val memIds = withG.select(col("id"), col("gid"))
      val cross = gout.hint("merge")
        .join(memIds.select(col("gid").as("ga"), col("id").as("ida"))
          .hint("merge"), "ga")
        .hint("merge")
        .join(memIds.select(col("gid").as("gb"), col("id").as("idb"))
          .hint("merge"), "gb")
        .select(least(col("ida"), col("idb")).as("id_a"),
          greatest(col("ida"), col("idb")).as("id_b"), col("sim"))
      val repSim = reps.select(col("id").as("gid"),
          round(VectorFunctions.dot(col("nv"), col("nv")), 4).as("sim"))
        .filter(col("sim") >= tau)
      val within = memIds.as("x").hint("merge").join(memIds.as("y").hint("merge"),
          col("x.gid") === col("y.gid") && col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
          col("x.gid").as("gid"))
        .join(repSim, "gid")
        .select(col("id_a"), col("id_b"), col("sim"))
      val out = cross.unionByName(within).cp()
      graft.util.BlockRelease.release(Seq(withG, gout))
      out
    }
  }

  /** The banding-resolution law (see [[cosineNearDups]] scaladoc):
    * bits = max(12, ⌈log2 n⌉ + 2) holds expected random-collision work at
    * O(n·tables); tables solved from the per-pair recall law
    * 1 − (1 − p^bits)^tables ≥ 1 − 3e-4 at s = τ, p = 1 − acos(τ)/π.
    * At n ≤ ~1k this reproduces the historical fixed config (12, 48) for
    * τ = 0.9 exactly, so small-corpus behavior (and every spec golden)
    * is unchanged. Overrides apply independently. */
  private[graft] def autoBanding(tau: Double, n: Long,
      bitsOverride: Int = -1, tablesOverride: Int = -1): (Int, Int) = {
    val b =
      if (bitsOverride > 0) bitsOverride
      else math.max(12, math.ceil(
        math.log(math.max(n, 2).toDouble) / math.log(2.0)).toInt + 2)
    val t =
      if (tablesOverride > 0) tablesOverride
      else {
        val p = 1.0 - math.acos(math.min(tau, 1.0)) / math.Pi
        val hit = math.pow(p, b)
        math.max(1, math.ceil(math.log(3e-4) / math.log1p(-hit)).toInt)
      }
    (b, t)
  }

  /** [[cosineNearDups]] with a RATIONAL-threshold, integer-exact verify —
    * the DECIDABLE tier for integer-valued vectors (feature-hash counts
    * like [[graft.functions.TextFunctions.md5Embed]]'s ±1 bucket sums).
    *
    * For τ = tauNum/tauDen > 0, `cos(a,b) ≥ τ` is equivalent to
    * `dot > 0 ∧ tauDen²·dot² ≥ tauNum²·|a|²·|b|²` — every operand an
    * integer, every product exact in doubles (bounds: |dot| ≤ tokens², so
    * dot² ≤ 1e12 for 1k-token docs, far under 2^53). Any engine that
    * reproduces the vectors reproduces the PAIR SET bit-for-bit: no
    * floating-point rounding boundary exists for a pair to sit on (the
    * round-5 q24 oracle attempt died on exactly such a boundary).
    * Candidate generation is unchanged SRP banding (hyperplane signs are
    * scale-invariant, so raw integer vectors band identically to their
    * normalized forms); only the verify predicate differs.
    *
    * Zero vectors (all tokens hash-cancelled) have no cosine and are
    * excluded, mirrored by `n2 > 0` in SQL twins.
    *
    * EXACT-DUP COLLAPSE tier (r12, from the 10× ScaleBench sweep):
    * identical vectors produce identical hyperplane signatures in EVERY
    * table, so banding each copy separately multiplies bucket-pair work
    * by the SQUARE of the duplicate multiplicity for zero information —
    * the sweep's 10-way-replicated corpus measured 309 s here (~100× the
    * pair work of its 50k distinct vectors). Crawl corpora are exactly
    * this shape (boilerplate, mirrors, re-posts), so when the dup ratio
    * warrants it the operator bands ONE representative per distinct
    * vector, then expands surviving group pairs back to member pairs (an
    * output-sized join) and emits within-group pairs directly through
    * the same predicate. The pair set is BIT-FOR-BIT the direct tier's
    * at every SF and banding config: if u = v then (u,x) collides and
    * verifies iff (v,x) does, and identical vectors always share every
    * bucket, so within-group pairs were always emitted iff the predicate
    * holds (cos = 1, i.e. iff tauDen ≥ tauNum) — which is exactly what
    * the direct emission computes. DedupSpec's lsh-equals-brute pin and
    * a forced-collapse twin certify the equivalence.
    *
    * The TIER GATE rides the maxN2 guard action (same scan, two more
    * agg columns — no extra job): collapse only when members ≥ 1.25 ×
    * approx-distinct vectors. Below that the banding savings (∝ 1−1/r²)
    * cannot pay for the collapse machinery (a corpus-sized window
    * shuffle + two output-sized expansion joins — measured 2.1× on the
    * dup-free sf0.1 corpus), and the direct tier runs UNCHANGED. */
  def cosineNearDupsExact(vecs: DataFrame, idCol: String, vCol: String,
      tauNum: Long = 9, tauDen: Long = 10, bits: Int = 12, tables: Int = 48,
      dim: Int = -1, collapseRatio: Double = 1.25): DataFrame = {
    import graft.functions.VectorFunctions
    require(tauNum > 0 && tauDen > 0, "rational τ must be positive")
    val d = if (dim > 0) dim else vecs.select(size(col(vCol))).first().getInt(0)
    // FAT banding with verify-inside-join — deliberately NOT the float
    // tier's skinny/dedup-then-verify shape: this tier runs at the oracle
    // SFs on a DENSE near-dup corpus (sf0.1: 120k true pairs over 5k
    // docs, ~15 bucket hits per true pair at 96 tables), where filtering
    // to true pairs BEFORE the distinct keeps the dedup output-sized; a
    // candidate-first restructure measured 4.5 → 23 s here. The skinny
    // shape wins in the float tier's regime (huge corpora, collision-
    // bounded candidates via autoBanding); the two tiers document the
    // crossover.
    val base = vecs.select(col(idCol).as("id"), col(vCol).as("v"),
        VectorFunctions.dot(col(vCol), col(vCol)).as("n2"))
      .filter(col("n2") > 0)
    // exactness GUARD, not just a scaladoc bound: the decidability
    // contract needs every predicate operand exact in doubles, and
    // |dot| ≤ √(na²·nb²) (Cauchy–Schwarz) makes
    // max(tauNum², tauDen²)·maxN2² an upper bound for both sides. A
    // corpus of long-enough documents to break 2^53 must fail LOUDLY
    // here — silently degrading to float rounding is exactly what this
    // tier exists to rule out. One cheap aggregation per call, which the
    // collapse-tier gate rides for free (same scan, two more columns).
    val probe = base.agg(coalesce(max(col("n2")), lit(0.0)),
      count(lit(1)), approx_count_distinct(col("v"))).first()
    val maxN2 = probe.getDouble(0)
    val nMembers = probe.getLong(1)
    val nDistinct = probe.getLong(2)
    val tauSq = math.max(tauNum.toDouble * tauNum, tauDen.toDouble * tauDen)
    require(tauSq * maxN2 * maxN2 <= math.pow(2, 53),
      f"cosineNearDupsExact: max |v|² = $maxN2%.0f makes τ²·dot² exceed 2^53 — " +
      "the integer predicate would round; shorten documents or rescale vectors")
    def pred(dotC: Column, na2C: Column, nb2C: Column): Column =
      dotC > 0 &&
        lit(tauDen * tauDen) * dotC * dotC >= lit(tauNum * tauNum) * na2C * nb2C
    val allSigs = graft.functions.VectorExpressions
      .hyperplane_sigs(col("v"), d, "neardup", bits, tables)
    // banding self-join shared by both tiers: (la, lb, dot, na2, nb2)
    // with la < lb, predicate-filtered, deduped
    def bandPairs(src: DataFrame, la: String, lb: String): DataFrame = {
      val banded = src.select(col("id"), col("v"), col("n2"),
          posexplode(allSigs).as(Seq("t", "s")))
        .repartition(col("t"), col("s"))
        .cp()
      val dotAB = VectorFunctions.dot(col("a.v"), col("b.v"))
      val out = banded.as("a").hint("merge").join(banded.as("b").hint("merge"),
          col("a.t") === col("b.t") && col("a.s") === col("b.s") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as(la), col("b.id").as(lb),
          dotAB.as("dot"), col("a.n2").as("na2"), col("b.n2").as("nb2"))
        .filter(pred(col("dot"), col("na2"), col("nb2")))
        .dropDuplicates(la, lb)
        .cp()
      graft.util.BlockRelease.release(banded)
      out
    }
    if (nMembers < collapseRatio * nDistinct)
      // direct tier: dup-light corpus — the collapse machinery cannot
      // pay for itself; band every row exactly as before
      bandPairs(base, "id_a", "id_b")
    else {
      // collapse tier: gid = min member id per distinct vector — the
      // hash-keyed map-side-combined gid stage (r15, the group family's
      // fix: this tier triggers exactly when some vector is hot, and a
      // v-partitioned window serialized that group into one task); mem
      // feeds banding (reps), both expansion probes and the within
      // self-join.
      val (mem0, gidScratch) = gidByContent(
        base.select(col("id"), col("v"), col("n2")),
        Seq("v"), checkpointKeyed = false,
        knownRows = nMembers) // base: pruned scan + dot
      val mem = mem0.cp()
      graft.util.BlockRelease.release(gidScratch)
      warnPairAmplification(mem, "gid", "cosineNearDupsExact",
        "cosineNearDupGroups", eligible = col("n2") > 0)
      val reps = mem.filter(col("id") === col("gid"))
        .select(col("id"), col("v"), col("n2"))
      val gout = bandPairs(reps, "ga", "gb")
      // cross-group expansion: |A|·|B| member pairs per surviving group
      // pair — output-sized by definition. Orientation is per MEMBER
      // pair (least/greatest), so na2/nb2 swap with it. merge-hinted:
      // mem is corpus-sized and checkpoint stats under-estimate (the
      // banding broadcast hazard above).
      val cross = gout.hint("merge")
        .join(mem.select(col("gid").as("ga"), col("id").as("ida")).hint("merge"), "ga")
        .hint("merge")
        .join(mem.select(col("gid").as("gb"), col("id").as("idb")).hint("merge"), "gb")
        .select(
          least(col("ida"), col("idb")).as("id_a"),
          greatest(col("ida"), col("idb")).as("id_b"),
          col("dot"),
          when(col("ida") < col("idb"), col("na2")).otherwise(col("nb2")).as("na2"),
          when(col("ida") < col("idb"), col("nb2")).otherwise(col("na2")).as("nb2"))
      // within-group pairs: dot = |v|² exactly; the predicate is applied
      // (not assumed) so τ > 1 configurations stay correct
      val within = mem.as("x").hint("merge").join(mem.as("y").hint("merge"),
          col("x.gid") === col("y.gid") && col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
          col("x.n2").as("dot"), col("x.n2").as("na2"), col("y.n2").as("nb2"))
        .filter(pred(col("dot"), col("na2"), col("nb2")))
      val out = cross.unionByName(within).cp()
      graft.util.BlockRelease.release(Seq(gout, mem))
      out
    }
  }

  /** Measured crossover of the pair-complete contract (BENCH_LOCAL_r13.md
    * §7, the k-multiplicity cells): the pair form is the right output up
    * to dup multiplicity ~10 (23.3 s at the measurement corpus), and 10×
    * slower than the group form by multiplicity 30 (126.6 s vs 12.7 s —
    * all of it C(k,2) member-pair materialization). Amplification =
    * Σ C(k,2) / members ≈ (mean k − 1)/2, so the guard warns above 10
    * (mean multiplicity ≈ 20, between the measured decades). */
  private[graft] val PairAmplificationWarnAt = 10.0

  /** Projected member pairs PER DOC if this collapsed corpus is expanded
    * pair-complete: Σ C(k,2) over exact-dup groups / member count. One
    * cheap aggregation over the already-checkpointed gid frame. */
  private[graft] def pairAmplification(mem: DataFrame,
      gidCol: String = "gid"): Double = {
    val r = mem.groupBy(col(gidCol)).agg(count(lit(1)).as("k"))
      .agg(coalesce(sum(col("k")), lit(0L)).cast("double"),
        coalesce(sum(col("k") * (col("k") - 1) / 2), lit(0L)).cast("double"))
      .first()
    if (r.getDouble(0) == 0.0) 0.0 else r.getDouble(1) / r.getDouble(0)
  }

  /** The auto-guard on the pair-complete collapse tiers (r13 verdict
    * item 5): nothing STOPS a caller from running a pair form on a
    * multiplicity-100 corpus — the output is still exactly what was
    * asked for — but past the measured crossover it is the wrong form,
    * so the tier says so LOUDLY (stderr, the engine's harness channel)
    * and names the linear escape hatch. Costs one aggregation over the
    * gid frame the collapse tier just built.
    *
    * `eligible` restricts the projection to docs the pair form would
    * actually emit pairs for (r15 ADVICE fix): the gid frames group ALL
    * pair-ineligible docs together (every < n-token doc shares the
    * empty shingle list; every zero vector shares v = 0), yet those
    * docs emit ZERO pairs — on a short-doc-heavy corpus the unfiltered
    * projection is inflated and the warning fires spuriously,
    * recommending a group-form switch that would not reduce pair
    * output. */
  private[graft] def warnPairAmplification(mem: DataFrame, gidCol: String,
      caller: String, escape: String,
      eligible: Column = lit(true)): Unit = {
    val amp = pairAmplification(mem.filter(eligible), gidCol)
    if (amp > PairAmplificationWarnAt)
      System.err.println(
        f"WARN graft.dedup.$caller: exact-dup multiplicity projects ~$amp%.1f " +
        f"member pairs per doc (measured pair-form ceiling: right through " +
        f"multiplicity ~10, 10x slower than the group form by 30) — " +
        f"prefer $escape for canonicalization-shaped consumers")
  }

  /** COMPACT GROUP-REPRESENTATIVE near-dup output — the escape hatch for
    * the pair-complete contract's quadratic ceiling, located by the r13
    * k=30 dup-multiplicity cell (BENCH_LOCAL_r13.md §7: q24's
    * pair-complete form is 23.3 s at multiplicity 10 but 125.5 s at 30,
    * all of it C(k,2) within-group pair materialization). Instead of
    * every near-dup PAIR, emit every doc's CANONICAL representative
    * (doc_id, canon_id, group_size), where canon_id = the smallest doc
    * id in the doc's connected component under the near-dup relation —
    * the r12 collapse tier's group structure EXPOSED rather than
    * expanded, and the form a dedup pipeline actually consumes
    * (keep-canonical, drop the rest — the q73 canonicalization shape).
    *
    * Cost is linear where the pair form is quadratic: exact-dup groups
    * ride ONE window shuffle (gid = min id per identical vector),
    * banding runs on REPRESENTATIVES only (identical vectors band
    * identically — the collapse-tier argument at `cosineNearDupsExact`),
    * and components are computed over the rep graph (∝ reps + rep
    * pairs). No within-group or cross-group member-pair expansion ever
    * happens, so dup-group size k costs k rows, not C(k,2).
    *
    * Exactness: gid is exact (vector equality); rep pairs carry the
    * integer-rational predicate of the exact tier; components over the
    * rep graph equal components over the full member graph because each
    * member connects to its rep (identical vectors are near-dups at any
    * τ ≤ 1) and a member-level edge (a, b) exists iff the rep-level edge
    * (rep(a), rep(b)) does (the collapse equivalence). Zero vectors have
    * no cosine: they group by exact equality only (identical zero
    * vectors share a gid) and never cross-link. */
  def cosineNearDupGroups(vecs: DataFrame, idCol: String, vCol: String,
      tauNum: Long = 9, tauDen: Long = 10, bits: Int = 12,
      tables: Int = 48, dim: Int = -1): DataFrame = {
    import graft.functions.VectorFunctions
    val base = vecs.select(col(idCol).cast("long").as("id"),
      col(vCol).as("v"),
      VectorFunctions.dot(col(vCol), col(vCol)).as("n2"))
    // exact-dup groups by vector equality — hash-keyed map-side-combined
    // groupBy (r15; was a v-partitioned window that serialized a hot
    // vector — e.g. the zero embedding of 10⁹ empty crawl docs — into
    // one task). Zero/null vectors still GROUP (identical zeros share a
    // gid, per the contract above); they are excluded at the REP stage.
    val (withGid, gidScratch) = gidByContent(base, Seq("v"))
    val mem = withGid.select(col("id"), col("v"), col("n2"), col("gid"))
      .cp()
    graft.util.BlockRelease.release(gidScratch)
    val reps = mem.filter(col("id") === col("gid") && col("n2") > 0)
      .select(col("id"), col("v"), col("n2"))
    val repEdges = cosineRepEdgesGated(reps, tauNum, tauDen, bits,
      tables, dim)
    val out = groupsFromReps(mem,
      repEdges.select(col("id_a").as("src"), col("id_b").as("dst")))
    graft.util.BlockRelease.release(repEdges)
    out
  }

  /** Rep-edge stage of [[cosineNearDupGroups]] (r16): the same banding
    * + integer-rational verify as [[cosineNearDupsExact]]'s direct tier
    * (including its 2^53 exactness guard), but candidate+verify rides
    * [[gatedBucketEdges]] — the FAT verify-inside-join when the
    * signature buckets are dup-light (the measured oracle-regime shape;
    * its collapse probe is skipped outright: reps are distinct vectors
    * by construction), star+repair when they are near-dup-dense.
    * `base` must carry (id, v, n2) with n2 > 0. */
  private[graft] def cosineRepEdgesGated(base: DataFrame, tauNum: Long,
      tauDen: Long, bits: Int, tables: Int, dim: Int): DataFrame = {
    import graft.functions.VectorFunctions
    require(tauNum > 0 && tauDen > 0, "rational τ must be positive")
    val d = if (dim > 0) dim else base.select(size(col("v"))).first().getInt(0)
    val maxN2 = base.agg(coalesce(max(col("n2")), lit(0.0))).first()
      .getDouble(0)
    val tauSq = math.max(tauNum.toDouble * tauNum, tauDen.toDouble * tauDen)
    require(tauSq * maxN2 * maxN2 <= math.pow(2, 53),
      f"cosineNearDupGroups: max |v|² = $maxN2%.0f makes τ²·dot² exceed 2^53 — " +
      "the integer predicate would round; shorten documents or rescale vectors")
    def pred(dotC: Column, na2C: Column, nb2C: Column): Column =
      dotC > 0 &&
        lit(tauDen * tauDen) * dotC * dotC >= lit(tauNum * tauNum) * na2C * nb2C
    val allSigs = graft.functions.VectorExpressions
      .hyperplane_sigs(col("v"), d, "neardup", bits, tables)
    val banded = base.select(col("id"), col("v"), col("n2"),
        posexplode(allSigs).as(Seq("t", "s")))
      .repartition(col("t"), col("s"))
      .cp()
    val edges = gatedBucketEdges(banded, "id", Seq("t", "s"),
      "cosineNearDupGroups",
      pairComplete = () => banded.as("a").hint("merge")
        .join(banded.as("b").hint("merge"),
          col("a.t") === col("b.t") && col("a.s") === col("b.s") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          VectorFunctions.dot(col("a.v"), col("b.v")).as("dot"),
          col("a.n2").as("na2"), col("b.n2").as("nb2"))
        .filter(pred(col("dot"), col("na2"), col("nb2")))
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"))
        .cp(),
      // carried verify (r16 second round): the banded frame already
      // ships (v, n2) per row — the pair-complete FAT join reads them
      // in place — so the star machinery carries them too and verifies
      // with ZERO join-backs. The measured probe tax this removes: the
      // sampled probe's ~19k candidates paid two corpus-shaped merge
      // joins against `base` on every q110 run whose density trips and
      // then falls back (sf0.1: fail rate 0.931 — the decision itself
      // is unchanged, it just costs two fewer corpus sorts to reach).
      verify = c => c.select(col("id_a"), col("id_b"),
        pred(VectorFunctions.dot(col("v_a"), col("v_b")),
          col("n2_a"), col("n2_b")).as("_pass")),
      "id_a", "id_b",
      carryCols = Seq("v", "n2"),
      // a center row now ships a d-float vector: scale the join-back's
      // broadcast ROW bound down by the width ratio vs a narrow row
      carryWeight = math.max(1L, d / 3L))
    graft.util.BlockRelease.release(banded)
    edges
  }

  /** Shared exact-dup gid stage of the `*NearDupGroups` family (r15 —
    * the r14 verdict's one weak mark): gid = min member id per exact
    * content group, computed WITHOUT a content-partitioned window.
    *
    * A `min(id).over(Window.partitionBy(<content>))` is a full shuffle
    * with NO map-side combine in which every member of a group lands in
    * ONE task — exactly backwards for this family's advertised regime
    * (high dup multiplicity: a crawl corpus's empty/boilerplate content
    * appears 10⁶–10⁹ times, and for the text kernels the shuffle key was
    * the FULL text/shingle array). Here instead: a 128-bit content hash
    * (two independently-seeded xxhash64s — collision is a raised error,
    * not a correctness risk) keys a `groupBy.agg(min(id))`, whose
    * map-side partial aggregation collapses hot groups to one row per
    * map task BEFORE the shuffle, followed by a join-back on the two
    * hash longs: SizeGate-broadcast when the distinct-content side is
    * small (every registered corpus); otherwise a HEAVY-HITTER-SPLIT
    * shuffle join (below).
    *
    * The join-back CANNOT lean on AQE for its hot keys — r15 MEASURED
    * NEGATIVE RESULT, two layers deep (mixed-regime scale cell,
    * SCALE_CELLS_r15: distinct side too big to broadcast AND one hot
    * content key). (1) A "fused" cut left the aggregate un-materialized
    * and the join un-hinted, saving ~3 driver jobs per call
    * (PlanMetrics: q110 35→26 jobs) — but OptimizeSkewedJoin only
    * matches a join whose children are both bare shuffle stages, and
    * the fused build side has the final aggregate BETWEEN its shuffle
    * and the join, so the hot probe partition never split. (2) With
    * the aggregate re-materialized (both exchanges bare and
    * skew-eligible), the split STILL never fired: skew detection is
    * COMPRESSED-BYTE-based, and a hot group is by definition millions
    * of IDENTICAL rows — LZ4 flattens the hot partition below its
    * neighbors, and AQE *coalesced* it with them instead (final plan:
    * "AQEShuffleRead coalesced", max-task read 1.7× the hot group). At
    * 10⁹-row boilerplate the task still decompresses and sort-buffers
    * 10⁹ rows; byte-blind detection can never see it.
    *
    * So boundedness is built BY CONSTRUCTION instead: the aggregate
    * carries the per-key member count anyway, and keys with count ≥
    * [[HotKeyRows]] go to a BROADCAST join (there are at most
    * nDocs/HotKeyRows such keys — a frame bounded by construction, and
    * the hot rows then never shuffle at all, staying spread across
    * their input partitions) while the remaining keys take the plain
    * shuffle join, which then has no key above HotKeyRows and no
    * dominant partition. The two branches are disjoint and complete
    * (every probe key is in the aggregate of the probe itself), and
    * the explicit SizeGate count picks the small-side broadcast from an
    * EXACT cardinality rather than AQE's byte threshold (10 MB —
    * marginal exactly where gids is distinct-sized) or
    * localCheckpoint's under-estimating stats (the banding broadcast
    * hazard, r9). The ~0.3–0.5 s/call of extra jobs at sf0.1 is fixed,
    * scale-independent, and amortizes to zero at cluster data sizes.
    *
    * Hash-group purity is GUARDED, not assumed: the aggregate carries
    * min/max of a THIRD independently-seeded hash (8 B each — the first
    * cut carried min/max of the full content struct, which doubled the
    * agg's content bytes and cost the text kernels 25–55% at sf0.1,
    * ABBA-measured), and the projected gid RAISES whenever a grouping
    * collision is observable in it. Distinct contents silently merge
    * only if all three 64-bit hashes collide at once (≤ 2⁻⁶⁴ on top of
    * the 2⁻¹²⁸ grouping event — below any hardware-error floor), every
    * other collision is a loud error, never a silent false merge. Null
    * content hashes to a constant, so null groups stay grouped together
    * — the window's null semantics.
    *
    * @param frame must carry a long `id` column plus `contentCols`
    * FIXED-JOB-COUNT TRIM (r16, verdict item 4 — the measured ~3 extra
    * driver jobs/call at sf0.1 were the price of the r15 design): the
    * checkpoints here are LAZY (`localCheckpoint(eager = false)`), so
    * the materializing job IS the SizeGate probe — one agg action
    * computes the aggregate, persists its blocks (and the keyed frame's,
    * when requested) and returns (rows, hot-key rows) folded into a
    * single row, replacing the r15 sequence of eager-checkpoint job +
    * count job + (big branch) hot-count job. When the caller already
    * knows its corpus row count (`knownRows` — every collapse-tier
    * kernel just probed it) and that bound is under the SizeGate, even
    * the folded agg is skipped: gids ≤ corpus rows by construction, so
    * the broadcast decision needs no count at all and the broadcast
    * build job doubles as the checkpoint materialization.
    *
    * @param checkpointKeyed materialize the hashed frame once so the
    *          aggregate AND the join-back probe side share it — pass
    *          true when the upstream projection is expensive to
    *          recompute (q110's interpreted md5Embed ran twice without
    *          it, measured +0.9 s at sf0.1); false when the upstream is
    *          already cached (the text kernels' shingle cache) or a
    *          plain column-pruned scan
    * @param knownRows an upper bound on `frame`'s row count when the
    *          caller has one lying around (−1 = unknown); under the
    *          SizeGate bound it eliminates the probe job entirely
    * @return (frame + `gid` column with the hash keys dropped,
    *          checkpointed scratch frames — caller releases them once
    *          its consumer is checkpointed) */
  private[graft] def gidByContent(frame: DataFrame,
      contentCols: Seq[String],
      checkpointKeyed: Boolean = true,
      knownRows: Long = -1L): (DataFrame, Seq[DataFrame]) = {
    val cs = contentCols.map(col)
    // xxhash64 SKIPS null inputs (a null column leaves the running hash
    // untouched), so for same-typed multi-column content (A, null) and
    // (null, A) would collide in ALL three seeded hashes — a structural
    // silent merge, not a random collision. A per-column null-pattern
    // signature (booleans are never null, never skipped) restores the
    // window's null semantics: the null LAYOUT is part of the key, and
    // all-null content still hashes to one constant group.
    val nullSig = cs.map(_.isNull)
    val hin = cs ++ nullSig
    val keyed0 = frame
      .withColumn("_gh1", xxhash64(hin: _*))
      .withColumn("_gh2", xxhash64(lit(0x9E3779B97F4A7C15L) +: hin: _*))
      .withColumn("_gh3", xxhash64(lit(0xC2B2AE3D27D4EB4FL) +: hin: _*))
    // LAZY checkpoints: the first downstream action (the folded probe
    // agg, or the broadcast build in the knownRows fast path) is the
    // job that materializes them — see the job-count-trim scaladoc
    val keyed = if (checkpointKeyed) keyed0.cp(false) else keyed0
    val gids = keyed.groupBy(col("_gh1"), col("_gh2"))
      .agg(min(col("id")).as("_gmin"), count(lit(1)).as("_gcnt"),
        min(col("_gh3")).as("_p1"), max(col("_gh3")).as("_p2"))
      .select(col("_gh1"), col("_gh2"), col("_gcnt"),
        when(col("_p1") <=> col("_p2"), col("_gmin"))
          .otherwise(raise_error(lit(
            "graft.dedup.gidByContent: 128-bit content-hash collision — " +
            "distinct contents share (xxhash64, xxhash64-seeded); " +
            "re-key or widen the hash")).cast("long"))
          .as("gid"))
      .cp(false)
    val joined =
      if (0L <= knownRows && knownRows < graft.util.SizeGate.DefaultRows)
        // gids ≤ knownRows < bound by construction: broadcast with no
        // probe job at all
        keyed.join(
          org.apache.spark.sql.functions.broadcast(gids.drop("_gcnt")),
          Seq("_gh1", "_gh2"))
      else
        joinBackBounded(keyed, gids, Seq("_gh1", "_gh2"), "_gcnt",
          counts = Some(buildCounts(gids, "_gcnt")))
    val out = joined.drop("_gh1", "_gh2", "_gh3")
    (out, if (checkpointKeyed) Seq(keyed, gids) else Seq(gids))
  }

  /** ONE-action (rows, hot-key rows) probe over a checkpointed build
    * frame — the folded form of [[joinBackBounded]]'s two counts (r16
    * verdict item 4). Also the job that materializes a LAZY checkpoint
    * of `build`. */
  private[graft] def buildCounts(build: DataFrame,
      cntCol: String): (Long, Long) = {
    val r = build.agg(count(lit(1)),
      coalesce(sum(when(col(cntCol) >= HotKeyRows, 1L).otherwise(0L)),
        lit(0L))).first()
    (r.getLong(0), r.getLong(1))
  }

  /** Hot-key bound for [[joinBackBounded]]: a join key carried by at
    * least this many probe rows is routed through the broadcast branch.
    * Tunable via the `graft.hotkey.rows` system property, then
    * SPARK_GRAFT_HOTKEY_ROWS; default 65536 — at most nDocs/65536 keys
    * can be hot, so the broadcast side is bounded by construction. */
  private[graft] def HotKeyRows: Long = graft.util.SizeGate
    .parsedPositiveLong("graft.hotkey.rows", "SPARK_GRAFT_HOTKEY_ROWS",
      65536L)

  /** Probe ⋈ build (inner, on `keyCols`) where `build` is CHECKPOINTED,
    * covers every probe key, and carries `cntCol` = the probe-side row
    * count of that key. Small builds broadcast whole (SizeGate). Big
    * builds split by heavy hitter: keys with cnt ≥ [[HotKeyRows]] join
    * map-side from a by-construction-bounded broadcast — hot rows never
    * shuffle, staying spread across their input partitions — and the
    * rest take the shuffle join, which then has no dominant key. The
    * split exists because AQE cannot save the single-join plan in the
    * hot-key regime (see [[gidByContent]]'s negative result: the skew
    * detector is compressed-byte-based and identical rows compress to
    * nothing). `cntCol` is dropped from the output. If the hot side
    * itself exceeds the SizeGate bound (degenerate: > bound keys each
    * over HotKeyRows — a corpus of > bound×HotKeyRows rows all in huge
    * groups), falls back to the un-hinted single join rather than an
    * unbounded broadcast, and says so loudly. Set `dropCnt = false`
    * when the count column IS the payload (group sizes). Pass `counts`
    * = (build rows, hot-key rows) when the caller already probed them
    * (one [[buildCounts]] action) — the r16 job-count trim. */
  private[graft] def joinBackBounded(probe: DataFrame, build: DataFrame,
      keyCols: Seq[String], cntCol: String,
      dropCnt: Boolean = true,
      counts: Option[(Long, Long)] = None,
      rowWeight: Long = 1): DataFrame = {
    def trim(df: DataFrame) = if (dropCnt) df.drop(cntCol) else df
    // rowWeight: approximate width of a build row relative to the
    // narrow (key + long) rows the SizeGate default was tuned for —
    // callers whose build side carries arrays (the embedding kernel's
    // per-bucket center vector) scale the ROW bound down so the BYTE
    // size of a broadcast stays what the gate meant to bound
    val bound = math.max(1L,
      graft.util.SizeGate.DefaultRows / math.max(1L, rowWeight))
    val n = counts.map(_._1).getOrElse(build.count())
    if (n < bound)
      return probe.join(
        org.apache.spark.sql.functions.broadcast(trim(build)), keyCols)
    val hot = trim(build.filter(col(cntCol) >= HotKeyRows))
    val nHot = counts.map(_._2).getOrElse(hot.count())
    if (nHot >= bound) {
      System.err.println(
        s"graft.dedup.joinBackBounded: $nHot hot keys (>= $bound) — " +
        "broadcast branch would be unbounded; falling back to one " +
        "un-hinted shuffle join. Raise graft.hotkey.rows or " +
        "graft.sizegate.rows for this corpus.")
      return probe.join(trim(build), keyCols)
    }
    val rest = trim(build.filter(col(cntCol) < HotKeyRows))
    val hotB = org.apache.spark.sql.functions.broadcast(hot)
    val hotJoined = probe.join(hotB, keyCols)
    // the rest branch's PROBE must lose the hot rows BEFORE its
    // exchange — an inner join would only discard them after the
    // shuffle, re-forming the exact hot partition this split exists to
    // prevent (cell-measured: max-task read unchanged without this
    // anti filter). Broadcast anti join = map-side, no shuffle.
    val restProbe = probe.join(hotB, keyCols, "left_anti")
    val restJoined = restProbe.join(rest, keyCols)
    hotJoined.unionByName(restJoined)
  }

  /** Density gate for the group forms' star verify (r16 verdict item 1):
    * the bucket-pair candidate+verify switches from the pair-complete
    * self-join to the star+repair formulation when the projected
    * candidate count Σ C(|bucket|,2) exceeds this factor × banded rows.
    * Tunable via `graft.stardedup.factor` / SPARK_GRAFT_STAR_FACTOR;
    * 0 forces the star path whenever any bucket has ≥ 2 members (the
    * spec's forcing knob). Default 12 (raised from the first cut's 8 —
    * bench-measured): below it the pair-complete work is bounded-
    * comparable to the star's own probe machinery, so the plan keeps
    * the measured pair-complete shape; q114's sf0.1 density sits at 9.5
    * and paid ~1.5× pure probe tax at factor 8, while the boilerplate
    * target regime (the mixed-regime cell) projects ~31 and the q110
    * collision regime ~73 — both still gate through the sampled
    * fail-rate probe. */
  private[graft] def StarGateFactor: Double =
    nonNegDoubleKnob("graft.stardedup.factor", "SPARK_GRAFT_STAR_FACTOR",
      12.0)

  /** Repair bound for the star verify (see the adaptive-fallback note in
    * [[gatedBucketEdges]]): round 2 runs only when its exact candidate
    * projection is at most this fraction of the pair-complete
    * projection; above it the helper falls back to pair-complete.
    * Default 0.10 — the measured fail-heavy regimes sit at 0.25 (q110)
    * and 0.92 (q114) while the boilerplate target regime is ~0.0x.
    * Tunable via `graft.stardedup.repair` / SPARK_GRAFT_STAR_REPAIR
    * (specs force it high to pin the repair round end-to-end). */
  private[graft] def StarRepairFraction: Double =
    nonNegDoubleKnob("graft.stardedup.repair", "SPARK_GRAFT_STAR_REPAIR",
      0.10)

  /** Repair bound for CHEAP-verify callers of [[gatedBucketEdges]] —
    * those whose verify reads only carried columns (simhash: two longs
    * already on the banded frame), so a star/repair candidate costs the
    * same as a pair-complete candidate (no content/embedding join-back,
    * the asymmetry the 0.10 default prices in). The star then wins
    * whenever its candidate count is meaningfully SMALLER than
    * pair-complete; 0.7 keeps headroom for the star's fixed extra
    * stages and the probe's sampling noise. Measured on the simband
    * cell (SCALE_CELLS_r16.txt): fail rate 0.265 projects repair at
    * 0.53× pair-complete — inside this bound, where the generic 0.10
    * (correct for join-back verifies) had to fall back. Tunable via
    * `graft.stardedup.repair.cheap` / SPARK_GRAFT_STAR_REPAIR_CHEAP. */
  private[graft] def StarRepairCheapFraction: Double =
    nonNegDoubleKnob("graft.stardedup.repair.cheap",
      "SPARK_GRAFT_STAR_REPAIR_CHEAP", 0.7)

  private def nonNegDoubleKnob(prop: String, env: String,
      default: Double): Double = {
    val raw = sys.props.get(prop).map((s"system property $prop", _))
      .orElse(sys.env.get(env).map((s"env $env", _)))
    raw.fold(default) { case (src, s) =>
      val v = scala.util.Try(s.trim.toDouble).getOrElse(
        throw new IllegalArgumentException(
          s"graft: $src = '$s' is not a double"))
      require(v >= 0, s"graft: $src = $v must be >= 0")
      v
    }
  }

  /** Rep-bucket density-gated candidate generation + exact verify for
    * the `*NearDupGroups` family (r16 — the r15 verdict's one weak
    * mark): the group forms' output needs CONNECTIVITY, not the
    * pair-complete candidate set, yet every rep-bucket self-join paid
    * C(|bucket|,2) verify candidates — 209M candidates / 498 s at
    * ~85-member near-dup-dense rep groups on the r15 mixed-regime cell
    * (templated boilerplate whose members differ by a suffix: exact-dup
    * collapse can't touch them, and every bucket pair verifies).
    *
    * STAR + REPAIR, exact by construction: per bucket B with center
    * c = min(B), round 1 tries the |B|−1 star pairs (c, m); round 2
    * tries {f, m} ⊆ B for every member f whose OWN star edge (c, f)
    * failed verify (minus already-tried pairs). Any untried pair (a, b)
    * of B has both (c, a) and (c, b) verified PASS, so a–c–b already
    * connects them: components over tried-and-passed edges equal
    * components over the full verified bucket-pair graph (DedupSpec
    * pins this against a union-find over the pair form, including a
    * crafted chain where the repair round is load-bearing). Candidate
    * count: Σ(|B|−1) + Σ|failed(B)|·(|B|−1) — LINEAR in banded rows
    * when verify mostly passes (the templated-text regime this exists
    * for), and bounded by star + pair-complete when it mostly fails.
    *
    * The gate (one agg over the bucket sizes, whose action also
    * materializes the lazily-checkpointed centers frame and carries the
    * join-back's (rows, hot-keys) probe) keeps the measured
    * pair-complete plan when projected candidates ≤ [[StarGateFactor]]
    * × banded rows — the dup-light oracle regime — so the registered
    * queries' plan shape is unchanged there. When it trips, it says so
    * loudly with the projected density (the r15 verdict's
    * rep-bucket-density guard) and engages the star path, whose only
    * hot-key-shaped shuffle (center attach on the bucket key — a hot
    * BUCKET is exactly the gid stage's hot-group shape) rides
    * [[joinBackBounded]]'s heavy-hitter discipline.
    *
    * Cheap-verify callers (r16 second round, measured in on the simband
    * cell): when `carryCols` names per-member columns of `banded0` that
    * the verify reads (simhash: the two fingerprint longs; the embedding
    * kernel: the vector + norm the banded frame already ships for the
    * FAT pair-complete join), every candidate frame fed to `verify`
    * carries them inline as `<c>_a`/`<c>_b` — no join-back — and the
    * repair bound relaxes to [[StarRepairCheapFraction]] because the
    * per-candidate cost asymmetry the 0.10 default prices in
    * (content/embedding join-back vs the pair-complete join's inline
    * verify) is gone. Callers carrying WIDE columns also pass
    * `carryWeight` (approximate row-width multiple of a narrow row) so
    * the center join-back's broadcast row bound scales down to keep its
    * BYTE size what the gate meant to bound. The text kernels
    * (minhash/jaccard/shingle-cosine) keep the join-back verify: their
    * verify reads shingle ARRAYS whose carriage through banding would
    * multiply the banded frame's bytes by the band count.
    *
    * @param banded0 one row per (member, bucket); extra columns pruned
    *          except `carryCols`
    * @param pairComplete today's full formulation — must return the
    *          verified edges (la, lb), checkpointed
    * @param verify candidates (la, lb) → same rows + boolean `_pass`
    *          (a pure function of the pair — bucket-independent); with
    *          `carryCols` the input also has `<c>_a`/`<c>_b` per carry
    * @param carryCols columns of `banded0`, constant per member id,
    *          carried inline into every candidate frame
    * @return verified edges (la, lb), checkpointed; scratch released */
  private[graft] def gatedBucketEdges(banded0: DataFrame, idCol: String,
      keyCols: Seq[String], caller: String,
      pairComplete: () => DataFrame,
      verify: DataFrame => DataFrame,
      la: String, lb: String,
      carryCols: Seq[String] = Nil,
      carryWeight: Long = 1): DataFrame = {
    val banded = banded0.select((idCol +: keyCols ++: carryCols).map(col): _*)
    // carried star-pair emission: the center's carry values ride the
    // centers frame as one struct (min_by pairs them with the min id)
    def carryA(ctrv: Column): Seq[Column] =
      carryCols.map(c => ctrv.getField(c).as(s"${c}_a"))
    def carryB: Seq[Column] = carryCols.map(c => col(c).as(s"${c}_b"))
    val centers = banded.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("_ctr"), count(lit(1)).as("_bc"))
      .cp(false) // lazy: the gate agg materializes it
    // WIDTH-AWARE repair bound (measured on the embband cell,
    // SCALE_CELLS_r16.txt): carried candidates verify inline, but the
    // repair round still MATERIALIZES them — distinct + anti-join +
    // checkpoint — and a wide carry multiplies that cost by the row
    // width. At carryWeight 5 (16-double vectors ×2 per candidate) a
    // repair of 0.29× pair-complete lost 3.2× to the inline FAT join
    // (24.2M wide rows ≈ 6.8 GB through the distinct), while narrow
    // carries (simhash, weight 1) keep the full 0.7 headroom that the
    // simband maxDist=15 cell validated. Dividing the cheap bound by
    // the declared width prices the materialization back in.
    val repairBound =
      if (carryCols.nonEmpty)
        StarRepairCheapFraction / math.max(1L, carryWeight)
      else StarRepairFraction
    val prof = centers.agg(
      coalesce(sum(col("_bc").cast("double") *
        (col("_bc") - 1).cast("double") / 2), lit(0.0)),
      coalesce(sum(col("_bc")), lit(0L)),
      count(lit(1)),
      coalesce(sum(when(col("_bc") >= HotKeyRows, 1L).otherwise(0L)),
        lit(0L)),
      coalesce(sum((col("_bc") - 1).cast("double") *
        (col("_bc") - 1).cast("double")), lit(0.0))).first()
    val (cand2, rows, nBuckets, nHot) =
      (prof.getDouble(0), prof.getLong(1), prof.getLong(2), prof.getLong(3))
    val sumSq = prof.getDouble(4) // Σ(|B|−1)² — the repair-rate scaler
    if (cand2 <= StarGateFactor * math.max(rows, 1L)) {
      graft.util.BlockRelease.release(centers)
      pairComplete()
    } else {
      System.err.println(
        f"graft.dedup.$caller: rep-bucket density projects $cand2%,.0f " +
        f"pair-complete verify candidates over $rows%,d banded rows " +
        f"($nBuckets%,d buckets) — star verify engaged " +
        f"(gate factor ${StarGateFactor}%.1f, graft.stardedup.factor)")
      // carry-bearing centers, STAR PATH ONLY: the gate agg above runs
      // on every call, so the common dup-light path must not ship a
      // carried vector per bucket through its shuffle — the wide agg
      // (one more scan of the checkpointed banded frame, map-side
      // combined to bucket-count rows) is paid only past the gate,
      // where it replaces per-candidate join-backs that dwarf it
      val centersW =
        if (carryCols.isEmpty) centers
        else banded.groupBy(keyCols.map(col): _*)
          .agg(min(col(idCol)).as("_ctr"), count(lit(1)).as("_bc"),
            min_by(struct(carryCols.map(col): _*), col(idCol))
              .as("_ctrv"))
          .cp()
      // SAMPLED FAIL-RATE PRE-PROBE (r16 second cut): before paying the
      // full round 1 (q110's corpus: a ~13 s star attempt that then
      // falls back), verify the star pairs of a deterministic
      // bucket-hash sample (~20k candidates) and extrapolate the repair
      // projection as f̂ · Σ(|B|−1)². Fail-heavy regimes (collision
      // buckets, not boilerplate) bail here for the cost of one small
      // verify; the EXACT post-round-1 bound below remains the backstop
      // for marginal estimates. Skipped when the star is already
      // sample-sized (k = 1).
      val starBound = math.max(rows - nBuckets, 1L) // = Σ(|B|−1) ≥ |r1|
      val kSamp = math.ceil(starBound / 20000.0).toLong
      if (kSamp >= 2) {
        val bHash =
          pmod(xxhash64(keyCols.map(col): _*), lit(kSamp)) === 0
        val cS = centersW.filter(bHash)
        val r1S = banded.filter(bHash).join(cS, keyCols)
          .filter(col(idCol) =!= col("_ctr"))
          .select(col("_ctr").as(la) +: col(idCol).as(lb) +:
            (carryA(col("_ctrv")) ++ carryB): _*)
          .distinct()
          .cp()
        val vs = verify(r1S).agg(count(lit(1)),
          coalesce(sum(when(!col("_pass"), 1L).otherwise(0L)), lit(0L)))
          .first()
        graft.util.BlockRelease.release(r1S)
        val (nS, fS) = (vs.getLong(0), vs.getLong(1))
        val fHat = if (nS == 0) 0.0 else fS.toDouble / nS
        if (fHat * sumSq > repairBound * cand2) {
          System.err.println(
            f"graft.dedup.$caller: sampled star probe ($nS%,d pairs, " +
            f"fail rate $fHat%.3f) projects repair ~${fHat * sumSq}%,.0f " +
            f"of $cand2%,.0f pair-complete (bound " +
            f"${repairBound}%.2f) — falling back to pair-complete")
          graft.util.BlockRelease.release(
            if (carryCols.isEmpty) Seq(centers) else Seq(centers, centersW))
          return pairComplete()
        }
      }
      // center attach: the bucket key is hot exactly when a bucket is
      // near-dup-dense, so the attach follows the heavy-hitter split
      val withCtr = joinBackBounded(banded, centersW, keyCols, "_bc",
          counts = Some((nBuckets, nHot)), rowWeight = carryWeight)
        .cp()
      // round 1: the star — center × other members per bucket; the
      // center is the bucket min so pairs are already (lo, hi)
      val r1 = withCtr.filter(col(idCol) =!= col("_ctr"))
        .select(col("_ctr").as(la) +: col(idCol).as(lb) +:
          (carryA(col("_ctrv")) ++ carryB): _*)
        .distinct()
        .cp()
      val v1 = verify(r1).cp()
      graft.util.BlockRelease.release(r1)
      // round 2 (the repair): members whose OWN star edge failed re-pair
      // against their whole bucket — per BUCKET, not globally (a member
      // may pass in one bucket and fail in another)
      val fails1 = v1.filter(!col("_pass"))
        .select(col(la).as("_fctr"), col(lb).as("_fid"))
      val failedRows = withCtr.as("w").join(fails1.as("f"),
          col(s"w.$idCol") === col("f._fid") &&
            col("w._ctr") === col("f._fctr"))
        .select((idCol +: keyCols ++: carryCols).map(c => col(s"w.$c")): _*)
        .cp()
      // ADAPTIVE REPAIR BOUND (r16 second cut — MEASURED on the sf0.1
      // bench): density alone does not decide the star's win. q110's
      // corpus is genuinely near-dup-dense but verify-FAIL-heavy (34.8M
      // projected candidates, repair projection 8.6M — bucket
      // collisions, not boilerplate), and there the pair-complete FAT
      // join verifies INLINE while the star must materialize + join
      // content onto every repair candidate: measured 11.4 s → 63 s.
      // q114's repair projection was 172k of 188k projected (0.92) —
      // pure loss. The star's win regime is verify-PASS-heavy buckets
      // (templated boilerplate: repair ≈ 0), so after the LINEAR round
      // 1 the exact repair projection Σ_B fails(B)·(|B|−1) gates round
      // 2: above `repairBound` × pair-complete ([[StarRepairFraction]],
      // or [[StarRepairCheapFraction]] for carried-column verifies whose
      // per-candidate cost matches pair-complete's) the helper falls
      // back to the pair-complete formulation, having spent only the
      // linear star work to find out.
      // narrow centers suffice here — the projection reads only _bc
      val projRepair = joinBackBounded(failedRows, centers, keyCols,
          "_bc", dropCnt = false, counts = Some((nBuckets, nHot)))
        .agg(coalesce(sum(col("_bc") - 1), lit(0L))).first().getLong(0)
      if (projRepair > repairBound * cand2) {
        System.err.println(
          f"graft.dedup.$caller: star round 1 found a FAIL-heavy regime " +
          f"(repair projection $projRepair%,d of $cand2%,.0f " +
          f"pair-complete, bound ${repairBound}%.2f via " +
          f"graft.stardedup.repair) — falling back to pair-complete")
        graft.util.BlockRelease.release(
          (if (carryCols.isEmpty) Nil else Seq(centersW)) ++
            Seq(centers, withCtr, v1, failedRows))
        return pairComplete()
      }
      val fLtM = col(s"f.$idCol") < col(s"m.$idCol")
      val r2 = failedRows.as("f").hint("merge")
        .join(banded.as("m").hint("merge"),
          keyCols.map(c => col(s"f.$c") === col(s"m.$c")).reduce(_ && _) &&
            col(s"f.$idCol") =!= col(s"m.$idCol"))
        .select(least(col(s"f.$idCol"), col(s"m.$idCol")).as(la) +:
          greatest(col(s"f.$idCol"), col(s"m.$idCol")).as(lb) +:
          (carryCols.map(c =>
            when(fLtM, col(s"f.$c")).otherwise(col(s"m.$c")).as(s"${c}_a")) ++
           carryCols.map(c =>
            when(fLtM, col(s"m.$c")).otherwise(col(s"f.$c")).as(s"${c}_b"))): _*)
        .distinct()
        // already-tried star pairs never re-verify; merge-hinted — v1 is
        // checkpoint-stat-underestimated (the banding broadcast hazard)
        .hint("merge")
        .join(v1.select(col(la), col(lb)).hint("merge"),
          Seq(la, lb), "left_anti")
        .cp()
      val v2 = verify(r2).cp()
      val out = v1.filter(col("_pass")).select(col(la), col(lb))
        .unionByName(v2.filter(col("_pass")).select(col(la), col(lb)))
        .cp()
      // observability for the cells: actual candidate work vs projected
      System.err.println(
        f"graft.dedup.$caller: star verify tried ${v1.count()}%,d star " +
        f"+ ${v2.count()}%,d repair candidates " +
        f"(projected pair-complete: $cand2%,.0f)")
      graft.util.BlockRelease.release(
        (if (carryCols.isEmpty) Nil else Seq(centersW)) ++
          Seq(centers, withCtr, v1, failedRows, r2, v2))
      out
    }
  }

  /** Shared tail of the `*NearDupGroups` family (factored r14 when the
    * q110 pattern was extended to the text kernels): components over the
    * REP graph, canonical = component-min member id, every member
    * attached via its exact-dup gid, group sizes by a hash-keyed
    * `groupBy.count` + join-back (r15: was a canon_id-partitioned window
    * count — same degenerate-hot-group shape as the gid stage; the
    * groupBy's map-side combine bounds per-task input for a giant canon
    * group where the window serialized it into one task). Both
    * join-backs here (canon attach, size attach) follow
    * [[joinBackBounded]]'s heavy-hitter discipline — a giant group is a
    * hot probe key in each, and the r15 negative result applies
    * verbatim.
    * `mem` must carry (id, gid) with gid = min member id of the doc's
    * exact-dup group (so the component-min NODE id IS the component-min
    * member id); `repEdges` the verified near-dup edges between reps as
    * (src, dst). Releases `mem`; returns a checkpointed frame. */
  private[graft] def groupsFromReps(mem: DataFrame,
      repEdges: DataFrame): DataFrame = {
    // rep-graph components; SPARK_GRAFT_COLLECT_THRESHOLD=0 forces the
    // distributed Pregel tier (the q40-q49 discipline) — the rep graph
    // is dup-collapsed but still corpus-shaped in the dup-free worst case
    val comp = graft.graph.GraphAlgos.connectedComponents(repEdges,
      collectThreshold = sys.env.get("SPARK_GRAFT_COLLECT_THRESHOLD")
        .map(_.toLong).getOrElse(2000000L))
    // normalize component labels to the component's MIN member id (the
    // union-find root choice is arbitrary; min-id is the canonical form
    // every oracle replays)
    // canon is rep-graph-sized (dup-collapsed, corpus-shaped only in
    // the dup-free worst case): checkpointed, and attached through the
    // same bounded join-back discipline as the gid stage — a giant
    // exact-dup group is a hot `gid` on the PROBE side here, and the
    // r15 negative result (gidByContent's scaladoc) showed AQE cannot
    // split that partition. Small canon broadcasts whole; a big canon
    // is first completed to cover EVERY gid with its member count
    // (one map-side-combined agg over mem, only in this rare branch),
    // then heavy-hitter-split.
    val canon = comp.join(
        comp.groupBy(col("label")).agg(min(col("node")).as("canon")),
        "label")
      .select(col("node").as("gid"), col("canon"))
      .cp(false) // lazy: the branch count materializes it
    val probe = mem.select(col("id").as("doc_id"), col("gid"))
    val (joined, canonScratch) =
      if (canon.count() < graft.util.SizeGate.DefaultRows)
        (probe.join(
          org.apache.spark.sql.functions.broadcast(canon), Seq("gid"),
          "left"), Nil)
      else {
        val canonFull = probe.groupBy(col("gid"))
          .agg(count(lit(1)).as("_mcnt"))
          .join(canon, Seq("gid"), "left")
          .cp(false) // lazy: buildCounts materializes it
        (joinBackBounded(probe, canonFull, Seq("gid"), "_mcnt",
          counts = Some(buildCounts(canonFull, "_mcnt"))),
          Seq(canonFull))
      }
    val out = joined
      // isolated reps (no near-dup edge) and pair-ineligible groups
      // (zero vectors, empty shingle sets) keep their gid as canonical
      .select(col("doc_id"),
        coalesce(col("canon"), col("gid")).as("canon_id"))
      .cp()
    // group sizes: map-side-combined groupBy + bounded join-back on the
    // long canon key, never a canon-partitioned window (a giant canon
    // group must not serialize one task — the gidByContent argument);
    // group_size doubles as the heavy-hitter count, so the hot branch
    // is free here
    val sizes = out.groupBy(col("canon_id"))
      .agg(count(lit(1)).as("group_size"))
      .cp(false) // lazy: buildCounts materializes it
    val sized = joinBackBounded(out, sizes, Seq("canon_id"),
        "group_size", dropCnt = false,
        counts = Some(buildCounts(sizes, "group_size")))
      .select(col("doc_id"), col("canon_id"), col("group_size"))
      .cp()
    graft.util.BlockRelease.release(Seq(mem, out, canon, sizes) ++
      canonScratch)
    sized
  }

  /** COMPACT GROUP form of [[minhashNearDups]] — the q110 escape hatch
    * ([[cosineNearDupGroups]]) applied to the MinHash-LSH text kernel
    * (r13 verdict item 2: the measured crossover on the embedding family
    * — pair form right through dup multiplicity ~10, group form 10×
    * cheaper by 30 — applies verbatim to the text family, whose crawl
    * corpora carry boilerplate dup groups in the hundreds). Emits
    * (doc_id, canon_id, group_size) where canon_id = min doc id of the
    * doc's connected component under the exact-Jaccard-≥ threshold
    * relation — i.e. the components of [[minhashNearDups]]'s own pair
    * output — at cost linear in dup-group members: exact-dup groups ride
    * ONE window shuffle (gid = min id per identical shingle list),
    * banding + verify run on REPRESENTATIVES only, components on the rep
    * graph, members attach via gid. No C(k,2) pair materialization
    * anywhere.
    *
    * Exactness: identical shingle lists have identical signatures and
    * Jaccard ≡ 1 ≥ threshold against each other (threshold ≤ 1
    * required), so member-level components equal rep-level components
    * with members attached (the collapse equivalence at
    * [[minhashNearDups]]); docs whose shingle set is EMPTY can never
    * pair (no postings, no signature) and stay singletons. Ids must be
    * numeric (component node ids). */
  def minhashNearDupGroups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 64, bands: Int = 16): DataFrame = {
    require(threshold <= 1.0,
      "group form needs threshold <= 1 (identical docs must be near-dups)")
    val sh = shingledHashes(docs, idCol, textCol)
      .select(col("doc_id").cast("long").as("id"), col("shingles"))
      .cache()
    // pair-ineligible docs (empty OR null shingle set — no postings, no
    // signature, so the pair form can never emit for them: singletons by
    // the components-of-pairs contract) are routed AROUND the gid stage
    // entirely (r15): the empty array is a crawl corpus's hottest
    // content key, and the old window computed over those rows only to
    // have its value discarded by the `when`.
    val ineligible = coalesce(size(col("shingles")) === 0, lit(true))
    val singletons = sh.filter(ineligible)
      .select(col("id"), col("shingles"), col("id").as("gid"))
    val (withGid, gidScratch) = gidByContent(sh.filter(!ineligible),
      Seq("shingles"), checkpointKeyed = false) // sh is cached above
    val mem = withGid.select(col("id"), col("shingles"), col("gid"))
      .unionByName(singletons)
      .cp()
    graft.util.BlockRelease.release(gidScratch)
    sh.unpersist(blocking = false)
    val reps = mem.filter(col("id") === col("gid") && size(col("shingles")) > 0)
      .select(col("id").as("doc_id"), col("shingles"))
    // density-gated star verify (r16): dup-light rep buckets keep the
    // pair-complete candidate self-join; near-dup-dense buckets (the
    // 209M-candidate mixed-regime cell) go star + repair
    val banded = minhashBanded(reps, k, bands)
    val edges = gatedBucketEdges(banded, "doc_id", Seq("band", "h"),
      "minhashNearDupGroups",
      pairComplete = () => {
        val cand = minhashBandedPairs(banded)
        val e = jaccardOfPairs(cand, reps)
          .filter(col("jaccard") >= threshold)
          .select(col("doc_a"), col("doc_b"))
          .cp()
        graft.util.BlockRelease.release(cand)
        e
      },
      // merge-hinted: reps is corpus-shaped with shingle ARRAYS and the
      // candidate frame's checkpoint stats under-estimate (the banding
      // broadcast hazard) — a mis-elected broadcast of the array side is
      // the r9 failure class
      verify = c => jaccardOfPairs(c.hint("merge"), reps.hint("merge"))
        .withColumn("_pass",
          coalesce(col("jaccard") >= threshold, lit(false))),
      "doc_a", "doc_b")
    val out = groupsFromReps(mem,
      edges.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    graft.util.BlockRelease.release(Seq(banded, edges))
    out
  }

  /** COMPACT GROUP form of [[ngramJaccardNearDups]] (same r14 extension,
    * same output contract as [[minhashNearDupGroups]] but with the exact
    * inverted-index kernel and per-`scopeCol` pairing): canon groups are
    * the connected components of the scoped exact-Jaccard pair relation;
    * edges never cross scopes, so neither do groups. Representatives =
    * one doc per distinct (scope, shingle list); the inverted-index
    * self-join runs on reps only, so dup-group size k costs k rows, not
    * the pair form's C(k,2) postings blow-up. */
  def jaccardNearDupGroups(docs: DataFrame, idCol: String, textCol: String,
      scopeCol: String, threshold: Double = 0.5, n: Int = 3): DataFrame = {
    require(threshold <= 1.0,
      "group form needs threshold <= 1 (identical docs must be near-dups)")
    val sh = shingledHashes(docs, idCol, textCol, n, keep = Seq(scopeCol))
      .select(col("doc_id").cast("long").as("id"), col(scopeCol),
        col("shingles"))
      .cache()
    // same r15 shape as [[minhashNearDupGroups]]: singletons (empty or
    // null shingle set) bypass the gid stage; eligible docs get a
    // hash-keyed map-side-combined gid over (scope, shingle list)
    val ineligible = coalesce(size(col("shingles")) === 0, lit(true))
    val singletons = sh.filter(ineligible)
      .select(col("id"), col(scopeCol), col("shingles"),
        col("id").as("gid"))
    val (withGid, gidScratch) = gidByContent(sh.filter(!ineligible),
      Seq(scopeCol, "shingles"), checkpointKeyed = false) // sh cached
    val mem = withGid
      .select(col("id"), col(scopeCol), col("shingles"), col("gid"))
      .unionByName(singletons)
      .cp()
    graft.util.BlockRelease.release(gidScratch)
    sh.unpersist(blocking = false)
    val reps = mem.filter(col("id") === col("gid") && size(col("shingles")) > 0)
      .select(col("id").as("doc_id"), col(scopeCol), col("shingles"))
    val ex = reps.select(col("doc_id"), col(scopeCol),
        size(col("shingles")).as("n"), explode(col("shingles")).as("s"))
      .repartition(col("s"))
      .cp()
    // density-gated star verify (r16): the posting buckets are the
    // (scope, shingle) lists; dup-light keeps the fused co-occurrence
    // self-join (inter by posting count ≡ |array_intersect| — the
    // shingle arrays are DISTINCT hash sets, so the star path's
    // jaccardOfPairs computes the identical value)
    val edges = gatedBucketEdges(ex, "doc_id", Seq(scopeCol, "s"),
      "jaccardNearDupGroups",
      pairComplete = () => ex.as("a").join(ex.as("b"),
          col("a.s") === col("b.s") &&
            col(s"a.$scopeCol") === col(s"b.$scopeCol") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"), max(col("a.n")).as("na"),
          max(col("b.n")).as("nb"))
        .filter(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")) >= threshold)
        .select(col("doc_a"), col("doc_b"))
        .cp(),
      // merge-hinted — the minhash form's broadcast-hazard argument
      verify = c => jaccardOfPairs(c.hint("merge"),
          reps.select(col("doc_id"), col("shingles")).hint("merge"))
        .withColumn("_pass",
          coalesce(col("jaccard") >= threshold, lit(false))),
      "doc_a", "doc_b")
    val out = groupsFromReps(mem,
      edges.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    graft.util.BlockRelease.release(Seq(ex, edges))
    out
  }

  /** Exact all-pairs twin of [[cosineNearDupsExact]] (same rational
    * predicate, O(n²)) — the ground-truth side of the q24 surface. */
  def cosineNearDupsBruteExact(vecs: DataFrame, idCol: String, vCol: String,
      tauNum: Long = 9, tauDen: Long = 10): DataFrame = {
    import graft.functions.VectorFunctions
    require(tauNum > 0 && tauDen > 0, "rational τ must be positive")
    val base = vecs.select(col(idCol).as("id"), col(vCol).as("v"),
        VectorFunctions.dot(col(vCol), col(vCol)).as("n2"))
      .filter(col("n2") > 0)
    base.as("a").join(base.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        VectorFunctions.dot(col("a.v"), col("b.v")).as("dot"),
        col("a.n2").as("na2"), col("b.n2").as("nb2"))
      .filter(col("dot") > 0 &&
        lit(tauDen * tauDen) * col("dot") * col("dot") >=
          lit(tauNum * tauNum) * col("na2") * col("nb2"))
  }

  /** Exact all-pairs twin of [[cosineNearDups]] — the spec-side ground
    * truth (O(n²); never the registered path at scale). */
  def cosineNearDupsBrute(vecs: DataFrame, idCol: String, vCol: String,
      tau: Double): DataFrame = {
    import graft.functions.VectorFunctions
    val n = vecs.select(col(idCol).as("id"),
      VectorFunctions.l2normalize(col(vCol)).as("nv"))
    n.as("a").join(n.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(VectorFunctions.dot(col("a.nv"), col("b.nv")), 4).as("sim"))
      .filter(col("sim") >= tau)
  }

  /** Benchmark DECONTAMINATION (the eval-leak scrub of a training corpus):
    * flag every non-benchmark document sharing at least one `n`-token
    * shingle with any benchmark document. Candidates from an equality
    * join on md5 shingle hashes — the inverted-index shape, shuffle ∝
    * shingles + matches, never corpus × benchmark; md5 keeps the counts
    * cross-engine exact (q66's oracle). Documents shorter than `n` tokens
    * can never be flagged. */
  def flagContaminated(docs: DataFrame, idCol: String, textCol: String,
      isBench: Column, n: Int = 8): DataFrame = {
    // one-pass kernel (r9): the HOF formulation re-split the text per
    // shingle index in interpreted context — the q98 cost class, caught
    // by q100's decade-up cell (q66 dominated the composed manifest at
    // 50k docs). Md5WordShingles emits DISTINCT grams, which the
    // countDistinct downstream makes semantics-neutral here.
    val withSh = docs.select(col(idCol).as("doc_id"), isBench.as("b"),
      explode(md5_word_shingles(col(textCol), n)).as("h"))
    val bench = withSh.filter(col("b")).select(col("h")).distinct()
    val corpus = withSh.filter(!col("b"))
    val hits = corpus.join(bench, "h")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_bench_shingles"))
    docs.select(col(idCol).as("doc_id"), isBench.as("b"))
      .filter(!col("b")).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bench_shingles"), lit(0L)).as("n_bench_shingles"),
        (coalesce(col("n_bench_shingles"), lit(0L)) > 0).as("contaminated"))
  }

  /** INCREMENTAL INGEST GATE (the production crawl-increment shape: a
    * NEW batch arrives, the existing corpus is already deduplicated —
    * dedup the batch AGAINST the store without ever re-pairing the store
    * with itself). Two exact tiers, no LSH recall concerns:
    * exact tier = whitespace-normalized md5 signature semi-join
    * (batch ∩ corpus signatures); near tier = distinct 8-gram overlap
    * via the inverted-index equality join (r12: the corpus side is
    * SCANNED map-only against broadcast batch key sets, never shuffled
    * — see [[gateAgainstStore]]; never corpus × corpus, never
    * batch × batch).
    * Verdict: drop when exact-dup OR ≥ half the batch doc's distinct
    * 8-grams already exist in the store (2·shared ≥ total — rational,
    * no float threshold). Docs shorter than `n` tokens can only be
    * dropped by the exact tier. */
  def incrementalIngestGate(docs: DataFrame, idCol: String, textCol: String,
      isNew: Column, n: Int = 8): DataFrame = {
    val base = docSigGrams(docs, idCol, textCol, n, extra = Seq(isNew.as("nw")))
      // four consumers (corpus sigs, corpus grams, batch grams, batch
      // frame): shingle once
      .cp()
    val r = gateAgainstStore(
        base.filter(col("nw")).select(col("doc_id"), col("sig"), col("grams")),
        base.filter(!col("nw")).select(col("sig")),
        base.filter(!col("nw")).select(explode(col("grams")).as("h")))
      .cp()
    graft.util.BlockRelease.release(base)
    r
  }

  /** The (sig, grams) fingerprint both gate tiers run on: sig =
    * md5(whitespace-normalized lowercased text), grams = the doc's
    * DISTINCT md5 `n`-token shingles. Shared by the batch gate above and
    * the streaming store ([[graft.streaming.Streams.ingestGateSink]]) so
    * a store bootstrapped from a batch corpus is bit-compatible with the
    * fingerprints each micro-batch computes. */
  private[graft] def docSigGrams(docs: DataFrame, idCol: String,
      textCol: String, n: Int, extra: Seq[Column] = Nil): DataFrame = {
    // null text normalizes to "" (the q99-oracle convention) — without it
    // concat_ws silently maps the null token array to "" on the Spark side
    // while a SQL oracle keeps sig NULL, breaking engine parity; with it
    // BOTH engines agree that text-less docs share the md5("") signature.
    val txt = coalesce(col(textCol), lit(""))
    val toks = split(lower(trim(txt)), "\\s+")
    // one-pass kernel: the HOF formulation re-split the text per shingle
    // index in interpreted context (70 s at the 50k scale cell → see
    // Md5WordShingles scaladoc); this tokenizes once per row
    docs.select(Seq(col(idCol).as("doc_id")) ++ extra ++ Seq(
      md5(concat_ws(" ", toks)).as("sig"),
      md5_word_shingles(txt, n).as("grams")): _*)
  }

  /** Gate core: verdicts for a fingerprinted batch (doc_id, sig, grams)
    * against a signature/gram STORE.
    *
    * STORE-SCAN-ONLY discipline (r12, caught by the SCALE-INGEST decade-
    * up cell): the store is the corpus — it must never be broadcast,
    * collected, or even SHUFFLED per micro-batch. The r11 shape
    * (`batch LEFT SEMI store`) let Spark pick the physical join, and at
    * an 800k-doc store the planner chose to broadcast the 42M-row gram
    * side — a driver-sized collect of the corpus (maxResultSize abort at
    * 1 GiB; at 100 TB, fatal), while the sort-merge fallback would have
    * shuffled the whole store once per micro-batch. Reversed form: the
    * store side is semi-joined against the BROADCAST batch-derived key
    * set (SizeGate'd — a corpus-sized "batch" degrades to the shuffled
    * join instead of a corpus broadcast), so the store is scanned
    * map-only, and the only exchanges are the match-set dedups, bounded
    * by partitions × |batch keys| through map-side partial aggregation
    * even when one boilerplate shingle occurs millions of times in the
    * store. Matched sets are ≤ the batch set by construction, so their
    * re-broadcast rides the same gate decision with no extra count.
    *
    * Duplicate store rows (the same sig or gram persisted by several
    * increments) still can never overcount — the store remains a semi
    * side — so no store-wide distinct is needed, which is what lets the
    * streaming sink ([[graft.streaming.Streams.ingestGateSink]]) append
    * per-batch store partitions and leave compaction as a maintenance
    * concern. */
  private[graft] def gateAgainstStore(batch: DataFrame, storeSigs: DataFrame,
      storeGrams: DataFrame): DataFrame = {
    import graft.util.SizeGate
    val batchSigs = batch.select(col("sig")).distinct()
    val nSigs = batchSigs.count()
    val matchedSigs = storeSigs.select(col("sig"))
      .join(SizeGate.maybeBroadcast(batchSigs, known = Some(nSigs)),
        Seq("sig"), "left_semi")
      .distinct()
    val batchG = batch.select(col("doc_id"), explode(col("grams")).as("h"))
    val batchH = batchG.select(col("h")).distinct()
    val nH = batchH.count()
    val matchedH = storeGrams.select(col("h"))
      .join(SizeGate.maybeBroadcast(batchH, known = Some(nH)),
        Seq("h"), "left_semi")
      .distinct()
    gateVerdicts(batch, matchedSigs, matchedH, nSigs, nH)
  }

  /** Verdict assembly shared by [[gateAgainstStore]] and the indexed
    * gate ([[IngestIndex.gateWithIndex]]): given the MATCHED key sets
    * (store keys proven present in the batch — however they were found),
    * flag exact dups and count per-doc shared grams. `sigBound`/`hBound`
    * bound the matched sets (they are intersections with the batch key
    * sets, so the batch key counts — which every caller already has —
    * are valid bounds) and drive the SizeGate broadcasts. */
  private[graft] def gateVerdicts(batch: DataFrame, matchedSigs: DataFrame,
      matchedH: DataFrame, sigBound: Long, hBound: Long): DataFrame = {
    import graft.util.SizeGate
    val exact = batch
      .join(SizeGate.maybeBroadcast(matchedSigs, known = Some(sigBound)),
        Seq("sig"), "left_semi")
      .select(col("doc_id"), lit(true).as("xd"))
    val batchG = batch.select(col("doc_id"), explode(col("grams")).as("h"))
    val shared = batchG
      .join(SizeGate.maybeBroadcast(matchedH, known = Some(hBound)),
        Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("ns")) // grams already distinct per doc
    batch
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(exact, Seq("doc_id"), "left")
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("xd"), lit(false)).as("exact_dup"),
        col("n_grams"),
        coalesce(col("ns"), lit(0L)).as("n_shared"),
        (coalesce(col("xd"), lit(false)) ||
          (col("n_grams") > 0 &&
            coalesce(col("ns"), lit(0L)) * 2 >= col("n_grams"))).as("drop_doc"))
  }

  /** Cross-engine twin of [[simhashNearDups]] (the md5-twin precedent of
    * q37/q38/q55): the 64-bit SimHash is derived from md5 token hashes —
    * bit j is set iff Σ over token occurrences of (±1 by bit j of the
    * first 8 md5 digest bytes) > 0 — so any engine with md5 reproduces
    * the fingerprints, the pigeonhole candidates AND the Hamming
    * distances exactly, which is what puts q35 under the DuckDB hash
    * oracle. The fingerprint lives in two 32-bit words (hex chars 1–8 =
    * high, 9–16 = low): Spark's conv() yields signed longs, and 32-bit
    * words keep every value positive with every bit test an EXACT
    * power-of-two division (there is no variable-shift Column builtin).
    * Same pigeonhole exactness as the native tier — this is candidate
    * generation via equality join, never all-pairs — and the same
    * one-shuffle shape: tokens explode locally, the 64 ±1 bit sums ride
    * ONE partial-aggregated groupBy. */
  def simhashNearDupsMd5(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3,
      collapseRatio: Double = Double.PositiveInfinity): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    require(width <= 32 && 32 % width == 0,
      s"chunk width $width must divide 32 (supported maxDist: 1, 3, 7)")
    val fp = simhashMd5Fp(docs, idCol, textCol)
    pigeonholePairs(fp, Seq("fp_lo", "fp_hi"),
      simhashChunkCols(chunks, width), maxDist, simhashMd5Dist,
      collapseRatio)
  }

  /** The md5-twin 64-bit SimHash fingerprint frame (doc_id, fp_lo,
    * fp_hi) — factored r14 so the pair form and the group form compute
    * it identically (it IS the near-dup semantics: every pair/group
    * decision is a function of these two words). */
  private[graft] def simhashMd5Fp(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tk"))
    val th = tok.select(col("doc_id"),
      conv(substring(md5(col("tk")), 1, 8), 16, 10).cast("long").as("hi"),
      conv(substring(md5(col("tk")), 9, 8), 16, 10).cast("long").as("lo"))
    // bit j of a 32-bit word by exact division (word < 2^32 and 2^j are
    // both exact doubles; dividing by a power of two shifts the exponent
    // only, so floor() is the true bit)
    def bit(c: Column, j: Int): Column =
      pmod(floor(c / lit(math.pow(2.0, j))).cast("long"), lit(2L))
    val sums = th.groupBy(col("doc_id")).agg(
      sum(when(bit(col("lo"), 0) === 1, 1).otherwise(-1)).as("s0"),
      (1 until 64).map { j =>
        val b = if (j < 32) bit(col("lo"), j) else bit(col("hi"), j - 32)
        sum(when(b === 1, 1).otherwise(-1)).as(s"s$j")
      }: _*)
    val fpLo = (0 until 32).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val fpHi = (32 until 64).map(j =>
      when(col(s"s$j") > 0, lit(1L << (j - 32))).otherwise(lit(0L))).reduce(_ + _)
    sums.select(col("doc_id"), fpLo.as("fp_lo"), fpHi.as("fp_hi"))
  }

  private def simhashChunkCols(chunks: Int, width: Int): Seq[Column] =
    (0 until chunks).map { c =>
      val word = if (c < 32 / width) col("fp_lo") else col("fp_hi")
      shiftrightunsigned(word, (c * width) % 32)
        .bitwiseAND(lit((1L << width) - 1))
    }

  private val simhashMd5Dist:
      (String => Column, String => Column) => Column =
    (a, b) => (bit_count(a("fp_lo").bitwiseXOR(b("fp_lo"))) +
      bit_count(a("fp_hi").bitwiseXOR(b("fp_hi")))).cast("long")

  /** COMPACT GROUP form of [[simhashNearDupsMd5]] — the q110/q112/q113
    * escape hatch applied to the SimHash kernel, completing the group
    * family across every near-dup relation the engine ships. Emits
    * (doc_id, canon_id, group_size): components of the Hamming ≤ maxDist
    * relation over the md5-twin fingerprints, at cost linear in
    * dup-group members — exact-dup groups ride one window over the
    * fingerprint pair (identical fingerprints are at distance 0, so they
    * are near-dups at ANY maxDist ≥ 0 — no threshold caveat, unlike the
    * Jaccard forms), pigeonhole banding runs on one representative per
    * distinct fingerprint, components on the rep graph, members attach
    * via gid. The pigeonhole candidates are EXACT for the distance bound
    * (any pair within Hamming maxDist shares one of maxDist+1 chunks),
    * so unlike the MinHash form there is no banding-recall pin: engine
    * components equal true-pair components unconditionally. The SimHash
    * collapse's r12 negative result (the fingerprint groupBy dominates
    * and must run per member) applies here too — but the group form's
    * win is the OUTPUT, not the banding: C(k,2) pair rows never
    * materialize. */
  def simhashNearDupGroupsMd5(docs: DataFrame, idCol: String,
      textCol: String, maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    require(width <= 32 && 32 % width == 0,
      s"chunk width $width must divide 32 (supported maxDist: 1, 3, 7)")
    // gid over the (fp_lo, fp_hi) fingerprint — narrow keys, but the
    // same no-combine window shape: a boilerplate fingerprint carried by
    // 10⁹ docs serialized one task. r15: hash-keyed groupBy + join-back.
    val (withGid, gidScratch) = gidByContent(
      simhashMd5Fp(docs, idCol, textCol)
        .select(col("doc_id").cast("long").as("id"),
          col("fp_lo"), col("fp_hi")),
      Seq("fp_lo", "fp_hi"))
    val mem = withGid
      .select(col("id"), col("fp_lo"), col("fp_hi"), col("gid"))
      .cp()
    graft.util.BlockRelease.release(gidScratch)
    val reps = mem.filter(col("id") === col("gid"))
      .select(col("id").as("doc_id"), col("fp_lo"), col("fp_hi"))
    val chunkCols = simhashChunkCols(chunks, width)
    // reps are distinct fingerprints by construction, so the pigeonhole
    // kernel's collapse gate is moot — but a hot BAND (many reps
    // sharing a low-entropy chunk value, the templated-text shape) is
    // the r16 density-gate regime: star+repair past the gate, with the
    // center attach heavy-hitter-split on the (c, chunk) bucket key
    val banded = reps.select(col("doc_id"), col("fp_lo"), col("fp_hi"),
      posexplode(array(chunkCols: _*)).as(Seq("c", "chunk")))
    val pairs = gatedBucketEdges(banded, "doc_id", Seq("c", "chunk"),
      "simhashNearDupGroupsMd5",
      pairComplete = () => pigeonholeBandJoin(reps, Seq("fp_lo", "fp_hi"),
        chunkCols, maxDist, simhashMd5Dist, "doc_a", "doc_b")
        .select(col("doc_a"), col("doc_b"))
        .cp(),
      // cheap verify (r16 second round): the fingerprint longs ride the
      // banded frame, so candidates carry them inline — no rep
      // join-back, and the repair bound relaxes to the cheap fraction
      // (the simband cell's 0.53×-pair-complete repair regime engages
      // where the generic bound had to fall back)
      verify = c => c.select(col("doc_a"), col("doc_b"),
        (simhashMd5Dist(f => col(s"${f}_a"), f => col(s"${f}_b"))
          <= maxDist).as("_pass")),
      "doc_a", "doc_b",
      carryCols = Seq("fp_lo", "fp_hi"))
    val out = groupsFromReps(mem,
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    graft.util.BlockRelease.release(pairs)
    out
  }

  /** SimHash near-dup pairs with Hamming ≤ maxDist: pigeonhole banding —
    * split the 64-bit fingerprint into maxDist+1 chunks; any pair within
    * distance shares ≥1 exact chunk, so an equality join on
    * (chunk_idx, chunk_value) finds all of them without O(n²). */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3,
      collapseRatio: Double = Double.PositiveInfinity): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val fp = docs.select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sh"))
    val chunkCols = (0 until chunks).map { c =>
      shiftrightunsigned(col("sh"), c * width).bitwiseAND(lit((1L << width) - 1))
    }
    pigeonholePairs(fp, Seq("sh"), chunkCols, maxDist,
      (a, b) => hamming64(a("sh"), b("sh")).cast("long"), collapseRatio)
  }

  /** Shared pigeonhole pair kernel for the SimHash tiers: band the
    * fingerprint frame (doc_id, fpCols…) by `chunkCols`, self-join on
    * (chunk_idx, chunk_value), distinct, compute `dist` and keep ≤
    * maxDist — with an EXACT-DUP COLLAPSE tier (the
    * [[cosineNearDupsExact]] argument in Hamming space): pair semantics
    * depend ONLY on the fingerprint, so docs with equal fingerprints
    * band identically and sit at distance 0 from each other; past the
    * gate the banding runs on one representative per distinct
    * fingerprint, group pairs expand to member pairs (output-sized
    * joins), and within-group pairs emit at dist = 0. Pair set and
    * distances are bit-for-bit the direct tier's (DedupSpec: forced
    * twins both ways on a replicated corpus).
    *
    * MEASURED NEGATIVE RESULT (r12) — collapse is OPT-IN here
    * (collapseRatio defaults to +∞), unlike the cosine/minhash tiers:
    * SimHash's dominant cost is the per-doc fingerprint computation
    * (the token explode + 64-sum groupBy), which collapse CANNOT touch
    * — the fingerprint IS the group key, so it must be computed for
    * every member first. On the 10×-replicated 500k-doc sweep corpus
    * the collapse tier measured 20–21 s vs 16.9 s direct (same JVM
    * protocol): the window + expansion machinery costs more than the
    * shrunk banding join saves at any realistic dup ratio. Contrast
    * minhash, where the 64-hash SIGNATURE stage runs on reps only and
    * collapse won 20.0 → 11.9 s. The machinery is kept (and spec-pinned)
    * for corpora with extreme fingerprint multiplicity, where the
    * banding's dup-quadratic bucket pairs eventually dominate. */
  /** The pair-complete pigeonhole band self-join (factored r16 so the
    * gated group form and [[pigeonholePairs]] share one definition):
    * band by `chunkCols`, equality self-join on (chunk_idx, chunk),
    * distinct, exact `dist` ≤ maxDist. */
  private def pigeonholeBandJoin(src: DataFrame, fpCols: Seq[String],
      chunkCols: Seq[Column], maxDist: Int,
      dist: (String => Column, String => Column) => Column,
      la: String, lb: String): DataFrame = {
    val banded = src.select(col("doc_id") +: fpCols.map(col) :+
      posexplode(array(chunkCols: _*)).as(Seq("c", "chunk")): _*)
    banded.as("a").hint("merge").join(banded.as("b").hint("merge"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as(la) +: col("b.doc_id").as(lb) +:
        (fpCols.map(f => col(s"a.$f").as(s"${f}_a")) ++
          fpCols.map(f => col(s"b.$f").as(s"${f}_b"))): _*)
      .distinct()
      .select(col(la), col(lb),
        dist(f => col(s"${f}_a"), f => col(s"${f}_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  private def pigeonholePairs(fp0: DataFrame, fpCols: Seq[String],
      chunkCols: Seq[Column], maxDist: Int,
      dist: (String => Column, String => Column) => Column,
      collapseRatio: Double = 1.25): DataFrame = {
    val fp = fp0.cp()
    val probe = fp.agg(count(lit(1)),
      approx_count_distinct(struct(fpCols.map(col): _*))).first()
    val (nDocs, nDistinct) = (probe.getLong(0), probe.getLong(1))
    def bandJoin(src: DataFrame, la: String, lb: String): DataFrame =
      pigeonholeBandJoin(src, fpCols, chunkCols, maxDist, dist, la, lb)
    if (nDocs < collapseRatio * nDistinct) {
      val out = bandJoin(fp, "doc_a", "doc_b").cp()
      graft.util.BlockRelease.release(fp)
      out
    } else {
      // hash-keyed gid stage, the minhash tier's argument (r15)
      val (withG0, gidScratch) = gidByContent(
          fp.select(col("doc_id").as("id") +: fpCols.map(col): _*),
          fpCols, checkpointKeyed = false,
          knownRows = nDocs) // fp is checkpointed
      val withG = withG0
        .select(col("id").as("doc_id") +: fpCols.map(col) :+ col("gid"): _*)
        .cp()
      graft.util.BlockRelease.release(gidScratch :+ fp)
      val reps = withG.filter(col("doc_id") === col("gid"))
      val gpairs = bandJoin(reps, "ga", "gb")
      val memIds = withG.select(col("doc_id"), col("gid"))
      // merge-hinted like the cosine/minhash tiers: memIds is
      // corpus-sized and checkpoint stats under-estimate
      val cross = gpairs.hint("merge")
        .join(memIds.select(col("gid").as("ga"), col("doc_id").as("ida"))
          .hint("merge"), "ga")
        .hint("merge")
        .join(memIds.select(col("gid").as("gb"), col("doc_id").as("idb"))
          .hint("merge"), "gb")
        .select(least(col("ida"), col("idb")).as("doc_a"),
          greatest(col("ida"), col("idb")).as("doc_b"), col("dist"))
      val within = memIds.as("x").hint("merge").join(memIds.as("y").hint("merge"),
          col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          lit(0L).as("dist"))
        .filter(lit(0L) <= maxDist)
      val out = cross.unionByName(within).cp()
      graft.util.BlockRelease.release(withG)
      out
    }
  }
}
