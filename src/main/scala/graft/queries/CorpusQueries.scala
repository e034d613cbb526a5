package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions._
import graft.schemas.Tables
import graft.util.Checkpointer.CheckpointSyntax

/** Corpus-statistics operators over the `documents` table — the planning
  * layer of a 100 TB training-data pipeline: gate expensive joins with a
  * broadcastable membership sketch (q106), size the domain mixture before
  * sampling it (q107), estimate cross-source duplication before paying
  * full dedup (q108), and report frequent tokens without a vocabulary
  * shuffle (q109).
  *
  * All four are fully DuckDB-oracled: q106/q108/q109 through the md5-twin
  * hashing discipline (q55/q87 precedent — deterministic hash family ⇒
  * an EXACT oracle over approximate operators, false positives and
  * estimator error included), q107 through pure BIGINT arithmetic.
  */
object CorpusQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** q106 — BLOOM-GATED DECONTAMINATION ([[graft.functions.BloomSketch]]):
    * q66's eval-leak scrub restaged for the 100 TB corpus side. The
    * benchmark grams (doc_id % 97 == 0) aggregate into ONE 2^17-bit
    * partitioned Bloom (48 KiB — partial aggregation IS the Bloom merge,
    * shuffle = one bitset per partition); the corpus probes it MAP-SIDE
    * via the broadcast row, and the exact verify join runs only on
    * bloom-POSITIVE grams. No false negatives ⇒ `n_bench_shared` /
    * `contaminated` are provably identical to the ungated q66 join;
    * `n_bloom_hits − n_bench_shared` surfaces the false-positive cost the
    * gate pays for skipping the corpus-wide shuffle. md5-prefix bit
    * positions ⇒ DuckDB replays every set bit and every FP bit-for-bit. */
  val q106BloomDecontam: Q = (spark, dir) =>
    bloomDecontamGate(docs(spark, dir), streamBloom = None)

  /** The q106 gate body over any corpus frame, with the BITSET SOURCE
    * pluggable (r13, closing the r12 "registered-query surface for the
    * streaming Bloom" item): `streamBloom = Some(row)` gates against an
    * externally-built single-row (bloom: array<long>) frame — e.g. a
    * window drained from [[graft.streaming.Streams.windowedGramBloom]]
    * and densified by [[graft.streaming.Streams.assembleWindowBloom]],
    * whose word layout is bit-identical to `bloom_build_hex` by the
    * StreamingSpec pin — so a stream-accumulated benchmark set gates a
    * batch corpus with NO re-aggregation of the bench grams. `None`
    * builds the bitset from the corpus's own bench rows (the registered
    * q106). Verdict columns are identical either way whenever the
    * supplied bitset was built over the same bench gram set. */
  private[graft] def bloomDecontamGate(allDocs: DataFrame,
      streamBloom: Option[DataFrame], mBits: Int = 1 << 17,
      k: Int = 3): DataFrame = {
    val spark = allDocs.sparkSession
    import spark.implicits._
    import graft.functions.BloomSketch._
    // three consumers (bloom build, probe, verify join): shingle once
    val grams = allDocs
      .select($"doc_id", ($"doc_id" % 97 === 0).as("b"),
        explode(md5_word_shingles($"text", 8)).as("h"))
      .cp()
    val bloomRow = streamBloom.getOrElse(
      grams.filter($"b").agg(bloom_build_hex($"h", mBits, k).as("bloom")))
    // two consumers (per-doc counts, verify left side): probe once
    val probed = grams.filter(!$"b")
      .crossJoin(broadcast(bloomRow))
      .select($"doc_id", $"h",
        bloom_probe_hex($"h", $"bloom", mBits, k).as("hit"))
      .cp()
    val perDoc = probed.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"), sum($"hit".cast("long")).as("n_bloom_hits"))
    val benchSet = grams.filter($"b").select($"h").distinct()
    // the equality join's left side is bloom-positive grams ONLY — the
    // whole point of the gate; equal to the full join by the no-FN law
    val verify = probed.filter($"hit").join(benchSet, "h")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_true"))
    val r = allDocs.filter($"doc_id" % 97 =!= 0).select($"doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .join(verify, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"n_bloom_hits", lit(0L)).as("n_bloom_hits"),
        coalesce($"n_true", lit(0L)).as("n_bench_shared"),
        (coalesce($"n_true", lit(0L)) > 0).as("contaminated"),
        (coalesce($"n_bloom_hits", lit(0L)) - coalesce($"n_true", lit(0L)))
          .as("n_bloom_fp"))
      .cp()
    graft.util.BlockRelease.release(Seq(grams, probed))
    r
  }

  /** q107 — TEMPERATURE MIXTURE REWEIGHTING (the domain-mixing primitive:
    * XLM-R-style α = 0.5 temperature over stratum sizes, allocating a
    * 10 000-doc budget across (lang, source) strata by largest remainder).
    * Small strata are up-weighted relative to proportional sampling,
    * large ones damped — the standard fix for head-domain dominance.
    * Everything after the one corpus groupBy is BIGINT arithmetic on a
    * strata-sized frame: w = ⌊√n⌋ (exact in both engines for n < 9·10^15
    * — correctly-rounded sqrt can only miss floor when ulp(n) > 1),
    * base = ⌊N·w/Σw⌋, and the N − Σbase leftover goes to the largest
    * remainders (ties broken lexicographically). Σ target = N exactly, by
    * construction. Scale shape: one partial-agg exchange over the corpus;
    * the allocation itself is O(strata). */
  val q107MixtureWeights: Q = (spark, dir) => {
    import spark.implicits._
    val N = 10000L
    val s1 = docs(spark, dir).groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_sqrt", floor(sqrt($"n_docs".cast("double"))).cast("long"))
    val tot = s1.agg(sum($"w_sqrt").as("d_sum"))
    val s2 = s1.crossJoin(broadcast(tot))
      .withColumn("alloc_base", expr(s"($N * w_sqrt) DIV d_sum"))
      .withColumn("rem", expr(s"($N * w_sqrt) % d_sum"))
      .cp() // two consumers (deficit agg, ranked alloc) + window input
    val deficit = s2.agg((lit(N) - sum($"alloc_base")).as("deficit"))
    // unpartitioned window is fine HERE: the frame is strata-sized (an
    // aggregation output), never corpus-sized
    val rk = row_number().over(Window.orderBy($"rem".desc, $"lang".asc, $"source".asc))
    val r = s2.crossJoin(broadcast(deficit))
      .withColumn("rk", rk)
      .select($"lang", $"source", $"n_docs", $"w_sqrt", $"alloc_base",
        ($"rk" <= $"deficit").cast("long").as("extra"),
        ($"alloc_base" + ($"rk" <= $"deficit").cast("long")).as("target_docs"))
      .cp()
    graft.util.BlockRelease.release(s2)
    r
  }

  /** q108 — CROSS-SOURCE OVERLAP ESTIMATION (KMV set intersection, Beyer
    * et al. 2007): per-source k-minimum-value sketches over the distinct
    * 8-gram shingle space answer "how duplicated is source A against
    * source B" for ALL source pairs from S fixed-size sketches — the
    * dedup-planning probe a 100 TB pipeline runs BEFORE committing to a
    * full cross-source near-dup pass. Sketch = 256 smallest u60 gram
    * hashes per source (rank ≤ k rides partial WindowGroupLimit, so the
    * exchange carries ≤ k rows per source); pair estimates re-rank the
    * union of two sketches: ρ = |top-k ∩ both| / k estimates Jaccard,
    * (k−1)/u_k the union size, ρ·union the intersection. Exact truth
    * columns ride the same distinct-gram frame (the q87/q88 truth-pin
    * pattern); hashes are gram md5 prefixes ⇒ the whole surface —
    * sketches, estimator arithmetic, truth — replays in DuckDB. */
  val q108SourceOverlap: Q = (spark, dir) => {
    import spark.implicits._
    import graft.functions.KmvSketch
    val K = 256
    // distinct (source, u60) gram space — three consumers (counts,
    // sketches, truth self-join): shingle + distinct once
    val su = docs(spark, dir)
      .select($"source", explode(md5_word_shingles($"text", 8)).as("h"))
      .select($"source", conv(substring($"h", 1, 15), 16, 10).cast("long").as("u"))
      .distinct()
      .cp()
    val counts = su.groupBy($"source").agg(count(lit(1)).as("nd"))
    // sketch build + estimator are the library
    // ([[graft.functions.KmvSketch.overlapEstimates]] — factored r13 per
    // the r12 verdict); the truth columns below are ORACLE SCAFFOLDING a
    // production caller omits (their self-join is shuffle ∝ distinct
    // grams — fine here, never required for the estimates)
    val sk = KmvSketch.groupSketches(su, "source", "u", K)
    val srcs = counts.select($"source")
    val pairs = srcs.select($"source".as("sa"))
      .crossJoin(srcs.select($"source".as("sb")))
      .filter($"sa" < $"sb")
    val withEst = KmvSketch.overlapEstimates(sk, "source", "u", K)
      .select($"ga".as("sa"), $"gb".as("sb"), $"union_est", $"inter_est",
        $"jacc_milli_est")
    val tj = su.as("x").join(su.as("y"),
        $"x.u" === $"y.u" && $"x.source" < $"y.source")
      .groupBy($"x.source".as("sa"), $"y.source".as("sb"))
      .agg(count(lit(1)).as("inter_true"))
    val r = pairs
      .join(counts.select($"source".as("sa"), $"nd".as("n_a")), "sa")
      .join(counts.select($"source".as("sb"), $"nd".as("n_b")), "sb")
      .join(tj, Seq("sa", "sb"), "left")
      .join(withEst.select($"sa", $"sb", $"union_est", $"inter_est",
        $"jacc_milli_est"), Seq("sa", "sb"))
      .select($"sa".as("source_a"), $"sb".as("source_b"), $"n_a", $"n_b",
        coalesce($"inter_true", lit(0L)).as("inter_true"),
        ($"n_a" + $"n_b" - coalesce($"inter_true", lit(0L))).as("union_true"),
        expr("(1000 * coalesce(inter_true, 0)) DIV " +
          "(n_a + n_b - coalesce(inter_true, 0))").as("jacc_milli_true"),
        $"union_est", $"inter_est", $"jacc_milli_est")
      .cp()
    graft.util.BlockRelease.release(su)
    r
  }

  /** q109 — CMS-GATED HEAVY HITTERS (the φ = 1/200 frequent-token report
    * without a vocabulary shuffle): token OCCURRENCES probe the broadcast
    * d×w grid map-side ([[graft.functions.CmsSketch.estimateFromMap]] —
    * d element_at lookups inside the scan's codegen span) and only
    * occurrences whose estimate clears φ·N survive to the distinct, so
    * the exchange carries candidate occurrences, never the open vocab —
    * the declarative Misra-Gries shape. CMS admissibility (est ≥ true,
    * always) makes the candidate set a provable SUPERSET of the true
    * heavy hitters; the exact verify groupBy then runs on candidates
    * only. Output = candidates with estimate, exact count, and the
    * is_heavy verdict — false candidates (est inflation) included, and
    * replayed exactly by the oracle (the q87 hash family). */
  val q109HeavyHitters: Q = (spark, dir) => {
    import spark.implicits._
    import graft.functions.CmsSketch
    import graft.functions.TextFunctions.tokens
    // four consumers (grid, total, candidate probe, exact verify):
    // tokenize once
    val toks = docs(spark, dir)
      .select(explode(tokens($"text")).as("tok"))
      .cp()
    // two consumers (gridAsMap's broadcast row, the final estimates
    // join): build the <= d*w-row grid once
    val grid = CmsSketch.sketch(toks, "tok").cp()
    val gm = CmsSketch.gridAsMap(grid)
    val tot = toks.agg(count(lit(1)).as("n_total"))
    val candidates = toks
      .crossJoin(broadcast(gm)).crossJoin(broadcast(tot))
      .select($"tok", $"n_total", CmsSketch.hash60($"tok").as("_u60"),
        $"cms_map")
      .select($"tok", $"n_total",
        CmsSketch.estimateFromMap($"_u60", $"cms_map").as("est"))
      .filter($"est" >= expr("n_total DIV 200"))
      .select($"tok").distinct()
      .cp() // two consumers (verify join, estimate join); tiny
    val truth = toks
      .join(graft.util.SizeGate.maybeBroadcast(candidates), "tok")
      .groupBy($"tok").agg(count(lit(1)).as("true_count"))
    val r = CmsSketch.estimates(grid, candidates, "tok")
      .join(truth.withColumnRenamed("tok", "token"), "token")
      .crossJoin(broadcast(tot))
      .select($"token", $"est_count", $"true_count", $"n_total",
        expr("n_total DIV 200").as("threshold"),
        ($"true_count" >= expr("n_total DIV 200")).as("is_heavy"),
        ($"est_count" >= $"true_count").as("admissible"))
      .cp()
    graft.util.BlockRelease.release(Seq(toks, candidates, grid))
    r
  }

  val defs: Map[String, Q] = Map(
    "q106_bloom_decontam" -> q106BloomDecontam,
    "q107_mixture_weights" -> q107MixtureWeights,
    "q108_source_overlap" -> q108SourceOverlap,
    "q109_heavy_hitters" -> q109HeavyHitters)

  val oracles: Map[String, String] = Map(
    // q106 — the partitioned Bloom replayed as a distinct (r, position)
    // set: positions are 17-bit slices of the gram's own md5-prefix u60
    // (no second digest), a gram is a bloom hit iff all 3 rows match,
    // truth is the plain bench semi-join. Spark's dense bitset and this
    // set formulation are the same predicate ("bit set" ⟺ "some bench
    // gram occupies (r, p)"), so false positives replay exactly too.
    "q106_bloom_decontam" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |    range(0, greatest(len(toks) - 7, 0)),
        |    i -> md5(array_to_string(toks[i+1:i+8], ' ')))) AS h FROM t),
        |bp AS (SELECT DISTINCT rr.r,
        |    (('0x' || substr(sh.h, 1, 15))::BIGINT >> (17 * rr.r)) & 131071 AS p
        |  FROM sh, range(0, 3) rr(r) WHERE sh.doc_id % 97 = 0),
        |cp AS (SELECT sh.doc_id, sh.h, rr.r,
        |    (('0x' || substr(sh.h, 1, 15))::BIGINT >> (17 * rr.r)) & 131071 AS p
        |  FROM sh, range(0, 3) rr(r) WHERE sh.doc_id % 97 <> 0),
        |hit AS (SELECT cp.doc_id, cp.h, count(bp.r) = 3 AS hit
        |  FROM cp LEFT JOIN bp ON cp.r = bp.r AND cp.p = bp.p
        |  GROUP BY cp.doc_id, cp.h),
        |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0),
        |agg AS (SELECT hit.doc_id, count(*)::BIGINT AS n_grams,
        |    sum(CASE WHEN hit.hit THEN 1 ELSE 0 END)::BIGINT AS n_bloom_hits,
        |    sum(CASE WHEN bench.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_true
        |  FROM hit LEFT JOIN bench ON hit.h = bench.h
        |  GROUP BY hit.doc_id)
        |SELECT d.doc_id, coalesce(agg.n_grams, 0)::BIGINT AS n_grams,
        |  coalesce(agg.n_bloom_hits, 0)::BIGINT AS n_bloom_hits,
        |  coalesce(agg.n_true, 0)::BIGINT AS n_bench_shared,
        |  coalesce(agg.n_true, 0) > 0 AS contaminated,
        |  (coalesce(agg.n_bloom_hits, 0) - coalesce(agg.n_true, 0))::BIGINT AS n_bloom_fp
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |WHERE d.doc_id % 97 <> 0""".stripMargin,
    // q107 — pure BIGINT largest-remainder allocation; every sum cast
    // ::BIGINT (DuckDB sum → HUGEINT, the q68 hash-mismatch class),
    // integer division via //.
    "q107_mixture_weights" ->
      """WITH s AS (SELECT lang, source, count(*)::BIGINT AS n_docs
        |    FROM documents GROUP BY 1, 2),
        |w AS (SELECT lang, source, n_docs,
        |    CAST(floor(sqrt(n_docs::DOUBLE)) AS BIGINT) AS w_sqrt FROM s),
        |t AS (SELECT sum(w_sqrt)::BIGINT AS d_sum FROM w),
        |a AS (SELECT w.*, ((10000 * w_sqrt) // d_sum)::BIGINT AS alloc_base,
        |    ((10000 * w_sqrt) % d_sum)::BIGINT AS rem FROM w, t),
        |d AS (SELECT (10000 - sum(alloc_base))::BIGINT AS deficit FROM a),
        |r AS (SELECT a.*, row_number() OVER
        |    (ORDER BY rem DESC, lang ASC, source ASC) AS rk FROM a)
        |SELECT lang, source, n_docs, w_sqrt, alloc_base,
        |  (CASE WHEN rk <= deficit THEN 1 ELSE 0 END)::BIGINT AS extra,
        |  (alloc_base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END)::BIGINT AS target_docs
        |FROM r, d""".stripMargin,
    // q108 — sketches, estimator arithmetic (same op order: BIGINT →
    // DOUBLE, / 2^60, 255/u, round) and exact truth all replayed; u60
    // gram-prefix hashes, distinct per (source, u).
    "q108_source_overlap" ->
      """WITH t AS (SELECT source,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |sh0 AS (SELECT source, unnest(list_transform(
        |    range(0, greatest(len(toks) - 7, 0)),
        |    i -> md5(array_to_string(toks[i+1:i+8], ' ')))) AS h FROM t),
        |su AS (SELECT DISTINCT source, ('0x' || substr(h, 1, 15))::BIGINT AS u FROM sh0),
        |cnt AS (SELECT source, count(*)::BIGINT AS nd FROM su GROUP BY 1),
        |sk AS (SELECT source, u FROM (SELECT source, u,
        |    row_number() OVER (PARTITION BY source ORDER BY u) AS rn FROM su)
        |  WHERE rn <= 256),
        |prs AS (SELECT a.source AS sa, b.source AS sb FROM cnt a, cnt b
        |  WHERE a.source < b.source),
        |mem AS (SELECT prs.sa, prs.sb, sk.u,
        |    max(CASE WHEN sk.source = prs.sa THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN sk.source = prs.sb THEN 1 ELSE 0 END) AS in_b
        |  FROM prs JOIN sk ON sk.source = prs.sa OR sk.source = prs.sb
        |  GROUP BY 1, 2, 3),
        |top AS (SELECT * FROM (SELECT mem.*, row_number() OVER
        |    (PARTITION BY sa, sb ORDER BY u) AS rn FROM mem) WHERE rn <= 256),
        |est AS (SELECT sa, sb, count(*)::BIGINT AS nx,
        |    max(CASE WHEN rn = 256 THEN u END) AS kth,
        |    sum(in_a * in_b)::BIGINT AS c FROM top GROUP BY 1, 2),
        |e2 AS (SELECT sa, sb, nx, c,
        |    CASE WHEN nx < 256 THEN nx ELSE CAST(round(255.0 /
        |      (kth::DOUBLE / 1152921504606846976.0)) AS BIGINT) END AS union_est
        |  FROM est),
        |e3 AS (SELECT sa, sb, nx, c, union_est,
        |    (CASE WHEN nx < 256 THEN c ELSE (c * union_est) // 256 END)::BIGINT AS inter_est,
        |    ((1000 * c) // greatest(CASE WHEN nx < 256 THEN nx ELSE 256 END, 1))::BIGINT
        |      AS jacc_milli_est FROM e2),
        |tj AS (SELECT x.source AS sa, y.source AS sb, count(*)::BIGINT AS inter_true
        |  FROM su x JOIN su y ON x.u = y.u AND x.source < y.source GROUP BY 1, 2)
        |SELECT prs.sa AS source_a, prs.sb AS source_b, ca.nd AS n_a, cb.nd AS n_b,
        |  coalesce(tj.inter_true, 0)::BIGINT AS inter_true,
        |  (ca.nd + cb.nd - coalesce(tj.inter_true, 0))::BIGINT AS union_true,
        |  ((1000 * coalesce(tj.inter_true, 0)) //
        |    (ca.nd + cb.nd - coalesce(tj.inter_true, 0)))::BIGINT AS jacc_milli_true,
        |  e3.union_est::BIGINT AS union_est, e3.inter_est AS inter_est,
        |  e3.jacc_milli_est AS jacc_milli_est
        |FROM prs
        |JOIN cnt ca ON ca.source = prs.sa
        |JOIN cnt cb ON cb.source = prs.sb
        |LEFT JOIN tj ON tj.sa = prs.sa AND tj.sb = prs.sb
        |JOIN e3 ON e3.sa = prs.sa AND e3.sb = prs.sb""".stripMargin,
    // q109 — the q87 grid replayed, estimates computed for the full
    // vocab (the oracle can afford the vocab pass the operator avoids),
    // candidates = est >= n_total // 200, exact truth joined. Every
    // count ::BIGINT.
    "q109_heavy_hitters" ->
      """WITH t AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |    FROM documents),
        |tok AS (SELECT unnest(toks) AS tok FROM t),
        |tot AS (SELECT count(*)::BIGINT AS n_total FROM tok),
        |pairs AS (SELECT tok, rr.r,
        |    ((('0x' || substr(md5('cms:' || tok), 1, 15))::BIGINT >> (15 * rr.r)) & 32767) % 512 AS b
        |  FROM tok, range(0, 3) rr(r)),
        |grid AS (SELECT r, b, count(*)::BIGINT AS c FROM pairs GROUP BY r, b),
        |v AS (SELECT DISTINCT tok FROM tok),
        |pb AS (SELECT v.tok, rr.r,
        |    ((('0x' || substr(md5('cms:' || v.tok), 1, 15))::BIGINT >> (15 * rr.r)) & 32767) % 512 AS b
        |  FROM v, range(0, 3) rr(r)),
        |est AS (SELECT tok, min(coalesce(grid.c, 0))::BIGINT AS est_count
        |  FROM pb LEFT JOIN grid ON pb.r = grid.r AND pb.b = grid.b
        |  GROUP BY tok),
        |tr AS (SELECT tok, count(*)::BIGINT AS true_count FROM tok GROUP BY tok)
        |SELECT est.tok AS token, est.est_count, tr.true_count, tot.n_total,
        |  (tot.n_total // 200)::BIGINT AS threshold,
        |  tr.true_count >= tot.n_total // 200 AS is_heavy,
        |  est.est_count >= tr.true_count AS admissible
        |FROM est JOIN tr ON est.tok = tr.tok, tot
        |WHERE est.est_count >= tot.n_total // 200""".stripMargin)
}
