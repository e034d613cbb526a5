package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schemas.Tables
import graft.functions.TextFunctions._
import graft.functions.TextExpressions._
import graft.functions.VectorFunctions
import graft.dedup.Dedup
import graft.util.Checkpointer.CheckpointSyntax

/** Text-analysis + dedup suite over the `documents` table (LLM-pipeline
  * extension set; reference text handling at
  * project/qdrant/consumer_post.py:79-91).
  *
  * Every query here carries an exact DuckDB oracle (identical double-op
  * order → bit-equal): q30–q34/q36/q63 over built-in string arithmetic,
  * q35/q37/q38 through the md5-twin hashing tiers (the engine-native
  * FNV/xxhash tiers stay the fast defaults, spec-checked in DedupSpec /
  * TextExpressionsSpec).
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** q30 — token statistics (whitespace tokenization, X9-shaped). */
  val q30TokenStats: Q = (spark, dir) => {
    import spark.implicits._
    docs(spark, dir).select(
      $"doc_id",
      tokenCount($"text").as("n_tokens"),
      size(array_distinct(tokens($"text"))).as("n_distinct"),
      length($"text").as("n_chars_actual"),
      round(avgTokenLen($"text"), 4).as("avg_token_len"))
  }

  /** q31 — quality scoring (Gopher-style heuristics). */
  val q31Quality: Q = (spark, dir) => {
    import spark.implicits._
    docs(spark, dir).select(
      $"doc_id",
      round(stopwordRatio($"text"), 4).as("stopword_ratio"),
      round(punctRatio($"text"), 4).as("punct_ratio"),
      qualityScore($"text").as("quality"))
  }

  /** q32 — content fingerprints: md5 of whitespace-normalized text (X5's
    * deterministic-id contract) + exact-dup group stats. */
  val q32Fingerprints: Q = (spark, dir) => {
    Dedup.exactDuplicateGroups(docs(spark, dir), "doc_id", "text")
  }

  /** q33 — n-gram (3-word-shingle) Jaccard near-duplicate pairs within each
    * source, via inverted shingle index (equality join) — never all-pairs. */
  val q33NgramJaccard: Q = (spark, dir) =>
    // one-pass hashed shingling (WordShingleHashes); 8-byte join keys give
    // the same counts as strings (64-bit collisions negligible) at ~60%
    // less shuffle volume on the inverted-index self-join. Kernel factored
    // to [[Dedup.ngramJaccardNearDups]] (r12) — same inverted-index plan,
    // plus the exact-dup collapse tier for dup-heavy corpora.
    Dedup.ngramJaccardNearDups(docs(spark, dir), "doc_id", "text",
      scopeCol = "source", threshold = 0.5, n = 3)

  /** q63 — GPT-style pre-tokenization (the "BPE-ish regex" tier of token
    * counting): per-doc pre-token count, distinct pre-token count, and the
    * subword-to-whitespace expansion ratio. The RE2-compatible pattern
    * evaluates identically in Spark (Java regex) and DuckDB (RE2), so the
    * token-budget arithmetic is hash-oracled. */
  val q63GptTokens: Q = (spark, dir) => {
    import spark.implicits._
    docs(spark, dir).select(
      $"doc_id",
      gptPretokenCount($"text").as("n_pretokens"),
      size(array_distinct(gptPretokens($"text"))).as("n_distinct_pretokens"),
      round(gptPretokenCount($"text").cast("double") / tokenCount($"text"), 4)
        .as("expansion_ratio"))
  }

  /** q34 — heuristic language ID (stopword-density n-gram heuristic). */
  val q34LangId: Q = (spark, dir) => {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id", langId($"text").as("lang_guess"), $"lang")
  }

  /** q35 — SimHash near-dups (Hamming ≤ 3) via pigeonhole chunk banding,
    * registered through the md5-derived fingerprint
    * ([[Dedup.simhashNearDupsMd5]]): pigeonhole candidates are EXACT for
    * the distance bound (any pair within Hamming 3 shares one of 4 16-bit
    * chunks), and md5 fingerprints are engine-reproducible, so the full
    * pair set + distances sit under the DuckDB hash oracle. The fast
    * native-fingerprint tier ([[Dedup.simhashNearDups]]) keeps its
    * planted-pair spec in DedupSpec. */
  val q35SimhashNearDups: Q = (spark, dir) =>
    Dedup.simhashNearDupsMd5(docs(spark, dir), "doc_id", "text", maxDist = 3)

  /** q36 — MinHash-LSH near-dups verified by exact Jaccard ≥ 0.5.
    * Same ground truth as q33, found at shuffle cost O(buckets).
    * DuckDB-oracled against the EXACT global Jaccard pair set: the
    * 16×4 banding recalls every ≥0.5 pair on the (deterministic) test
    * corpus — verified Spark-side exact-vs-LSH at sf0.01 — and the
    * exact-verify stage removes every false positive, so LSH output ≡
    * the SQL-expressible truth here (same determinism contract as the
    * q24/q33 oracles). */
  val q36MinhashLsh: Q = (spark, dir) =>
    Dedup.minhashNearDups(docs(spark, dir), "doc_id", "text", threshold = 0.5)

  /** q112 — COMPACT MINHASH NEAR-DUP GROUPS ([[Dedup
    * .minhashNearDupGroups]]): the q110 escape hatch applied to the
    * MinHash text kernel — every doc's canonical representative + group
    * size instead of q36's pair-complete output, linear in dup-group
    * members where the pair form pays C(k,2). Oracle: the TRUE global
    * Jaccard ≥ 0.5 pair graph (q36's inter CTE — banding recalls it
    * exactly at the oracle SFs, the q36 set-equality pin) → q43-pattern
    * min-label recursive-CTE components → totality via left join
    * (pair-free docs self-canonical) → group sizes. */
  val q112MinhashGroups: Q = (spark, dir) =>
    Dedup.minhashNearDupGroups(docs(spark, dir), "doc_id", "text",
      threshold = 0.5)

  /** q115 — COMPACT SHINGLE-COSINE NEAR-DUP GROUPS ([[Dedup
    * .shingleCosineGroups]]): the group form of q38's relation (shares
    * ≥1 scoped 3-shingle AND exact md5Embed cosine ≥ 0.6) — the LAST of
    * the four text near-dup kernels to get the escape hatch; q38's pair
    * form was the family's largest pair-complete output (41.7M rows at
    * dup multiplicity 30). Oracle: q38's candidate + verify CTEs →
    * q43-pattern min-label components → totality (pair-ineligible docs
    * self-canonical) → group sizes. */
  val q115ShingleCosineGroups: Q = (spark, dir) =>
    Dedup.shingleCosineGroups(docs(spark, dir), "doc_id", "text",
      scopeCol = "source", tauCos = 0.6, n = 3)

  /** q114 — COMPACT SIMHASH NEAR-DUP GROUPS ([[Dedup
    * .simhashNearDupGroupsMd5]]): the group form of q35's Hamming ≤ 3
    * relation, completing the group family over every near-dup kernel.
    * Stronger oracle footing than q112: the pigeonhole candidates are
    * EXACT for the distance bound, so engine components equal the true
    * Hamming pair graph's with no banding-recall pin. Oracle: q35's
    * md5-SimHash fingerprint CTE → brute true pairs (oracle SF only) →
    * q43-pattern min-label components → totality + group sizes. */
  val q114SimhashGroups: Q = (spark, dir) =>
    Dedup.simhashNearDupGroupsMd5(docs(spark, dir), "doc_id", "text",
      maxDist = 3)

  /** q113 — COMPACT n-gram JACCARD NEAR-DUP GROUPS ([[Dedup
    * .jaccardNearDupGroups]]): the group form of q33's scoped exact
    * inverted-index kernel — same component structure as canonicalizing
    * q33's pairs (the q73 shape), computed WITHOUT materializing the
    * pair-complete set: representatives per distinct (source, shingle
    * list), rep-only inverted index, components, gid attach. */
  val q113JaccardGroups: Q = (spark, dir) =>
    Dedup.jaccardNearDupGroups(docs(spark, dir), "doc_id", "text",
      scopeCol = "source", threshold = 0.5, n = 3)

  /** q38 — the dedup VERIFY stage under the full hash oracle (closing the
    * round-3 q24 rows-only gap): candidates are doc pairs sharing ≥1 exact
    * 3-word shingle within a source (the same SQL-expressible inverted
    * index as q33, joined on md5 of the shingle string — identical in both
    * engines), and each candidate is verified by cosine ≥ 0.6 over the
    * [[graft.functions.TextFunctions.md5Embed]] vectors. Both the
    * candidate set and the numerically-sensitive verify arithmetic
    * hash-match DuckDB exactly (integer-valued vectors → exact dot/norm);
    * q24 keeps exercising the SRP-LSH candidate tier, spec-proven equal to
    * its brute twin. */
  val q38CosineVerify: Q = (spark, dir) =>
    // candidate pairs via the one-pass HASHED shingle index (q33's
    // machinery): the oracle joins on md5 of the shingle string, but the
    // PAIR SET is what must match, and 64-bit content hashes produce the
    // same pairs (collisions negligible) at a fraction of the string+md5
    // cost — the md5 arithmetic is reserved for the verify stage, where
    // bit-level parity is what the oracle checks. Kernel factored to
    // [[Dedup.shingleCosineVerify]] (r12) — same candidate + verify plan,
    // plus the document-level exact-dup collapse tier.
    Dedup.shingleCosineVerify(docs(spark, dir), "doc_id", "text",
      scopeCol = "source", tauCos = 0.6, n = 3)

  /** q37 — document kNN over the cross-engine md5 feature-hash embedding
    * (the q38 precedent, closing the round-4 rows-only gap): embed all
    * docs with [[graft.functions.TextFunctions.md5Embed]] (16-dim signed
    * feature hashing — integer-valued vectors, so dot/norm arithmetic is
    * EXACT in doubles and DuckDB reproduces the scores bit-for-bit),
    * top-10 most similar to doc 0 by cosine. Zero vectors (empty docs)
    * are excluded on both sides — cosine is undefined there. The
    * engine-native 64-dim EmbedText expression stays exercised by q24's
    * LSH tier and TextExpressionsSpec. */
  val q37EmbedKnn: Q = (spark, dir) => {
    import spark.implicits._
    // stage the embed behind a checkpoint: the q/corpus branches (and the
    // n2 column) would each re-run the md5 token lambda otherwise — HOFs
    // get no CSE and CollapseProject re-inlines staging projections (the
    // q38 trap). Output-sized; released by the caller contract
    // (BlockReleaseSweepSpec) since it stays a leaf of the result plan.
    val emb0 = docs(spark, dir).select($"doc_id", md5Embed($"text").as("v"))
      .cp()
    val emb = emb0
      .withColumn("n2", aggregate($"v", lit(0.0), (acc, x) => acc + x * x))
      .filter($"n2" > 0)
    val q = emb.filter($"doc_id" === 0).select($"v".as("qv"), $"n2".as("qn2"))
    emb.filter($"doc_id" =!= 0)
      .crossJoin(broadcast(q))
      .select($"doc_id",
        round(VectorFunctions.dot($"v", $"qv") / sqrt($"n2" * $"qn2"), 4)
          .as("score"))
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(10)
  }

  /** q65 — PII redaction (the training-corpus scrub step a 100 TB text
    * pipeline runs before anything else): documents are deterministically
    * ENRICHED with synthetic PII (email + IPv4 + phone derived from
    * doc_id — the raw testdata carries none, and the scrub must be
    * exercised on matches, not just no-ops), then redacted with the
    * RE2-safe patterns in [[TextFunctions.redactPii]]. The oracle replays
    * enrichment, counting AND the full redaction — `red_md5` pins every
    * byte of the redacted output, so a single mis-replaced character
    * hash-mismatches. Scale shape: three codegen'd regexp_replace passes,
    * no shuffle at all. */
  val q65PiiRedact: Q = (spark, dir) => {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val enriched = concat($"text",
      lit(" contact user"), $"doc_id", lit("@example.com via 10."),
      ($"doc_id" % 200).cast("string"), lit(".0.1 tel 555-"),
      lpad(($"doc_id" % 1000).cast("string"), 3, "0"), lit("-1234"))
    docs(spark, dir)
      .select($"doc_id", enriched.as("t"))
      .select($"doc_id",
        piiCount($"t", EmailRe).as("n_email"),
        piiCount($"t", Ipv4Re).as("n_ip"),
        piiCount($"t", PhoneRe).as("n_phone"),
        md5(redactPii($"t")).as("red_md5"))
  }

  /** q66 — benchmark DECONTAMINATION (the eval-leak scrub): flag every
    * corpus document sharing at least one 8-token shingle with the
    * "benchmark" subset (doc_id % 97 == 0 stands in for the held-out eval
    * set). Candidates come from an equality join on md5 shingle hashes —
    * the inverted-index shape (q33/q38), shuffle ∝ shingles + matches,
    * never corpus × benchmark. Cross-engine md5 puts the full match
    * counts under the hash oracle. */
  val q66Decontaminate: Q = (spark, dir) => {
    import spark.implicits._
    Dedup.flagContaminated(docs(spark, dir), "doc_id", "text",
      isBench = $"doc_id" % 97 === 0, n = 8)
  }

  /** q68 — Gopher-style REPETITION quality signals (Rae et al. 2021 §A1.1,
    * the training-corpus filter family alongside q31's ratio heuristics):
    * per document, the duplicate-token fraction (1 − distinct/total — the
    * word-level analogue of duplicate-line fraction) and the top-bigram
    * fraction (occurrences of the most frequent word 2-gram over all
    * 2-grams — Gopher's "fraction in most common n-gram"). Highly
    * repetitive documents are the classic low-quality tail these rules
    * cut.
    *
    * Scale shape: token stats are map-side array arithmetic (no shuffle);
    * the bigram mode rides two partial-aggregated shuffles ∝ bigrams —
    * the q30/q33 discipline. Only the max COUNT is reported (not the
    * gram), so ties cost no determinism. Fully SQL-exact → hash oracle. */
  val q68Repetition: Q = (spark, dir) =>
    repetitionSignals(docs(spark, dir), "doc_id", "text")

  /** The q68 core, input-generic (spec'd on planted docs). */
  def repetitionSignals(d: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL text coalesces to '' BEFORE the split: Spark's size(null) is -1
    // where DuckDB's len(NULL) is NULL — an unguarded null row would
    // diverge from any SQL twin (and emit a nonsense -1 token count)
    val t = d.select(col(idCol).as("doc_id"),
      split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+").as("toks"))
    val stats = t.select(col("doc_id"), size(col("toks")).as("n_tokens"),
      size(array_distinct(col("toks"))).as("n_distinct"))
    val grams = t.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .as("gram"))
    val top = grams.groupBy(col("doc_id"), col("gram")).count()
      .groupBy(col("doc_id"))
      .agg(max(col("count")).as("top_2gram_count"), sum(col("count")).as("n_2grams"))
    stats.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(lit(1.0) - col("n_distinct") / col("n_tokens").cast("double"), 4)
          .as("dup_token_frac"),
        coalesce(col("n_2grams"), lit(0L)).as("n_2grams"),
        coalesce(col("top_2gram_count"), lit(0L)).as("top_2gram_count"),
        round(coalesce(col("top_2gram_count") / col("n_2grams").cast("double"), lit(0.0)), 4)
          .as("top_2gram_frac"))
  }

  /** q69 — DETERMINISTIC train/validation/test split assignment (the
    * reproducible-holdout primitive of a training-data pipeline): each
    * document routes by the first 32 bits of md5("split:" + id) into
    * percent buckets (98/1/1). Keyed on the ID, not the content, so a
    * re-crawled or re-cleaned document keeps its split (no eval leakage
    * across pipeline versions), and engine-independent by construction
    * (md5 — the q37/q55 twin discipline). At 100 TB this is a pure
    * map-side projection: no shuffle, no state, no RNG. */
  val q69SplitAssign: Q = (spark, dir) => {
    import spark.implicits._
    val bucket = pmod(
      conv(substring(md5(concat(lit("split:"), $"doc_id".cast("string"))), 1, 8),
        16, 10).cast("long"), lit(100L))
    docs(spark, dir).select($"doc_id", bucket.as("bucket"),
      when(bucket < 98, lit("train"))
        .when(bucket === 98, lit("validation"))
        .otherwise(lit("test")).as("split"))
  }

  /** q70 — STRATIFIED CORPUS SAMPLING (the mixture-rebalancing primitive of
    * a training-data pipeline: downsample overrepresented (lang, source)
    * strata to an expected per-stratum cap, keep small strata whole).
    * Fully deterministic and engine-independent: the keep rule is
    * u32(md5("samp:" + id)) < floor(cap·2^32 / n_stratum) — an INTEGER
    * threshold, so no float boundary exists (the q24 lesson) and any
    * engine reproduces the kept set bit-for-bit.
    *
    * Scale shape: one partial-aggregated count shuffle on ~|strata| keys,
    * the tiny strata table broadcast back, then a map-side filter — at
    * 100 TB the corpus is touched twice sequentially, never shuffled by
    * row. Surface = per-stratum (n_total, threshold, n_kept): totality +
    * the exact sampling outcome under the hash oracle without shipping
    * the kept id list. */
  val q70StratifiedSample: Q = (spark, dir) => {
    import spark.implicits._
    val cap = 20L
    val d = docs(spark, dir)
    val strata = d.groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_total"))
      // `div`, not `/`: Spark's `/` is DOUBLE division, whose rounding
      // can cross an integer boundary before a cast truncates — the
      // threshold must be the exact integer quotient (cap·2^32 // n)
      .withColumn("threshold",
        least(lit(1L << 32), expr(s"${cap * (1L << 32)} div n_total")))
    val u32 = conv(substring(md5(concat(lit("samp:"), $"doc_id".cast("string"))), 1, 8),
      16, 10).cast("long")
    // no broadcast hint (r10 audit): `strata` is stratum-count-sized —
    // (lang × source) cardinality, unbounded when sources are web domains.
    // AQE runtime-converts the small case; the hint would pin a broadcast
    // no matter what the grouping produced.
    d.join(strata, Seq("lang", "source"))
      .groupBy($"lang", $"source", $"n_total", $"threshold")
      .agg(sum(when(u32 < $"threshold", 1L).otherwise(0L)).as("n_kept"))
      .select($"lang", $"source", $"n_total", $"threshold", $"n_kept")
  }

  /** q71 — SEQUENCE PACKING (context-window assembly, the GPT-style
    * pre-training prep step): documents are concatenated in deterministic
    * order and cut into fixed `budget`-token windows; each document's
    * token span maps to the window range it lands in (documents straddle
    * window boundaries by construction — that is the packing, not a bug).
    *
    * Parallel at 100 TB via HASH LANES: the corpus routes to `lanes`
    * independent streams by u32(md5(id)) — each lane's running offset is a
    * window cumsum over doc_id order WITHIN the lane, so the only
    * serialization is per-lane, and lanes scale with the cluster (the
    * all-integer surface keeps the oracle exact). A single global order
    * would put the whole corpus through one window partition — the classic
    * scale trap this shape exists to avoid. */
  val q71SequencePack: Q = (spark, dir) => {
    import spark.implicits._
    val budget = 512L
    val lanes = 8L
    val nTok = size(split(lower(trim(coalesce($"text", lit("")))), "\\s+"))
      .cast("long")
    val lane = pmod(conv(substring(md5(concat(lit("lane:"), $"doc_id".cast("string"))), 1, 8),
      16, 10).cast("long"), lit(lanes))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lane").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs(spark, dir)
      .select($"doc_id", lane.as("lane"), nTok.as("n_tokens"))
      .withColumn("end_off", sum($"n_tokens").over(w))
      .select($"doc_id", $"lane", $"n_tokens",
        ($"end_off" - $"n_tokens").as("start_off"),
        $"end_off",
        // `div`, not `/` (Spark `/` is double division; window ids must
        // be exact integer quotients)
        expr(s"(end_off - 1) div $budget - (end_off - n_tokens) div $budget + 1")
          .as("n_windows"))
  }

  /** q72 — TF-IDF top terms per document: whitespace terms → per-doc tf,
    * corpus df, top-3 terms per doc, tf·ln(N/df) attached as the score.
    *
    * The RANKING is the all-integer (tf desc, df asc, term asc) order —
    * within equal tf that IS the tf-idf order (rarer term ⇒ higher idf),
    * and it is cross-engine DECIDABLE. Ranking by the float score itself
    * would re-create the boundary class that killed the round-5 q24
    * oracle: distinct (tf, df) pairs with mathematically equal scores
    * (2·ln5 vs ln25) order differently under two engines' 1-ulp-apart ln,
    * flipping who makes the top-3 cut. The score column is the q77
    * integer-quantization shape: idf quantized to INTEGER MILLI-NATS
    * (round(1000·(ln N − ln df)), one ln per distinct df, identical in
    * both engines — ln values are irrational so the round boundary is
    * measure-zero) × the exact integer tf. The earlier round(tf·ln(N/df),
    * 4dp) form rounded an engine-computed double — the exact decimal-
    * boundary class the q77 scaladoc documents diverging (r7 ADVICE).
    *
    * Scale shape: both aggregations are partial-aggregated shuffles over
    * the token stream (the q30/q33 discipline); the df table joins back by
    * term (sort-merge, term-partitioned), and the top-3 is a per-doc
    * window over a tf-sized — not token-sized — intermediate. */
  val q72TfIdf: Q = (spark, dir) => {
    import spark.implicits._
    val d = docs(spark, dir)
    val n = d.count()
    val terms = d.select($"doc_id",
        explode(split(lower(trim(coalesce($"text", lit("")))), "\\s+")).as("term"))
    // checkpoint tf: df derives from it, and without the cut Catalyst
    // re-scans AND re-explodes the whole token stream for the df branch
    // (no CSE across aggregates — verified in the r7 plan audit). Blocks
    // are owned by the result per the BlockRelease caller-side contract.
    val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .cp()
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id")
      .orderBy($"tf".desc, $"df".asc, $"term".asc)
    tf.join(df, "term")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      // rk cast long: Spark row_number is int32 where DuckDB's is BIGINT,
      // and the driver's hash is physical-type-sensitive (the q68 lesson)
      .select($"doc_id", $"term", $"tf", $"df", $"rk".cast("long").as("rk"),
        ($"tf" * round((log(lit(n.toDouble)) - log($"df")) * 1000.0, 0).cast("long"))
          .as("score_mnats"))
  }

  /** q73 — near-duplicate CLUSTER CANONICALIZATION (the keep-one-per-
    * cluster resolution step that follows pair finding in every corpus
    * dedup pipeline): connected components over the q33 n-gram-Jaccard
    * pair set, canonical = the cluster's min doc_id, every document
    * labeled (singletons are their own canonical). Emits
    * (doc_id, canonical_id, cluster_size, kept) — the kept set is what a
    * pipeline would feed downstream; the surface is total, so a dropped
    * or doubled document is a row mismatch.
    *
    * Scale shape (r15 — the r14 verdict's composition item): the
    * canonicalization rides [[Dedup.jaccardNearDupGroups]] — the GROUP
    * form of exactly q33's relation (same source scope, threshold, n) —
    * so the pair-complete set is never materialized: exact-dup groups
    * collapse map-side, the inverted index runs on representatives
    * only, components on the rep graph, members attach via gid. Linear
    * in dup multiplicity end to end where the old q33-pairs → CC
    * composition paid C(k,2) pair rows first (and q100's manifest
    * inherited that). The group form's components equal the pair set's
    * components (the q113 collapse-equivalence argument, oracle-pinned),
    * so the output is unchanged row for row. */
  val q73DedupClusters: Q = (spark, dir) =>
    q73Memo.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$dir", {
      import spark.implicits._
      val r = Dedup.jaccardNearDupGroups(docs(spark, dir), "doc_id", "text",
          scopeCol = "source", threshold = 0.5, n = 3)
        .select($"doc_id", $"canon_id".as("canonical_id"),
          $"group_size".as("cluster_size"),
          ($"doc_id" === $"canon_id").as("kept"))
      // the group form's output frame is already checkpointed; shield
      // its blocks — q76/q100 release the frames they derive from this
      graft.util.BlockRelease.protect(r)
      r
    })

  /** Session memo for q73's canonicalization (r16 verdict item 3): q76
    * composes it and q100's manifest rebuilds the exact same relation
    * (`TextQueries.scala` q76/q100 both call [[q73DedupClusters]]), so
    * one bench/verify session paid the full group-dedup machinery three
    * times for a deterministic result. Keyed on (applicationId, dir) —
    * the [[graft.graph.Projection]] session-cache precedent; the cached
    * frame's checkpoint blocks are [[graft.util.BlockRelease.protect]]ed
    * so callers releasing DERIVED frames can't destroy the memo, and
    * eviction unprotects before releasing. Semantics unchanged: the
    * testdata dirs are immutable within a session. */
  private val q73Memo = new graft.util.BoundedSessionCache[String,
      org.apache.spark.sql.DataFrame](maxEntries = 2, df => {
    graft.util.BlockRelease.unprotect(df)
    graft.util.BlockRelease.release(df)
  })

  /** q75 — FILTER CASCADE (the C4/Gopher-style keep/drop verdict that
    * integrates the rule family: length bounds, duplicate-token fraction,
    * punctuation ratio, stopword floor — first failing rule names the
    * verdict, evaluation order fixed). Pure map-side: every rule reads
    * one document, no shuffle at any scale. Every float compared to a
    * threshold is computed with the IDENTICAL op order in both engines
    * (the q31/q68 fragments), so no keep/drop decision sits on an
    * engine-dependent boundary. */
  val q75FilterCascade: Q = (spark, dir) => {
    import spark.implicits._
    // coalesce(text,'') — the repo-wide tokenization convention (q30/q72/
    // q77): without it a NULL text propagates NULL n_tokens through every
    // rule and both engines fall through the CASE to 'keep', classifying
    // a null document keep-worthy (r7 ADVICE). Empty splits to [""] →
    // n_tokens = 1 → 'too_short', the verdict a null doc should get.
    val txt = coalesce($"text", lit(""))
    val toks = split(lower(trim(txt)), "\\s+")
    val nTok = size(toks).cast("long")
    val dupFrac = lit(1.0) - size(array_distinct(toks)) / nTok.cast("double")
    val stop = stopwordRatio(txt)
    val punct = punctRatio(txt)
    val verdict = when(nTok < 10, lit("too_short"))
      .when(nTok > 1000, lit("too_long"))
      .when(dupFrac > 0.3, lit("dup_tokens"))
      .when(punct > 0.3, lit("high_punct"))
      .when(stop < 0.01, lit("low_stopword"))
      .otherwise(lit("keep"))
    docs(spark, dir).select($"doc_id", nTok.as("n_tokens"),
      verdict.as("verdict"), (verdict === "keep").as("kept"))
  }

  /** q76 — SPLIT-LEAKAGE AUDIT (the eval-hygiene composition: near-dup
    * cluster members assigned to DIFFERENT holdout splits leak training
    * content into evaluation — the classic contamination pitfall an
    * id-keyed split alone cannot prevent). Composes two already-oracled
    * surfaces: q73's dedup clusters × q69's split assignment; a cluster
    * spanning >1 split is leaky, and every non-train document inside one
    * is a contaminated eval document. One summary row, all-integer.
    *
    * Scale shape: both inputs are corpus-sized single-pass frames; the
    * audit is one cluster-keyed partial aggregation + one summary agg —
    * nothing pairwise. */
  val q76SplitLeakage: Q = (spark, dir) => {
    import spark.implicits._
    val clusters = q73DedupClusters(spark, dir).select($"doc_id", $"canonical_id")
    val splits = q69SplitAssign(spark, dir).select($"doc_id", $"split")
    val j = clusters.join(splits, "doc_id")
    val per = j.groupBy($"canonical_id")
      .agg(count(lit(1)).as("sz"),
        countDistinct($"split").as("n_splits"),
        sum(when($"split" =!= "train", 1L).otherwise(0L)).as("n_eval"))
    per.agg(
      count(lit(1)).as("n_clusters"),
      sum(when($"n_splits" > 1, 1L).otherwise(0L)).as("n_leaky_clusters"),
      coalesce(sum(when($"n_splits" > 1, $"sz")), lit(0L)).as("n_docs_in_leaky"),
      coalesce(sum(when($"n_splits" > 1, $"n_eval")), lit(0L)).as("n_eval_docs_leaked"))
  }

  /** q77 — UNIGRAM SURPRISAL scoring (the model-free twin of perplexity
    * filtering: documents whose tokens are improbable under the corpus's
    * own unigram distribution are the gibberish/boilerplate tail; real
    * pipelines use an LM, this uses the corpus itself — no model in the
    * container, same shape). Per token, surprisal = −ln(count(term)/
    * total_tokens); per document, the mean over its tokens.
    *
    * DECIDABILITY — the float-aggregation trap and its fix: a cross-row
    * SUM of doubles has engine- (and partition-)dependent order, so its
    * last ulps are not reproducible — the one float shape no op-order
    * mirroring can pin. Each term's surprisal is therefore quantized to
    * INTEGER MILLI-NATS (round(1000·(ln(N)−ln(c))), one ln per DISTINCT
    * term, identical in both engines) and the per-doc aggregation sums
    * integers — associative, order-free, exact. The reported mean is
    * derived from that exact integer sum.
    *
    * Scale shape: unigram counts are one partial-agg shuffle over the
    * token stream; the vocabulary joins back by term; the per-doc sum is
    * a second partial-agg shuffle. Nothing pairwise, nothing collected. */
  val q77UnigramSurprisal: Q = (spark, dir) => {
    import spark.implicits._
    val terms = docs(spark, dir).select($"doc_id",
        explode(split(lower(trim(coalesce($"text", lit("")))), "\\s+")).as("term"))
      .cp() // two aggregations read it; never tokenize twice
    val totalTokens = terms.count()
    val vocab = terms.groupBy($"term").agg(count(lit(1)).as("c"))
      .select($"term",
        round((log(lit(totalTokens.toDouble)) - log($"c")) * 1000.0, 0)
          .cast("long").as("mnats"))
    terms.join(vocab, "term")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"mnats").as("sum_mnats"))
      // the mean stays INTEGER (micro-nats/token, exact `div`): a float
      // mean of quantized integers lands on exact .xxxx5 decimal
      // boundaries by construction (e.g. 40833/12000 = 3.402750), and
      // DuckDB's round() was measured rounding 3.4027499999999997 UP
      // where BigDecimal HALF_UP rounds down — the one disagreement in
      // 5500 rows at the first attempt. Integer division cannot disagree.
      .select($"doc_id", $"n_tokens", $"sum_mnats",
        expr("(sum_mnats * 1000) div n_tokens").as("avg_unats"))
  }

  /** q80 — BEST-FIT-DECREASING SEQUENCE PACKING
    * ([[graft.operators.Packing.bestFitPack]]): q71's whole-document
    * sibling — documents stay intact, each lane packs its docs (sorted
    * eff desc, id asc) into 512-token bins best-fit-first with an
    * 8-open-bin streaming bound. Same md5 hash lanes, same all-integer
    * surface; the ENTIRE placement is deterministic integer arithmetic,
    * so the DuckDB oracle replays the exact fold as a recursive CTE (one
    * placement per lane per iteration, parallel id/residual lists as
    * state) and every (doc → bin) assignment is hash-pinned at every
    * SF. Waste accounting vs q71 lives in PackingSpec + BENCH_LOCAL. */
  val q80SequencePackBfd: Q = (spark, dir) => {
    import spark.implicits._
    val nTok = size(split(lower(trim(coalesce($"text", lit("")))), "\\s+"))
      .cast("long")
    val lane = pmod(conv(substring(md5(concat(lit("lane:"), $"doc_id".cast("string"))), 1, 8),
      16, 10).cast("long"), lit(8L))
    graft.operators.Packing.bestFitPack(
      docs(spark, dir).select($"doc_id", lane.as("lane"), nTok.as("n_tokens")),
      budget = 512L, maxOpen = 8)
  }

  /** q82 — CORPUS-WIDE SPAN DEDUP (the C4 §2.2 step, adapted: C4 removes
    * all-but-one occurrence of any repeated three-sentence span across
    * the whole corpus — the boilerplate/header/disclaimer scrub. These
    * docs are flat token streams, so the span unit is a fixed 5-token
    * window). Every span occurrence except the FIRST (min (doc_id,
    * span_idx)) of its md5 group is removed; surface per doc (TOTAL):
    * n_spans, n_dup_spans removed, and md5 of the surviving text — a
    * wrongly kept or dropped span anywhere in the corpus flips a hash.
    *
    * Distinct from the rest of the dedup family: q32 is whole-doc exact,
    * q33/35/36/24 are whole-doc near-dup, q68 is WITHIN-doc repetition —
    * this is CROSS-doc sub-document redundancy removal.
    *
    * Scale shape: spans explode map-side; the keep/remove decision is
    * ONE corpus-wide window over span-hash partitions (shuffle ∝ spans,
    * the q30/q33 token-stream discipline); reconstruction is a per-doc
    * partial aggregation. Nothing pairwise. */
  val q82SpanDedup: Q = (spark, dir) => {
    import spark.implicits._
    val k = 5
    val toks = split(lower(trim(coalesce($"text", lit("")))), "\\s+")
    val spans = docs(spark, dir)
      .select($"doc_id", toks.as("toks"))
      .select($"doc_id", posexplode(
        // `div`, not `/` (Spark `/` is double division — the q71 lesson)
        transform(sequence(lit(0), expr(s"(size(toks) + ${k - 1}) div $k - 1")),
          i => array_join(slice($"toks", i * k + 1, lit(k)), " "))))
      .select($"doc_id", $"pos".cast("long").as("span_idx"), md5($"col").as("h"), $"col".as("span"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"h").orderBy($"doc_id".asc, $"span_idx".asc)
    val marked = spans.withColumn("rn", row_number().over(w))
    marked.groupBy($"doc_id").agg(
      count(lit(1)).as("n_spans"),
      sum(when($"rn" > 1, 1L).otherwise(0L)).as("n_dup_spans"),
      md5(array_join(
        transform(
          array_sort(collect_list(when($"rn" === 1, struct($"span_idx", $"span")))),
          x => x.getField("span")),
        " ")).as("kept_md5"))
  }

  /** q83 — VARIABLE-LENGTH LONG-REPEAT SPAN DEDUP (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" §3 —
    * the production boilerplate scrub q82 approximates with disjoint
    * fixed windows: remove every occurrence-after-the-first of any
    * repeated token run of length ≥ k, at ANY offset and ANY length).
    *
    * Banded fixed-k seed + extend-and-merge (the r8 VERDICT's recipe;
    * suffix arrays don't distribute, overlapping k-gram seeds do):
    *
    *  1. SEED: every OVERLAPPING k-token window (start s ∈ [0, n−k]),
    *     hashed — a repeat of length L ≥ k is exactly a run of L−k+1
    *     consecutive repeated windows, so no repeat ≥ k can escape.
    *  2. FLAG: one corpus-wide ordered window over the hash — any
    *     occurrence with row_number > 1 (order (doc_id, s): the
    *     canonical first occurrence keeps its text, the Lee et al.
    *     all-but-one rule) marks its k tokens for removal.
    *  3. EXTEND-AND-MERGE: per doc, flagged [s, s+k) intervals merge
    *     into maximal disjoint spans (running-max window + group-id
    *     prefix sum — overlapping seeds of one long repeat collapse to
    *     ONE interval, which is what makes the removed region exactly
    *     the maximal repeat, not a k-aligned approximation).
    *  4. RECONSTRUCT: merged intervals explode to covered positions
    *     (disjoint ⇒ ≤ n_tokens rows), anti-marked against the token
    *     stream, per-doc ordered rebuild.
    *
    * Surface per doc (TOTAL): n_tokens, n_removed, kept_md5 — one
    * wrongly kept/removed token anywhere flips a hash. Scale shape:
    * every stage shuffles ∝ windows ≈ tokens (seed window, doc-local
    * merge, position join); nothing pairwise, no suffix structure. */
  val q83LongRepeatDedup: Q = (spark, dir) => {
    import spark.implicits._
    val k = 8
    val toksCol = split(lower(trim(coalesce($"text", lit("")))), "\\s+")
    // two consumers (seed windows, token reconstruction): stage the
    // tokenization once (the q37/q24 checkpoint discipline)
    val base = docs(spark, dir)
      .select($"doc_id", toksCol.as("toks")).cp()
    val starts = when(size($"toks") >= k,
      sequence(lit(0), size($"toks") - k)).otherwise(array())
    val wins = base.select($"doc_id", explode(
        transform(starts, s =>
          struct(s.cast("long").as("s"),
            md5(array_join(slice($"toks", s + 1, lit(k)), " ")).as("h"))))
        .as("w"))
      .select($"doc_id", $"w.s".as("s"), $"w.h".as("h"))
    val ow = org.apache.spark.sql.expressions.Window
      .partitionBy($"h").orderBy($"doc_id".asc, $"s".asc)
    val rem = wins.withColumn("rn", row_number().over(ow))
      .filter($"rn" > 1).select($"doc_id", $"s")
    val dw = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"s".asc)
    val iv = rem
      .withColumn("pme", max($"s" + lit(k.toLong))
        .over(dw.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("grp", sum(when($"pme".isNull || $"s" >= $"pme", 1L).otherwise(0L))
        .over(dw.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"grp")
      .agg(min($"s").as("a"), (max($"s") + lit(k.toLong)).as("b"))
    val cov = iv.select($"doc_id", explode(sequence($"a", $"b" - 1)).as("p"))
      .withColumn("covered", lit(1))
    base.select($"doc_id", posexplode($"toks"))
      .select($"doc_id", $"pos".cast("long").as("p"), $"col".as("tok"))
      .join(cov, Seq("doc_id", "p"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"covered".isNotNull, 1L).otherwise(0L)).as("n_removed"),
        md5(array_join(
          transform(
            array_sort(collect_list(when($"covered".isNull, struct($"p", $"tok")))),
            x => x.getField("tok")),
          " ")).as("kept_md5"))
  }

  /** q85 — BLOCKLIST / BADWORDS SCRUB (the C4 cleanup rule, Raffel et
    * al. 2020 §2.2: drop any document containing a term from a
    * blocklist; here
    * [[graft.functions.TextFunctions.defaultBlocklist]]). The registered
    * surface keeps the TOTAL shape (every doc, hit counts + verdict) so
    * the oracle pins both kept and dropped sides. MAP-ONLY — the term
    * set is a plan literal, no shuffle, no UDF; the six-figure-phrase
    * production tier is documented at
    * [[graft.functions.TextFunctions.blocklistHits]]. */
  val q85Blocklist: Q = (spark, dir) => {
    import spark.implicits._
    docs(spark, dir).select(
      $"doc_id",
      blocklistHits($"text").cast("long").as("n_hits"),
      blocklistDistinctHits($"text").cast("long").as("n_distinct_hits"),
      (blocklistHits($"text") > 0).as("blocked"))
  }

  /** q87 — COUNT-MIN-SKETCH frequency estimates
    * ([[graft.functions.CmsSketch]]): the mergeable-summary tier for
    * token frequencies when the exact vocabulary groupBy stops being
    * shuffle-friendly (100 TB vocab ∝ corpus; the d×w grid is constant).
    * Partial aggregation IS the per-partition sketch; the exchange moves
    * ≤ d·w summary rows per partition, never tokens. Probed for 12 fixed
    * tokens (10 present incl. collision-prone high-frequency ones + 2
    * absent) against the EXACT count of the same probes, with the CMS
    * admissibility guarantee (est ≥ true, always) as a decidable
    * column. md5-derived hash rows ⇒ the grid and every estimate replay
    * bit-for-bit in DuckDB — a fully EXACT oracle over an approximate
    * operator (the q55/KMV discipline). */
  val q87Cms: Q = (spark, dir) => {
    import spark.implicits._
    import graft.functions.CmsSketch
    val probes = Seq("filter", "batch", "scan", "hash", "customer", "merge",
      "stream", "slow", "the", "spark", "zebraquux", "notoken")
    val toks = docs(spark, dir)
      .select(explode(tokens($"text")).as("tok"))
      // two consumers (grid, exact truth): tokenize once
      .cp()
    val grid = CmsSketch.sketch(toks, "tok")
    val est = CmsSketch.estimates(grid, probes.toDF("token"), "token")
    val truth = toks.filter($"tok".isin(probes: _*))
      .groupBy($"tok".as("token")).agg(count(lit(1)).as("true_count"))
    val r = est.join(truth, Seq("token"), "left")
      .select($"token", $"est_count",
        coalesce($"true_count", lit(0L)).as("true_count"),
        ($"est_count" >= coalesce($"true_count", lit(0L))).as("admissible"))
      .cp()
    graft.util.BlockRelease.release(toks)
    r
  }

  /** q88 — HYPERLOGLOG distinct-count sketch
    * ([[graft.functions.HllSketch]]): the third leg of the
    * mergeable-summary tier (KMV q55 = distinct sample, CMS q87 =
    * frequency grid, HLL = cardinality registers). At 100 TB the exact
    * vocabulary COUNT(DISTINCT) shuffles every term; the 512-register
    * table is a fixed-size summary whose map-side combine (per-partition
    * max per bucket) IS the sketch merge. md5-derived 60-bit hash and an
    * INTEGER harmonic denominator (Σ 2^(52−M[b]), exact in BIGINT) make
    * the whole surface — registers, denominator, the single-division
    * estimate, the milli-relative error vs the exact count — replay
    * bit-for-bit in DuckDB: a fully EXACT oracle over an approximate
    * operator. */
  val q88Hll: Q = (spark, dir) => {
    import spark.implicits._
    import graft.functions.HllSketch
    val toks = docs(spark, dir)
      .select(explode(tokens($"text")).as("tok"))
      // two consumers (registers, exact truth): tokenize once
      .cp()
    val s = HllSketch.summary(HllSketch.registers(toks, "tok"))
    val truth = toks.agg(countDistinct($"tok").as("true_distinct"))
    val r = s.crossJoin(truth)
      .select($"m", $"v_zero", $"s_harm", $"est_hll", $"true_distinct",
        expr("CAST((1000 * abs(est_hll - true_distinct)) DIV true_distinct AS BIGINT)")
          .as("err_milli"),
        $"lc_range")
      .cp()
    graft.util.BlockRelease.release(toks)
    r
  }

  /** q89 — DSIR-style IMPORTANCE WEIGHTS (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by the log-likelihood ratio of a TARGET unigram
    * model (here the `lang='en'` slice — domain selection) vs the RAW
    * corpus model, both over HASHED n-gram features so the model is a
    * FIXED-SIZE table (4096 buckets) instead of an open vocabulary —
    * which is the whole 100 TB point: the model broadcasts (≤4096 rows),
    * docs are scored map-side, and the only shuffles are the two
    * token-stream partial aggregations (bucket counts, per-doc sums).
    * Laplace-smoothed: λ(b) = ln((ct+1)/(Nt+B)) − ln((cr+1)/(Nr+B)).
    *
    * DECIDABILITY: per-bucket λ is quantized to integer milli-nats (one
    * ln per DISTINCT bucket, identical op order in both engines — the
    * q77 discipline) and per-doc aggregation sums integers, so the
    * cross-row float-sum trap never opens. */
  val q89Dsir: Q = (spark, dir) => {
    import spark.implicits._
    val B = 4096
    val tokd = docs(spark, dir)
      .select($"doc_id", $"lang", explode(tokens($"text")).as("tok"))
      .select($"doc_id", $"lang",
        (conv(substring(md5(concat(lit("dsir:"), $"tok")), 1, 8), 16, 10)
          .cast("long") % B).as("b"))
      // four consumers (raw counts, target counts, totals, scoring):
      // tokenize+hash once
      .cp()
    val raw = tokd.groupBy($"b").agg(count(lit(1)).as("cr"))
    val tgt = tokd.filter($"lang" === "en").groupBy($"b").agg(count(lit(1)).as("ct"))
    val nt = tokd.filter($"lang" === "en").agg(count(lit(1)).as("nt"))
    val nr = tokd.agg(count(lit(1)).as("nr"))
    val dict = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select($"b",
        round((log(coalesce($"ct", lit(0L)) + 1) - log($"nt" + B)
          - log($"cr" + 1) + log($"nr" + B)) * 1000).cast("long").as("mnats"))
    val r = tokd.join(broadcast(dict), Seq("b"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"mnats").as("sum_mnats"))
      .select($"doc_id", $"n_tokens", $"sum_mnats",
        ($"sum_mnats" > 0).as("selected"))
      .cp()
    graft.util.BlockRelease.release(tokd)
    r
  }

  /** q90 — SLIDING-WINDOW CHUNKING with overlap (the RAG / context-window
    * sequence-prep operator: fixed 64-token chunks, 16-token overlap,
    * stride 48; a trailing fragment wholly contained in the previous
    * chunk's tail is suppressed). Map-only over the document stream —
    * explode(sequence(...)) fans each doc into its chunk index range, the
    * chunk text is a slice of the ONE tokenization, and the output is
    * keyed (doc_id, chunk_id) with an md5 content surface so every chunk
    * boundary replays exactly. No shuffle at all: chunking at 100 TB is
    * embarrassingly parallel and the plan must say so. */
  val q90ChunkOverlap: Q = (spark, dir) => {
    import spark.implicits._
    val C = 64; val O = 16; val S = C - O
    docs(spark, dir)
      .select($"doc_id", tokens($"text").as("toks"))
      .select($"doc_id", $"toks", size($"toks").as("n"))
      .select($"doc_id", $"toks", $"n",
        explode(sequence(lit(0L), floor(($"n" - 1) / S))).as("k"))
      .select($"doc_id", $"toks", $"n", $"k", ($"k" * S).as("start"))
      .filter($"start" === 0 || ($"n" - $"start") > O)
      .select($"doc_id", $"k".as("chunk_id"), $"start".as("start_tok"),
        least(lit(C.toLong), $"n" - $"start").as("chunk_len"),
        md5(concat_ws(" ", slice($"toks", ($"start" + 1).cast("int"), lit(C))))
          .as("chunk_md5"))
  }

  /** q95 — BIGRAM-LM SURPRISAL (the conditional-probability upgrade of
    * q77's unigram filter — the real perplexity-filter shape: documents
    * whose token TRANSITIONS are improbable under the corpus's own
    * bigram model are the word-salad tail unigram stats can't see).
    * Add-1 smoothed: s(w1w2) = −ln((c12+1)/(c1+V)), quantized to
    * integer milli-nats per DISTINCT bigram (one ln each, identical op
    * order — the q77 discipline) so per-doc aggregation is an order-free
    * integer sum.
    *
    * Scale shape: bigrams are built from the token ARRAY map-side (no
    * position self-join); counts are two partial-agg shuffles (c12, and
    * c1 = Σ_w2 c12 aggregated from the DICT, never re-scanning the
    * stream); scoring joins the stream to the dict on (w1, w2) — the
    * q72 tf/df pattern. Tokenize-once checkpoint, scratch released. */
  val q95BigramSurprisal: Q = (spark, dir) => {
    import spark.implicits._
    val t = docs(spark, dir)
      .select($"doc_id", tokens($"text").as("toks"))
      .cp()
    val big = t.select($"doc_id",
        explode(when(size($"toks") >= 2,
          transform(sequence(lit(1), size($"toks") - 1),
            i => struct(element_at($"toks", i).as("w1"),
              element_at($"toks", i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
      // three consumers (c12, scoring join, per-doc counts): build once
      .cp()
    val vocab = t.select(explode($"toks").as("tok"))
      .agg(countDistinct($"tok").as("v"))
    val c12 = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
    val dict = c12.join(c1, "w1").crossJoin(broadcast(vocab))
      .select($"w1", $"w2",
        round((log($"c1" + $"v") - log($"c12" + 1)) * 1000).cast("long").as("mnats"))
    val scored = big.join(dict, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"mnats").as("sum_mnats"))
    val r = t.select($"doc_id").join(scored, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
        coalesce($"sum_mnats", lit(0L)).as("sum_mnats"),
        expr("CAST(CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0 " +
          "ELSE (sum_mnats * 1000) DIV n_bigrams END AS BIGINT)").as("avg_unats"))
      .cp()
    graft.util.BlockRelease.release(t)
    graft.util.BlockRelease.release(big)
    r
  }

  /** q98 — INCREMENTAL INGEST DEDUP ([[graft.dedup.Dedup
    * .incrementalIngestGate]]): the production crawl-increment gate —
    * the NEW batch (doc_id % 10 = 3, a ~10% increment) dedups AGAINST
    * the existing store only; the store is never re-paired with itself.
    * Exact tier (normalized-md5 semi-join) + near tier (distinct 8-gram
    * inverted-index overlap, rational ≥½ threshold). At 100 TB this is
    * the difference between work ∝ increment and work ∝ corpus². */
  val q98IncrementalDedup: Q = (spark, dir) =>
    Dedup.incrementalIngestGate(docs(spark, dir), "doc_id", "text",
      isNew = col("doc_id") % 10 === 3)

  /** q111 — the INDEXED streaming ingest gate under the driver oracle
    * (r13 verdict item 6: q98 exercises the batch full-scan tier; this
    * twin exercises [[graft.dedup.IngestIndex.gateWithIndex]], the
    * headline r13 component, end-to-end): the existing-corpus slice is
    * bootstrapped into a REAL on-disk fingerprint store WITH idx/bloom
    * sidecar partitions ([[graft.streaming.Streams.bootstrapIngestStore]]
    * — the exact store layout the streaming sink maintains), and the new
    * slice (doc_id % 10 = 3, q98's split) is gated through the sidecars:
    * bloom probe → shard-pruned exact verify → the SAME verdict tail.
    * Verdicts are identical to q98's by the gate's no-false-negative /
    * exact-verify argument, so the ORACLE IS q98's SQL — which is
    * exactly the point: the index must be invisible in the answer.
    * Each run re-bootstraps the store in place, so a warm re-run (the
    * bench protocol runs every query twice per session) also exercises
    * the r14 re-bootstrap bloom-cache eviction under the oracle. */
  val q111IndexedIngestGate: Q = (spark, dir) => {
    val d = docs(spark, dir)
    // session-unique store path (r15 ADVICE: a fixed dataset-keyed path
    // leaked across sessions and let two concurrent benches race on the
    // in-place re-bootstrap), deleted below once the verdict frame is
    // checkpoint-materialized — each call re-bootstraps BY DESIGN so a
    // warm bench re-run exercises the bloom-cache eviction path under
    // the oracle
    val store = System.getProperty("java.io.tmpdir") +
      "/graft_q111_store_" + java.util.UUID.randomUUID().toString
    val t0 = System.nanoTime()
    graft.streaming.Streams.bootstrapIngestStore(
      d.filter(col("doc_id") % 10 =!= 3), "doc_id", "text", store)
    val t1 = System.nanoTime()
    val fp = Dedup.docSigGrams(
      d.filter(col("doc_id") % 10 === 3), "doc_id", "text", 8)
    val v = graft.dedup.IngestIndex.gateWithIndex(fp, store, None)
    val t2 = System.nanoTime()
    // stage split for the bench ledger (r14 verdict: the headline q111
    // number is mostly store-build, not gating)
    System.err.println(
      f"q111 stage split: bootstrap ${(t1 - t0) / 1e9}%.2f s  " +
      f"gate ${(t2 - t1) / 1e9}%.2f s")
    // the verdict frame is checkpoint-materialized; drop the transient
    // store's session bloom frame and the store itself so a one-shot
    // oracle run pins nothing and leaves nothing behind
    graft.dedup.IngestIndex.releaseStoreCaches(spark, store)
    try org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(store))
    catch { case _: Exception => () }
    v
  }

  /** q105 — DSIR IMPORTANCE RESAMPLING (Xie et al. 2023 §2, the draw
    * the q89 weights exist FOR; NEW r10): sample k = 100 documents
    * WITHOUT replacement with P ∝ exp(weight) via the Gumbel-top-k
    * identity — key(doc) = sum_mnats + round(1000·g), g = −ln(−ln(u))
    * with u from the doc's md5 (deterministic, u ∈ (0,1) by the +0.5
    * offset), winners = top-k by (key DESC, doc_id). ONE
    * TakeOrderedAndProject over q89's output — per-partition heaps +
    * driver merge, no global sort, nothing new corpus-sized. The
    * milli-nat quantization keeps the q77/q89 cross-engine ln-parity
    * discipline: both engines round the one ln composition to the same
    * integer key. */
  val q105DsirResample: Q = (spark, dir) => {
    import spark.implicits._
    val w = q89Dsir(spark, dir)
    val u = (conv(substring(md5(concat(lit("dsir-s:"), $"doc_id".cast("string"))),
      1, 8), 16, 10).cast("double") + 0.5) / 4294967296.0
    val r = w.select($"doc_id", $"sum_mnats",
        ($"sum_mnats" + round(lit(-1000.0) * log(-log(u))).cast("long")).as("gkey"))
      .orderBy($"gkey".desc, $"doc_id".asc)
      .limit(100)
      .cp()
    graft.util.BlockRelease.release(w)
    r
  }

  /** q99 — CCNet-STYLE CORPUS TIERS (Wenzek et al. 2020 §4.3: split the
    * corpus into head/middle/tail by LM perplexity terciles; here the
    * model-free q77 surprisal stands in for the LM, per the q77
    * scaladoc). The SCALE-honest threshold path: tercile cutoffs come
    * from a 256-doc md5-KMV sample ([[graft.functions.KmvQuantile]] —
    * one TakeOrderedAndProject), BROADCAST, and every doc tiers map-side
    * — never the global NTILE sort a naive formulation pays at 100 TB.
    * Integer surface throughout (milli-nat scores, ceil-rank cutoffs). */
  val q99CcnetTiers: Q = (spark, dir) => {
    import spark.implicits._
    import graft.functions.KmvQuantile
    val scored = q77UnigramSurprisal(spark, dir) // checkpointed by q77
    val keyed = scored.select($"doc_id", $"avg_unats",
      conv(substring(md5(concat(lit("cc:"), $"doc_id")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val qs = KmvQuantile.quantiles(keyed, "h", "avg_unats",
      k = 256, pcts = Seq(33, 67))
    val thr = qs.agg(
      max(when($"pct" === 33, $"est_value")).as("t33"),
      max(when($"pct" === 67, $"est_value")).as("t67"))
    val r = scored.crossJoin(broadcast(thr))
      .select($"doc_id", $"avg_unats",
        when($"avg_unats" <= $"t33", "head")
          .when($"avg_unats" <= $"t67", "middle")
          .otherwise("tail").as("tier"))
      .cp()
    graft.util.BlockRelease.release(scored)
    r
  }

  /** q100 — the END-TO-END TRAINING-DATA PIPELINE MANIFEST: the proof
    * that the operators compose — every document carries its full
    * curation verdict in one frame: quality cascade (q75) ∧ dedup
    * canonicalization (q73) ∧ ¬decontamination (q66) ∧ ¬benchmark,
    * with the CCNet tier (q99) for mixture weighting and the holdout
    * split (q69). Five doc_id equi-joins over already-audited stages —
    * the composition adds NO new shuffle class; its oracle is each
    * stage's oracle verbatim, joined (so a regression in any stage
    * fails here too). */
  val q100Pipeline: Q = (spark, dir) => {
    import spark.implicits._
    val p = q75FilterCascade(spark, dir).select($"doc_id", $"kept".as("quality_kept"))
    val c = q73DedupClusters(spark, dir).select($"doc_id", $"kept".as("dedup_kept"))
    val x = q66Decontaminate(spark, dir).select($"doc_id", $"contaminated")
    val s = q69SplitAssign(spark, dir).select($"doc_id", $"split")
    val t = q99CcnetTiers(spark, dir).select($"doc_id", $"tier")
    val r = docs(spark, dir)
      .select($"doc_id", ($"doc_id" % 97 === 0).as("is_benchmark"))
      .join(p, "doc_id").join(c, "doc_id")
      .join(x, Seq("doc_id"), "left") // benchmark docs absent from q66
      .join(s, "doc_id").join(t, "doc_id")
      .select($"doc_id", $"is_benchmark", $"quality_kept", $"dedup_kept",
        coalesce($"contaminated", lit(false)).as("contaminated"),
        $"tier", $"split",
        ($"quality_kept" && $"dedup_kept" &&
          !coalesce($"contaminated", lit(false)) && !$"is_benchmark")
          .as("selected"))
      .cp()
    Seq(p, c, x, s, t).foreach(graft.util.BlockRelease.release)
    r
  }

  /** q103 — BPE TOKENIZER TRAINING (Sennrich et al. 2016 — the trainer
    * behind q63's BPE-ish segmenter; NEW r10): learn the first N merge
    * rules from the corpus by iterated most-frequent-adjacent-pair
    * merging. The SCALE-honest shape is the standard word-frequency
    * trick: the corpus is read ONCE (tokenize → vocabulary (word, freq)
    * aggregation — the only corpus-sized pass); every training round
    * then works on the VOCAB-sized frame: one partial-agg pair count +
    * one TakeOrdered(1) for the best pair, and the merge applies
    * map-side via the per-round-constant [[graft.functions
    * .TextExpressions.bpe_merge_once]] kernel (no join, no shuffle). At
    * 100 TB rounds cost vocabulary, not corpus.
    *
    * DECIDABILITY: integer frequencies, strict (count DESC, left, right)
    * tie order, and greedy left-to-right non-overlapping merge semantics
    * that the oracle replays exactly via the run-parity window
    * formulation (unrolled per round — see the oracle builder). Surface:
    * (round, left_tok, right_tok, merged_count) for N = 8 rounds. */
  /** Shared BPE trainer (q103/q104): N merge rounds over the word-
    * frequency dict. Returns the merge log and the fully-merged vocab
    * frame (w, f, ts) — the caller owns the returned frame's checkpoint
    * blocks. */
  private def bpeTrain(spark: SparkSession, dir: String, rounds: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    import spark.implicits._
    import graft.functions.TextExpressions.bpe_merge_once
    val wf = docs(spark, dir)
      .select(explode(split(lower(trim(coalesce($"text", lit("")))), "\\s+")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .select($"w", $"f", split($"w", "").as("ts"))
      .cp() // vocab-sized; EVERY round reads it
    var words = wf
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = words.filter(size($"ts") >= 2)
        .select($"f", explode(expr(
          "transform(sequence(1, size(ts) - 1), " +
            "i -> struct(element_at(ts, i) AS a, element_at(ts, i + 1) AS b))")).as("p"))
        .groupBy($"p.a", $"p.b").agg(sum($"f").as("c"))
        .orderBy($"c".desc, $"a".asc, $"b".asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r.toLong, a, b, c))
        // map-side application; plan depth grows one Project per round
        // over the checkpointed vocab — 8 rounds, no re-checkpoint needed
        words = words.select($"w", $"f", bpe_merge_once($"ts", a, b).as("ts"))
        r += 1
      }
    }
    (merges.toSeq, words)
  }

  val q103BpeTrain: Q = (spark, dir) => {
    import spark.implicits._
    val (merges, vocab) = bpeTrain(spark, dir, rounds = 8)
    val out = merges.toDF("round", "left_tok", "right_tok", "merged_count")
    graft.util.BlockRelease.release(vocab)
    out
  }

  /** q104 — TOKEN-BUDGET ACCOUNTING UNDER THE TRAINED TOKENIZER (NEW
    * r10, the q103 → corpus application): every document's token count
    * under the 8 learned BPE merges. The key scale move: merges apply
    * PER WORD TYPE, so the trained vocab (w → merged token list) is the
    * only thing that ever re-tokenizes — documents just join their word
    * instances to it (corpus-sized stream ⋈ vocab-sized dict, AQE picks
    * broadcast while the vocab fits, shuffle when it doesn't) and SUM
    * per-word token counts. No per-document merge replay exists
    * anywhere. Surface: (doc_id, n_words, n_chars, n_bpe_tokens), total
    * over documents (empty/null docs emit zeros). */
  val q104BpeTokenize: Q = (spark, dir) => {
    import spark.implicits._
    val (_, vocab) = bpeTrain(spark, dir, rounds = 8)
    val dict = vocab.select($"w", length($"w").cast("long").as("nc"),
      size($"ts").cast("long").as("nt"))
    val agg = docs(spark, dir)
      .select($"doc_id",
        explode(split(lower(trim(coalesce($"text", lit("")))), "\\s+")).as("w"))
      .filter($"w" =!= "")
      .join(dict, "w")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("nw"), sum($"nc").as("nch"), sum($"nt").as("nbt"))
    val out = docs(spark, dir).select($"doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"nw", lit(0L)).as("n_words"),
        coalesce($"nch", lit(0L)).as("n_chars"),
        coalesce($"nbt", lit(0L)).as("n_bpe_tokens"))
      .cp()
    graft.util.BlockRelease.release(vocab)
    out
  }

  /** The q103 oracle, generated: one pair-count + best-pair stage per
    * round, with the merge applied through the NON-recursive run-parity
    * window formulation — consecutive matching positions only exist when
    * left = right, and the greedy scan keeps even offsets within each
    * run of consecutive matches, so `(p − min(p) over run) % 2 = 0`
    * selects exactly the kernel's picks. Validated against an
    * independent reference implementation before landing. */
  private def bpeOracle(rounds: Int): String = {
    def pairs(r: Int) =
      s"""pr$r AS (SELECT ts[i] AS a, ts[i + 1] AS b, sum(f)::BIGINT AS c
         |  FROM tok${r - 1}, unnest(range(1, len(ts))) AS u(i) GROUP BY 1, 2),
         |best$r AS (SELECT a, b, c FROM pr$r ORDER BY c DESC, a, b LIMIT 1)""".stripMargin
    def stage(r: Int) =
      s"""ex$r AS (SELECT word, f, len(ts) AS n, ts, u.p
         |  FROM tok${r - 1}, unnest(range(1, len(ts) + 1)) AS u(p)),
         |mk$r AS (SELECT e.word, e.f, e.n, e.ts, e.p,
         |    (e.p < e.n AND e.ts[e.p] = b.a AND e.ts[e.p + 1] = b.b) AS m
         |  FROM ex$r e CROSS JOIN best$r b),
         |sel$r AS (SELECT word, f, ts, p, m,
         |    m AND ((p - min(p) OVER (PARTITION BY word, g, m)) % 2 = 0) AS s
         |  FROM (SELECT *, p - sum(CASE WHEN m THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY word ORDER BY p ROWS UNBOUNDED PRECEDING) AS g
         |    FROM mk$r)),
         |tok$r AS (SELECT word, f, list(CASE WHEN s THEN ts[p] || ts[p + 1]
         |      ELSE ts[p] END ORDER BY p) AS ts
         |  FROM (SELECT *, coalesce(lag(s) OVER (PARTITION BY word ORDER BY p),
         |      false) AS prev_s FROM sel$r)
         |  WHERE NOT prev_s GROUP BY word, f)""".stripMargin
    val head =
      """WITH wf AS (SELECT w AS word, count(*)::BIGINT AS f
        |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(coalesce(text, ''))),
        |      '\s+')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |tok0 AS (SELECT word, f, string_split(word, '') AS ts FROM wf)""".stripMargin
    val body = (1 to rounds).map { r =>
      if (r < rounds) pairs(r) + ",\n" + stage(r) else pairs(r)
    }.mkString(",\n")
    val tail = (1 to rounds).map { r =>
      s"SELECT $r::BIGINT AS round, a AS left_tok, b AS right_tok, " +
        s"c AS merged_count FROM best$r"
    }.mkString("\n UNION ALL ")
    head + ",\n" + body + "\n" + tail
  }

  /** The q104 oracle: the q103 stages run through the FINAL vocab state
    * (stage(rounds) included), then documents join their word instances
    * to it — the same merges-apply-per-word-type move the engine makes. */
  private def bpeApplyOracle(rounds: Int): String = {
    def pairs(r: Int) =
      s"""pr$r AS (SELECT ts[i] AS a, ts[i + 1] AS b, sum(f)::BIGINT AS c
         |  FROM tok${r - 1}, unnest(range(1, len(ts))) AS u(i) GROUP BY 1, 2),
         |best$r AS (SELECT a, b, c FROM pr$r ORDER BY c DESC, a, b LIMIT 1)""".stripMargin
    def stage(r: Int) =
      s"""ex$r AS (SELECT word, f, len(ts) AS n, ts, u.p
         |  FROM tok${r - 1}, unnest(range(1, len(ts) + 1)) AS u(p)),
         |mk$r AS (SELECT e.word, e.f, e.n, e.ts, e.p,
         |    (e.p < e.n AND e.ts[e.p] = b.a AND e.ts[e.p + 1] = b.b) AS m
         |  FROM ex$r e CROSS JOIN best$r b),
         |sel$r AS (SELECT word, f, ts, p, m,
         |    m AND ((p - min(p) OVER (PARTITION BY word, g, m)) % 2 = 0) AS s
         |  FROM (SELECT *, p - sum(CASE WHEN m THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY word ORDER BY p ROWS UNBOUNDED PRECEDING) AS g
         |    FROM mk$r)),
         |tok$r AS (SELECT word, f, list(CASE WHEN s THEN ts[p] || ts[p + 1]
         |      ELSE ts[p] END ORDER BY p) AS ts
         |  FROM (SELECT *, coalesce(lag(s) OVER (PARTITION BY word ORDER BY p),
         |      false) AS prev_s FROM sel$r)
         |  WHERE NOT prev_s GROUP BY word, f)""".stripMargin
    val head =
      """WITH wf AS (SELECT w AS word, count(*)::BIGINT AS f
        |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(coalesce(text, ''))),
        |      '\s+')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |tok0 AS (SELECT word, f, string_split(word, '') AS ts FROM wf)""".stripMargin
    val body = (1 to rounds).map(r => pairs(r) + ",\n" + stage(r)).mkString(",\n")
    val tail =
      s"""dw AS (SELECT doc_id, w FROM (SELECT doc_id,
         |    unnest(regexp_split_to_array(lower(trim(coalesce(text, ''))),
         |      '\\s+')) AS w FROM documents) WHERE w <> ''),
         |agg AS (SELECT dw.doc_id, count(*)::BIGINT AS n_words,
         |    sum(len(t.word))::BIGINT AS n_chars,
         |    sum(len(t.ts))::BIGINT AS n_bpe
         |  FROM dw JOIN tok$rounds t ON dw.w = t.word GROUP BY dw.doc_id)
         |SELECT d.doc_id, coalesce(a.n_words, 0::BIGINT) AS n_words,
         |  coalesce(a.n_chars, 0::BIGINT) AS n_chars,
         |  coalesce(a.n_bpe, 0::BIGINT) AS n_bpe_tokens
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin
    head + ",\n" + body + ",\n" + tail
  }

  val defs: Map[String, Q] = Map(
    "q105_dsir_resample" -> q105DsirResample,
    "q103_bpe_train" -> q103BpeTrain,
    "q104_bpe_tokenize" -> q104BpeTokenize,
    "q100_pipeline" -> q100Pipeline,
    "q99_ccnet_tiers" -> q99CcnetTiers,
    "q98_incremental_dedup" -> q98IncrementalDedup,
    "q95_bigram_surprisal" -> q95BigramSurprisal,
    "q90_chunk_overlap" -> q90ChunkOverlap,
    "q89_dsir_weights" -> q89Dsir,
    "q88_hll_distinct" -> q88Hll,
    "q87_cms_counts" -> q87Cms,
    "q85_blocklist" -> q85Blocklist,
    "q83_longrepeat_dedup" -> q83LongRepeatDedup,
    "q82_span_dedup" -> q82SpanDedup,
    "q80_sequence_pack_bfd" -> q80SequencePackBfd,
    "q65_pii_redact" -> q65PiiRedact,
    "q66_decontaminate" -> q66Decontaminate,
    "q68_repetition" -> q68Repetition,
    "q69_split_assign" -> q69SplitAssign,
    "q70_stratified_sample" -> q70StratifiedSample,
    "q71_sequence_pack" -> q71SequencePack,
    "q72_tfidf" -> q72TfIdf,
    "q73_dedup_clusters" -> q73DedupClusters,
    "q75_filter_cascade" -> q75FilterCascade,
    "q76_split_leakage" -> q76SplitLeakage,
    "q77_unigram_surprisal" -> q77UnigramSurprisal,
    "q30_token_stats" -> q30TokenStats,
    "q31_quality" -> q31Quality,
    "q32_fingerprints" -> q32Fingerprints,
    "q33_ngram_jaccard" -> q33NgramJaccard,
    "q34_langid" -> q34LangId,
    "q35_simhash_neardups" -> q35SimhashNearDups,
    "q36_minhash_lsh" -> q36MinhashLsh,
    "q111_indexed_ingest_gate" -> q111IndexedIngestGate,
    "q112_minhash_neardup_groups" -> q112MinhashGroups,
    "q113_jaccard_neardup_groups" -> q113JaccardGroups,
    "q114_simhash_neardup_groups" -> q114SimhashGroups,
    "q115_shingle_cosine_groups" -> q115ShingleCosineGroups,
    "q37_embed_knn" -> q37EmbedKnn,
    "q38_cosine_verify" -> q38CosineVerify,
    "q63_gpt_tokens" -> q63GptTokens)

  private val stopList = "['the','a','an','and','of','to','in','is','it','for']"

  /** The ingest-gate oracle, shared VERBATIM by q98 (batch full-scan
    * tier) and q111 (indexed sidecar tier): same normalized-md5
    * signature, same DISTINCT md5 8-grams (q66's slice pattern),
    * batch↔store joins only, same rational 2·shared ≥ total threshold. */
  private val ingestGateOracle: String =
    """WITH t AS (SELECT doc_id, doc_id % 10 = 3 AS nw,
      |    regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks
      |  FROM documents),
      |b AS (SELECT doc_id, nw, md5(array_to_string(toks, ' ')) AS sig,
      |    CASE WHEN len(toks) >= 8 THEN list_distinct(list_transform(
      |        range(0, len(toks) - 7),
      |        i -> md5(array_to_string(toks[i+1:i+8], ' '))))
      |      ELSE [] END AS grams
      |  FROM t),
      |cs AS (SELECT DISTINCT sig FROM b WHERE NOT nw),
      |xd AS (SELECT doc_id FROM b JOIN cs USING (sig) WHERE nw),
      |cg AS (SELECT DISTINCT unnest(grams) AS h FROM b WHERE NOT nw),
      |ng AS (SELECT doc_id, unnest(grams) AS h FROM b WHERE nw),
      |sh AS (SELECT ng.doc_id, count(*)::BIGINT AS ns
      |  FROM ng JOIN cg ON ng.h = cg.h GROUP BY ng.doc_id)
      |SELECT b.doc_id,
      |  b.doc_id IN (SELECT doc_id FROM xd) AS exact_dup,
      |  len(b.grams)::BIGINT AS n_grams,
      |  coalesce(sh.ns, 0)::BIGINT AS n_shared,
      |  (b.doc_id IN (SELECT doc_id FROM xd)
      |    OR (len(b.grams) > 0 AND coalesce(sh.ns, 0) * 2 >= len(b.grams))) AS drop_doc
      |FROM b LEFT JOIN sh ON b.doc_id = sh.doc_id
      |WHERE b.nw""".stripMargin

  private val oracles0: Map[String, String] = Map(
    // q99 — q77's surprisal CTE verbatim, then the SAME md5-KMV 256-doc
    // sample, the same (value, hash) rank order and integer ceil-rank
    // tercile cutoffs, and the same map-side CASE tiering.
    "q99_ccnet_tiers" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+')) AS term
        |  FROM documents),
        |n AS (SELECT count(*)::BIGINT AS total FROM t),
        |v AS (SELECT term,
        |    round((ln((SELECT total FROM n)::DOUBLE) - ln(count(*))) * 1000.0)::BIGINT AS mnats
        |  FROM t GROUP BY term),
        |d AS (SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
        |    sum(v.mnats)::BIGINT AS sum_mnats
        |  FROM t JOIN v ON t.term = v.term GROUP BY t.doc_id),
        |sc AS (SELECT doc_id,
        |    ((sum_mnats * 1000) // n_tokens)::BIGINT AS avg_unats FROM d),
        |h AS (SELECT doc_id, avg_unats,
        |    ('0x' || substr(md5('cc:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h FROM sc),
        |s AS (SELECT avg_unats, h, row_number() OVER (ORDER BY h) AS hr FROM h),
        |smp AS (SELECT avg_unats, h FROM s WHERE hr <= 256),
        |r AS (SELECT avg_unats AS v2,
        |    row_number() OVER (ORDER BY avg_unats, h) AS rn,
        |    count(*) OVER () AS n2 FROM smp),
        |thr AS (SELECT
        |    max(CASE WHEN rn = (33 * n2 + 99) // 100 THEN v2 END) AS t33,
        |    max(CASE WHEN rn = (67 * n2 + 99) // 100 THEN v2 END) AS t67 FROM r)
        |SELECT sc.doc_id, sc.avg_unats,
        |  CASE WHEN sc.avg_unats <= thr.t33 THEN 'head'
        |       WHEN sc.avg_unats <= thr.t67 THEN 'middle'
        |       ELSE 'tail' END AS tier
        |FROM sc, thr""".stripMargin,
    // q98 — the ingest gate re-derived: same normalized-md5 signature,
    // same DISTINCT md5 8-grams (q66's slice pattern), batch↔store
    // joins only, same rational 2·shared ≥ total threshold. q111 (the
    // INDEXED gate over a real sidecar store) shares this oracle
    // verbatim: the bloom/idx tier must be invisible in the answer.
    "q98_incremental_dedup" -> ingestGateOracle,
    "q111_indexed_ingest_gate" -> ingestGateOracle,
    // q95 — the bigram model re-derived: same tokenizer, bigrams from
    // the token array (lateral range — no self-join), same add-1
    // smoothing, ONE ln per distinct bigram quantized to milli-nats in
    // the same op order, integer per-doc sums, zero-bigram docs kept.
    "q95_bigram_surprisal" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |b AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        |  FROM t, unnest(range(1, len(toks))) AS u(i)),
        |v AS (SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(toks) AS tok FROM t)),
        |c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM b GROUP BY w1, w2),
        |c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY w1),
        |dict AS (SELECT c12.w1, c12.w2,
        |    round((ln(c1.c1 + (SELECT v FROM v)) - ln(c12.c12 + 1)) * 1000)::BIGINT AS mnats
        |  FROM c12 JOIN c1 ON c12.w1 = c1.w1),
        |d AS (SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
        |    sum(dict.mnats)::BIGINT AS sum_mnats
        |  FROM b JOIN dict ON b.w1 = dict.w1 AND b.w2 = dict.w2
        |  GROUP BY b.doc_id)
        |SELECT t.doc_id, coalesce(d.n_bigrams, 0)::BIGINT AS n_bigrams,
        |  coalesce(d.sum_mnats, 0)::BIGINT AS sum_mnats,
        |  (CASE WHEN coalesce(d.n_bigrams, 0) = 0 THEN 0
        |        ELSE (d.sum_mnats * 1000) // d.n_bigrams END)::BIGINT AS avg_unats
        |FROM t LEFT JOIN d ON t.doc_id = d.doc_id""".stripMargin,
    // q89 — the hashed-feature log-ratio model re-derived: same md5 u32
    // mod-4096 buckets, same Laplace smoothing, ONE ln per distinct
    // bucket quantized to integer milli-nats (identical op order), then
    // integer per-doc sums — the q77 float-sum discipline.
    "q89_dsir_weights" ->
      """WITH t AS (SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |tb AS (SELECT doc_id, lang,
        |    ('0x' || substr(md5('dsir:' || tok), 1, 8))::BIGINT % 4096 AS b FROM t),
        |raw AS (SELECT b, count(*)::BIGINT AS cr FROM tb GROUP BY b),
        |tgt AS (SELECT b, count(*)::BIGINT AS ct FROM tb WHERE lang = 'en' GROUP BY b),
        |nt AS (SELECT count(*)::BIGINT AS nt FROM tb WHERE lang = 'en'),
        |nr AS (SELECT count(*)::BIGINT AS nr FROM tb),
        |dict AS (SELECT raw.b,
        |    round((ln(coalesce(ct, 0) + 1) - ln(nt + 4096)
        |      - ln(cr + 1) + ln(nr + 4096)) * 1000)::BIGINT AS mnats
        |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, nt, nr)
        |SELECT tb.doc_id, count(*)::BIGINT AS n_tokens,
        |  sum(mnats)::BIGINT AS sum_mnats,
        |  sum(mnats) > 0 AS selected
        |FROM tb JOIN dict ON tb.b = dict.b
        |GROUP BY tb.doc_id""".stripMargin,
    // q90 — the chunk grid re-derived: same tokenizer, same
    // stride/overlap arithmetic in integers, same contained-tail
    // suppression, chunk text sliced from the same token array and
    // md5'd. list_slice clips at the array end exactly like Spark slice.
    "q90_chunk_overlap" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        |k AS (SELECT doc_id, toks, n, unnest(range(0, (n - 1) // 48 + 1)) AS k FROM n),
        |c AS (SELECT doc_id, toks, n, k, k * 48 AS start FROM k)
        |SELECT doc_id, k::BIGINT AS chunk_id, start::BIGINT AS start_tok,
        |  least(64, n - start)::BIGINT AS chunk_len,
        |  md5(array_to_string(list_slice(toks, start + 1, start + 64), ' ')) AS chunk_md5
        |FROM c WHERE start = 0 OR n - start > 16""".stripMargin,
    // q88 — the HLL registers re-derived: same md5 u60 hash, 9 bucket
    // bits + 51 rank bits, rank from bin()-bitlength (pure integer/string
    // ops), integer harmonic denominator, and the estimate folded from
    // the IDENTICAL double-literal expression (single IEEE division —
    // the only float op on the surface).
    "q88_hll_distinct" ->
      """WITH t AS (SELECT
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |tok AS (SELECT unnest(toks) AS tok FROM t),
        |h AS (SELECT ('0x' || substr(md5('hll:' || tok), 1, 15))::BIGINT AS h FROM tok),
        |rb AS (SELECT h >> 51 AS b,
        |    CASE WHEN (h & ((1::BIGINT << 51) - 1)) = 0 THEN 52
        |         ELSE 52 - length(bin(h & ((1::BIGINT << 51) - 1))) END AS rank
        |  FROM h),
        |regs AS (SELECT b, max(rank) AS reg FROM rb GROUP BY b),
        |s AS (SELECT count(*)::BIGINT AS n_present,
        |    sum(1::BIGINT << (52 - reg))::BIGINT AS s_present FROM regs),
        |su AS (SELECT 512::BIGINT AS m, (512 - n_present)::BIGINT AS v_zero,
        |    (s_present + (512 - n_present) * (1::BIGINT << 52))::BIGINT AS s_harm FROM s),
        |e AS (SELECT m, v_zero, s_harm,
        |    floor((0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0 *
        |      4503599627370496.0 / CAST(s_harm AS DOUBLE))::BIGINT AS est_hll
        |  FROM su),
        |tr AS (SELECT count(DISTINCT tok)::BIGINT AS true_distinct FROM tok)
        |SELECT m, v_zero, s_harm, est_hll, true_distinct,
        |  ((1000 * abs(est_hll - true_distinct)) // true_distinct)::BIGINT AS err_milli,
        |  v_zero > 0 AS lc_range
        |FROM e, tr""".stripMargin,
    // q87 — the CMS grid re-derived: same tokenizer, same u60 md5-prefix
    // digest with 15-bit words per hash row (r12 single-digest family),
    // grid = exact (r, b) occurrence counts, probe
    // estimate = min over rows with absent cells read as 0, exact truth
    // for the same probes. Every count ::BIGINT.
    "q87_cms_counts" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |tok AS (SELECT unnest(toks) AS tok FROM t),
        |pairs AS (SELECT rr.r,
        |    ((('0x' || substr(md5('cms:' || tok.tok), 1, 15))::BIGINT >> (15 * rr.r)) & 32767) % 512 AS b
        |  FROM tok, range(0, 3) rr(r)),
        |grid AS (SELECT r, b, count(*)::BIGINT AS c FROM pairs GROUP BY r, b),
        |probes AS (SELECT unnest(['filter', 'batch', 'scan', 'hash', 'customer',
        |    'merge', 'stream', 'slow', 'the', 'spark', 'zebraquux', 'notoken']) AS token),
        |pb AS (SELECT probes.token, rr.r,
        |    ((('0x' || substr(md5('cms:' || probes.token), 1, 15))::BIGINT >> (15 * rr.r)) & 32767) % 512 AS b
        |  FROM probes, range(0, 3) rr(r)),
        |est AS (SELECT token, min(coalesce(grid.c, 0))::BIGINT AS est_count
        |  FROM pb LEFT JOIN grid ON pb.r = grid.r AND pb.b = grid.b
        |  GROUP BY token),
        |tr AS (SELECT tok AS token, count(*)::BIGINT AS true_count FROM tok
        |  WHERE tok IN (SELECT token FROM probes) GROUP BY tok)
        |SELECT est.token, est.est_count,
        |  coalesce(tr.true_count, 0)::BIGINT AS true_count,
        |  est.est_count >= coalesce(tr.true_count, 0) AS admissible
        |FROM est LEFT JOIN tr ON est.token = tr.token""".stripMargin,
    // q85 — the badwords scrub re-derived: same whitespace tokenizer,
    // same four-term list, occurrence + distinct counts, verdict =
    // any hit. Every count ::BIGINT.
    "q85_blocklist" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  len(list_filter(toks, tk ->
        |    list_contains(['slow', 'dup', 'skew', 'spill'], tk)))::BIGINT AS n_hits,
        |  len(list_filter(list_distinct(toks), tk ->
        |    list_contains(['slow', 'dup', 'skew', 'spill'], tk)))::BIGINT AS n_distinct_hits,
        |  len(list_filter(toks, tk ->
        |    list_contains(['slow', 'dup', 'skew', 'spill'], tk))) > 0 AS blocked
        |FROM t""".stripMargin,
    // q70 — the stratified-sampling outcome re-derived bit-exactly: the
    // integer threshold (BIGINT division, no float) and the same md5-u32
    // window as q69; every count cast ::BIGINT (DuckDB sum → HUGEINT —
    // the q68 r6 hash-mismatch class)
    "q70_stratified_sample" ->
      """WITH s AS (SELECT lang, source, count(*)::BIGINT AS n_total
        |    FROM documents GROUP BY lang, source),
        |t AS (SELECT lang, source, n_total,
        |    least(4294967296, (20 * 4294967296) // n_total) AS threshold
        |  FROM s)
        |SELECT d.lang, d.source, t.n_total, t.threshold,
        |  sum(CASE WHEN ('0x' || substr(md5('samp:' || d.doc_id::VARCHAR), 1, 8))::BIGINT
        |           < t.threshold THEN 1 ELSE 0 END)::BIGINT AS n_kept
        |FROM documents d JOIN t ON d.lang = t.lang AND d.source = t.source
        |GROUP BY d.lang, d.source, t.n_total, t.threshold""".stripMargin,
    // q71 — the lane-parallel packing re-derived: same q30 tokenization,
    // same md5-u32 lane route, per-lane running sum over doc_id order;
    // integer window arithmetic only (// is DuckDB integer division)
    "q71_sequence_pack" ->
      """WITH t AS (SELECT doc_id,
        |    ('0x' || substr(md5('lane:' || doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS lane,
        |    len(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'))::BIGINT AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, lane, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lane ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING)::BIGINT AS end_off
        |  FROM t)
        |SELECT doc_id, lane, n_tokens,
        |  (end_off - n_tokens)::BIGINT AS start_off, end_off,
        |  ((end_off - 1) // 512 - (end_off - n_tokens) // 512 + 1)::BIGINT AS n_windows
        |FROM c""".stripMargin,
    // q83 — the long-repeat scrub re-derived stage-by-stage: same
    // overlapping 8-token seed windows, same corpus-wide (doc_id, s)
    // first-occurrence order, the identical running-max interval merge
    // (window + prefix-sum group ids), coverage exploded from MERGED
    // intervals, ordered per-doc rebuild. Every count ::BIGINT.
    "q83_longrepeat_dedup" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        |w0 AS (SELECT doc_id, toks, unnest(range(0, greatest(n - 7, 0))) AS s FROM n),
        |w AS (SELECT doc_id, s, md5(array_to_string(toks[(s+1):(s+8)], ' ')) AS h FROM w0),
        |r AS (SELECT doc_id, s FROM (SELECT doc_id, s,
        |    row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn FROM w)
        |  WHERE rn > 1),
        |g AS (SELECT doc_id, s,
        |    max(s + 8) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM r),
        |g2 AS (SELECT doc_id, s,
        |    sum(CASE WHEN pme IS NULL OR s >= pme THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM g),
        |iv AS (SELECT doc_id, grp, min(s) AS a, max(s) + 8 AS b
        |  FROM g2 GROUP BY doc_id, grp),
        |cov AS (SELECT doc_id, unnest(range(a, b)) AS p FROM iv),
        |tok AS (SELECT doc_id, i AS p, toks[i + 1] AS tok
        |  FROM (SELECT doc_id, toks, unnest(range(0, n)) AS i FROM n))
        |SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
        |  sum(CASE WHEN cov.p IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_removed,
        |  md5(coalesce(string_agg(tok.tok, ' ' ORDER BY tok.p)
        |    FILTER (cov.p IS NULL), '')) AS kept_md5
        |FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p
        |GROUP BY tok.doc_id""".stripMargin,
    // q82 — the span-dedup re-derived: same 5-token spans, one
    // corpus-wide window over md5(span) partitions with the identical
    // (doc_id, span_idx) first-occurrence order, per-doc reconstruction
    // via ordered string_agg over kept spans. Every count ::BIGINT.
    "q82_span_dedup" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks
        |  FROM documents),
        |s0 AS (SELECT doc_id, toks,
        |    unnest(range(0, (len(toks) + 4) // 5)) AS i FROM t),
        |s AS (SELECT doc_id, i AS span_idx,
        |    array_to_string(toks[(i*5+1):(i*5+5)], ' ') AS span FROM s0),
        |m AS (SELECT doc_id, span_idx, span,
        |    row_number() OVER (PARTITION BY md5(span)
        |      ORDER BY doc_id ASC, span_idx ASC) AS rn FROM s)
        |SELECT doc_id, count(*)::BIGINT AS n_spans,
        |  sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans,
        |  md5(coalesce(string_agg(span, ' ' ORDER BY span_idx) FILTER (rn = 1), ''))
        |    AS kept_md5
        |FROM m GROUP BY doc_id""".stripMargin,
    // q80 — the bounded best-fit-decreasing fold replayed EXACTLY as a
    // recursive CTE: one placement per lane per iteration; state =
    // parallel (bin id, residual) lists; best = min residual ≥ eff (tie
    // min id); overflow past 8 open bins closes the min-residual bin.
    // Every quantity integer → every (doc → bin) assignment hash-exact.
    "q80_sequence_pack_bfd" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id,
        |    ('0x' || substr(md5('lane:' || doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS lane,
        |    len(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'))::BIGINT AS n_tokens
        |  FROM documents),
        |r AS (SELECT doc_id, lane, n_tokens, least(n_tokens, 512)::BIGINT AS eff,
        |    row_number() OVER (PARTITION BY lane
        |      ORDER BY least(n_tokens, 512) DESC, doc_id ASC) AS rk
        |  FROM t),
        |st(iter, lane, ids, res, next_id, doc_id, n_tokens, eff, bin) AS (
        |  SELECT 0::BIGINT, lane, CAST([] AS BIGINT[]), CAST([] AS BIGINT[]), 1::BIGINT,
        |    NULL::BIGINT, NULL::BIGINT, NULL::BIGINT, NULL::BIGINT
        |  FROM (SELECT DISTINCT lane FROM r)
        |  UNION ALL
        |  SELECT iter, lane,
        |    CASE WHEN len(ids1) > 8
        |      THEN list_transform(list_filter(range(1, len(ids1) + 1), i -> i <> worst_i), i -> ids1[i])
        |      ELSE ids1 END,
        |    CASE WHEN len(ids1) > 8
        |      THEN list_transform(list_filter(range(1, len(res1) + 1), i -> i <> worst_i), i -> res1[i])
        |      ELSE res1 END,
        |    next1, doc_id, n_tokens, eff, bin
        |  FROM (
        |    SELECT z.*,
        |      CASE WHEN len(z.ids1) > 8 THEN (
        |        SELECT i FROM (SELECT unnest(range(1, len(z.ids1) + 1)) AS i) u
        |        ORDER BY z.res1[i] ASC, z.ids1[i] ASC LIMIT 1) END AS worst_i
        |    FROM (
        |      SELECT y.iter, y.lane, y.doc_id, y.n_tokens, y.eff,
        |        CASE WHEN y.best_i IS NOT NULL THEN y.ids[y.best_i] ELSE y.next_id END AS bin,
        |        CASE WHEN y.best_i IS NOT NULL THEN y.ids
        |             ELSE list_append(y.ids, y.next_id) END AS ids1,
        |        CASE WHEN y.best_i IS NOT NULL
        |             THEN list_transform(range(1, len(y.res) + 1),
        |                    i -> CASE WHEN i = y.best_i THEN y.res[i] - y.eff ELSE y.res[i] END)
        |             ELSE list_append(y.res, 512 - y.eff) END AS res1,
        |        CASE WHEN y.best_i IS NULL THEN y.next_id + 1 ELSE y.next_id END AS next1
        |      FROM (
        |        SELECT s.iter + 1 AS iter, s.lane, s.ids, s.res, s.next_id,
        |          d.doc_id, d.n_tokens, d.eff,
        |          (SELECT i FROM (SELECT unnest(range(1, len(s.ids) + 1)) AS i) u
        |           WHERE s.res[i] >= d.eff
        |           ORDER BY s.res[i] ASC, s.ids[i] ASC LIMIT 1) AS best_i
        |        FROM st s JOIN r d ON d.lane = s.lane AND d.rk = s.iter + 1
        |      ) y
        |    ) z
        |  )
        |)
        |SELECT doc_id, lane, n_tokens, eff AS eff_tokens, bin
        |FROM st WHERE doc_id IS NOT NULL""".stripMargin,
    // q72 — tf/df/rank re-derived on the integer ordering; the score is
    // q77-style integer milli-nats (one ln per distinct df, quantized,
    // then an exact integer multiply by tf), never consulted for the
    // ordering (see q72TfIdf scaladoc)
    "q72_tfidf" ->
      """WITH terms AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
        |  FROM terms GROUP BY doc_id, term),
        |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*)::BIGINT AS n FROM documents),
        |r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rk
        |  FROM tf JOIN df ON tf.term = df.term)
        |SELECT r.doc_id, r.term, r.tf, r.df, r.rk::BIGINT AS rk,
        |  (r.tf * round((ln(n.n::DOUBLE) - ln(r.df)) * 1000.0)::BIGINT)::BIGINT AS score_mnats
        |FROM r, n WHERE r.rk <= 3""".stripMargin,
    // q77 — surprisal re-derived with the SAME per-term quantization:
    // one ln per distinct term, (ln N − ln c)·1000 rounded to integer
    // milli-nats, integer sums (order-free) — the cross-row double-sum
    // trap never opens. 1000.0 is cast ::DOUBLE (DuckDB's bare 1000.0 is
    // DECIMAL and BIGINT/DECIMAL division would diverge from Spark)
    "q77_unigram_surprisal" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+')) AS term
        |  FROM documents),
        |n AS (SELECT count(*)::BIGINT AS total FROM t),
        |v AS (SELECT term,
        |    round((ln((SELECT total FROM n)::DOUBLE) - ln(count(*))) * 1000.0)::BIGINT AS mnats
        |  FROM t GROUP BY term),
        |d AS (SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
        |    sum(v.mnats)::BIGINT AS sum_mnats
        |  FROM t JOIN v ON t.term = v.term GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens, sum_mnats,
        |  ((sum_mnats * 1000) // n_tokens)::BIGINT AS avg_unats
        |FROM d""".stripMargin,
    // q75 — the cascade re-derived rule by rule: q31's stop/punct
    // fragments, q68's dup-fraction op order, thresholds compared on
    // identically-computed doubles, CASE evaluation order = the engine's
    // when-chain order
    "q75_filter_cascade" ->
      s"""WITH t AS (SELECT doc_id,
         |    regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+') AS toks,
         |    regexp_replace(coalesce(text, ''), '\\s', '', 'g') AS nospace FROM documents),
         |r AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         |    1.0 - len(list_distinct(toks)) / len(toks)::DOUBLE AS dup_frac,
         |    len(list_filter(toks, x -> list_contains($stopList, x)))::DOUBLE / len(toks) AS stop_ratio,
         |    CASE WHEN length(nospace) = 0 THEN 0.0
         |      ELSE (length(nospace) - length(regexp_replace(nospace, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / length(nospace)
         |    END AS punct_ratio FROM t),
         |v AS (SELECT doc_id, n_tokens,
         |    CASE WHEN n_tokens < 10 THEN 'too_short'
         |         WHEN n_tokens > 1000 THEN 'too_long'
         |         WHEN dup_frac > 0.3 THEN 'dup_tokens'
         |         WHEN punct_ratio > 0.3 THEN 'high_punct'
         |         WHEN stop_ratio < 0.01 THEN 'low_stopword'
         |         ELSE 'keep' END AS verdict FROM r)
         |SELECT doc_id, n_tokens, verdict, verdict = 'keep' AS kept FROM v""".stripMargin,
    // q76 — the leakage audit re-derived end-to-end: q73's cluster CTE ×
    // q69's split route, per-cluster distinct-split counts, one
    // all-integer summary row (::BIGINT on every count/sum)
    "q76_split_leakage" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, source,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
        |sh AS (SELECT doc_id, source,
        |  list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS shingles FROM t),
        |ex AS (SELECT doc_id, source, len(shingles) AS n, unnest(shingles) AS s FROM sh),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS c, max(a.n) AS na, max(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (SELECT doc_a, doc_b FROM inter WHERE c::DOUBLE / (na + nb - c) >= 0.5),
        |sym AS (SELECT doc_a AS u1, doc_b AS u2 FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT u1 AS node, u1 AS lbl FROM sym
        |  UNION
        |  SELECT sym.u2, reach.lbl FROM reach JOIN sym ON reach.node = sym.u1
        |  WHERE reach.lbl < sym.u2),
        |comp AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node),
        |lab AS (SELECT d.doc_id, coalesce(comp.label, d.doc_id) AS canonical_id
        |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node),
        |sp AS (SELECT doc_id,
        |    CASE WHEN b < 98 THEN 'train' WHEN b = 98 THEN 'validation'
        |         ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |    ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
        |    FROM documents)),
        |per AS (SELECT lab.canonical_id, count(*)::BIGINT AS sz,
        |    count(DISTINCT sp.split)::BIGINT AS n_splits,
        |    sum(CASE WHEN sp.split <> 'train' THEN 1 ELSE 0 END)::BIGINT AS n_eval
        |  FROM lab JOIN sp ON lab.doc_id = sp.doc_id GROUP BY lab.canonical_id)
        |SELECT count(*)::BIGINT AS n_clusters,
        |  sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)::BIGINT AS n_leaky_clusters,
        |  coalesce(sum(CASE WHEN n_splits > 1 THEN sz END), 0)::BIGINT AS n_docs_in_leaky,
        |  coalesce(sum(CASE WHEN n_splits > 1 THEN n_eval END), 0)::BIGINT AS n_eval_docs_leaked
        |FROM per""".stripMargin,
    // q73 — the canonicalization re-derived end-to-end: q33's string-
    // shingle pair CTE (the hashed-shingle twin it is oracle-equal to),
    // q43's recursive min-label fixpoint over the symmetrized pairs,
    // totality via left join (singletons self-canonical)
    "q73_dedup_clusters" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, source,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
        |sh AS (SELECT doc_id, source,
        |  list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS shingles FROM t),
        |ex AS (SELECT doc_id, source, len(shingles) AS n, unnest(shingles) AS s FROM sh),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS c, max(a.n) AS na, max(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (SELECT doc_a, doc_b FROM inter WHERE c::DOUBLE / (na + nb - c) >= 0.5),
        |sym AS (SELECT doc_a AS u1, doc_b AS u2 FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT u1 AS node, u1 AS lbl FROM sym
        |  UNION
        |  SELECT sym.u2, reach.lbl FROM reach JOIN sym ON reach.node = sym.u1
        |  WHERE reach.lbl < sym.u2),
        |comp AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node),
        |lab AS (SELECT d.doc_id, coalesce(comp.label, d.doc_id) AS canonical_id
        |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node),
        |sz AS (SELECT canonical_id, count(*)::BIGINT AS cluster_size
        |  FROM lab GROUP BY canonical_id)
        |SELECT lab.doc_id, lab.canonical_id, sz.cluster_size,
        |  lab.doc_id = lab.canonical_id AS kept
        |FROM lab JOIN sz ON lab.canonical_id = sz.canonical_id""".stripMargin,
    // q69 — the split route re-derived bit-exactly: DuckDB's hex cast
    // parses the same first-8-hex-chars window conv() reads
    "q69_split_assign" ->
      """WITH b AS (SELECT doc_id,
        |    ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 98 THEN 'train'
        |       WHEN bucket = 98 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM b""".stripMargin,
    // q68 — the repetition signals re-derived from scratch: same
    // whitespace tokenization as q30 (split of '' yields [''] in both
    // engines), DuckDB's 1-based list indexing mirrored by range(1, len)
    "q68_repetition" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, len(toks) AS n_tokens,
        |    len(list_distinct(toks)) AS n_distinct FROM t),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS gram FROM t WHERE len(toks) >= 2),
        |gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
        |top AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_g FROM gc GROUP BY doc_id)
        |SELECT s.doc_id, s.n_tokens,
        |  round(1.0 - s.n_distinct / s.n_tokens::DOUBLE, 4) AS dup_token_frac,
        |  coalesce(top.n_g, 0)::BIGINT AS n_2grams,
        |  coalesce(top.top_c, 0) AS top_2gram_count,
        |  round(coalesce(top.top_c / top.n_g::DOUBLE, 0.0), 4) AS top_2gram_frac
        |FROM s LEFT JOIN top ON s.doc_id = top.doc_id""".stripMargin,
    // q65 — enrichment, counts and the FULL redaction replayed: DuckDB's
    // RE2 and Spark's Java regex agree on the whole pattern subset used
    // (classes, bounded repetition, \b, optional +) and DuckDB's
    // regexp_replace needs the 'g' flag to match Spark's replace-all.
    "q65_pii_redact" ->
      """WITH t AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com via 10.' ||
        |    (doc_id % 200) || '.0.1 tel 555-' ||
        |    lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-1234' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT AS n_email,
        |  len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))::INT AS n_ip,
        |  len(regexp_extract_all(t, '\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}'))::INT AS n_phone,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}', '<PHONE>', 'g')) AS red_md5
        |FROM t""".stripMargin,
    // q66 — the decontamination join replayed on md5 8-token shingles
    // (inclusive 1-based list slices ≙ Spark's slice(toks, i+1, 8)).
    "q66_decontaminate" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(
        |    range(0, greatest(len(toks) - 7, 0)),
        |    i -> md5(array_to_string(toks[i+1:i+8], ' ')))) AS h FROM t),
        |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0),
        |hits AS (SELECT s.doc_id, count(DISTINCT s.h) AS n
        |  FROM sh s JOIN bench b ON s.h = b.h WHERE s.doc_id % 97 <> 0
        |  GROUP BY s.doc_id)
        |SELECT d.doc_id, coalesce(hits.n, 0)::BIGINT AS n_bench_shingles,
        |  coalesce(hits.n, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
        |WHERE d.doc_id % 97 <> 0""".stripMargin,
    "q30_token_stats" ->
      s"""WITH t AS (SELECT doc_id, text,
         |  regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents)
         |SELECT doc_id, len(toks) AS n_tokens,
         |len(list_distinct(toks)) AS n_distinct,
         |length(text) AS n_chars_actual,
         |round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks), 4) AS avg_token_len
         |FROM t""".stripMargin,
    "q31_quality" ->
      s"""WITH t AS (SELECT doc_id,
         |  regexp_split_to_array(lower(trim(text)), '\\s+') AS toks,
         |  regexp_replace(text, '\\s', '', 'g') AS nospace FROM documents),
         |r AS (SELECT doc_id, len(toks) AS n,
         |  len(list_filter(toks, x -> list_contains($stopList, x)))::DOUBLE / len(toks) AS stop_ratio,
         |  CASE WHEN length(nospace) = 0 THEN 0.0
         |    ELSE (length(nospace) - length(regexp_replace(nospace, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / length(nospace)
         |  END AS punct_ratio FROM t)
         |SELECT doc_id, round(stop_ratio, 4) AS stopword_ratio,
         |round(punct_ratio, 4) AS punct_ratio,
         |round(((CASE WHEN n BETWEEN 10 AND 1000 THEN 1.0 WHEN n < 10 THEN n / 10.0 ELSE 0.5 END)
         |  + (1.0 - least(punct_ratio * 5.0, 1.0))
         |  + least(stop_ratio * 5.0, 1.0)) / 3.0, 4) AS quality
         |FROM r""".stripMargin,
    "q32_fingerprints" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        |COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
        |FROM documents GROUP BY 1""".stripMargin,
    "q33_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, source,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
        |sh AS (SELECT doc_id, source,
        |  list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS shingles FROM t),
        |ex AS (SELECT doc_id, source, len(shingles) AS n, unnest(shingles) AS s FROM sh),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS c, max(a.n) AS na, max(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, c::DOUBLE / (na + nb - c) AS jaccard
        |FROM inter WHERE c::DOUBLE / (na + nb - c) >= 0.5""".stripMargin,
    // q112 — the group form re-derived as components of the TRUE global
    // Jaccard pair graph (q36's inter CTE; the banding ≡ true-pairs
    // set-equality pin makes the engine's rep-banded edges this exact
    // set), q43's recursive min-label fixpoint, singletons self-canonical
    "q112_minhash_neardup_groups" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS shingles FROM t),
        |ex AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS c, max(a.n) AS na, max(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (SELECT doc_a, doc_b FROM inter WHERE c::DOUBLE / (na + nb - c) >= 0.5),
        |sym AS (SELECT doc_a AS u1, doc_b AS u2 FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT u1 AS node, u1 AS lbl FROM sym
        |  UNION
        |  SELECT sym.u2, reach.lbl FROM reach JOIN sym ON reach.node = sym.u1
        |  WHERE reach.lbl < sym.u2),
        |comp AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node),
        |lab AS (SELECT d.doc_id, coalesce(comp.label, d.doc_id) AS canon_id
        |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node)
        |SELECT doc_id, canon_id,
        |  (count(*) OVER (PARTITION BY canon_id))::BIGINT AS group_size
        |FROM lab""".stripMargin,
    // q113 — same derivation with q33's source-scoped inter CTE: edges
    // (and therefore groups) never cross sources
    "q113_jaccard_neardup_groups" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, source,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
        |sh AS (SELECT doc_id, source,
        |  list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS shingles FROM t),
        |ex AS (SELECT doc_id, source, len(shingles) AS n, unnest(shingles) AS s FROM sh),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS c, max(a.n) AS na, max(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (SELECT doc_a, doc_b FROM inter WHERE c::DOUBLE / (na + nb - c) >= 0.5),
        |sym AS (SELECT doc_a AS u1, doc_b AS u2 FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT u1 AS node, u1 AS lbl FROM sym
        |  UNION
        |  SELECT sym.u2, reach.lbl FROM reach JOIN sym ON reach.node = sym.u1
        |  WHERE reach.lbl < sym.u2),
        |comp AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node),
        |lab AS (SELECT d.doc_id, coalesce(comp.label, d.doc_id) AS canon_id
        |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node)
        |SELECT doc_id, canon_id,
        |  (count(*) OVER (PARTITION BY canon_id))::BIGINT AS group_size
        |FROM lab""".stripMargin,
    "q36_minhash_lsh" ->
      """WITH t AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS shingles FROM t),
        |ex AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS c, max(a.n) AS na, max(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, c::DOUBLE / (na + nb - c) AS jaccard
        |FROM inter WHERE c::DOUBLE / (na + nb - c) >= 0.5""".stripMargin,
    "q34_langid" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |  regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents)
         |SELECT doc_id,
         |CASE WHEN len(list_filter(toks, x -> list_contains($stopList, x)))::DOUBLE / len(toks) >= 0.02
         |  THEN 'en' ELSE 'und' END AS lang_guess, lang
         |FROM t""".stripMargin,
    "q38_cosine_verify" ->
      """WITH t AS (SELECT doc_id, source,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |      i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS ks FROM t),
        |ex AS (SELECT doc_id, source, unnest(ks) AS k FROM sh),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |    FROM ex a JOIN ex b ON a.k = b.k AND a.source = b.source
        |      AND a.doc_id < b.doc_id),
        |v AS (SELECT doc_id, list_transform(range(0, 16), i ->
        |      list_sum(list_transform(toks, tk ->
        |        CASE WHEN strpos('0123456789abcdef', substr(md5(tk), 2, 1)) - 1 = i
        |          THEN (CASE WHEN strpos('0123456789abcdef', substr(md5(tk), 3, 1)) >= 9
        |            THEN 1.0 ELSE -1.0 END) ELSE 0.0 END))) AS v FROM t),
        |n AS (SELECT doc_id, v,
        |    list_sum(list_transform(v, x -> x * x)) AS n2 FROM v)
        |SELECT c.doc_a, c.doc_b,
        |  round(list_sum(list_transform(range(1, 17),
        |      i -> na.v[i] * nb.v[i])) / sqrt(na.n2 * nb.n2), 4) AS cos
        |FROM cand c
        |JOIN n na ON na.doc_id = c.doc_a
        |JOIN n nb ON nb.doc_id = c.doc_b
        |WHERE na.n2 > 0 AND nb.n2 > 0
        |  AND round(list_sum(list_transform(range(1, 17),
        |      i -> na.v[i] * nb.v[i])) / sqrt(na.n2 * nb.n2), 4) >= 0.6""".stripMargin,
    // q35 — the md5 SimHash replayed exactly: per-token ±1 bit votes from
    // the first 8 md5 digest bytes (= hex chars 1–16, split 32/32),
    // fingerprint bit j set iff the vote sum is positive, then ALL pairs
    // at Hamming ≤ 3 — the pigeonhole banding in the engine finds exactly
    // this set, so a plain quadratic re-derivation is the true oracle.
    // q115 — q38's candidate + cosine-verify CTEs verbatim, then the
    // q43-pattern min-label fixpoint + singleton totality + group sizes
    // (pair-ineligible docs — zero embeddings — never enter p, so the
    // left join leaves them self-canonical, matching the engine's
    // per-text eligibility override)
    "q115_shingle_cosine_groups" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, source,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |      i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS ks FROM t),
        |ex AS (SELECT doc_id, source, unnest(ks) AS k FROM sh),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |    FROM ex a JOIN ex b ON a.k = b.k AND a.source = b.source
        |      AND a.doc_id < b.doc_id),
        |v AS (SELECT doc_id, list_transform(range(0, 16), i ->
        |      list_sum(list_transform(toks, tk ->
        |        CASE WHEN strpos('0123456789abcdef', substr(md5(tk), 2, 1)) - 1 = i
        |          THEN (CASE WHEN strpos('0123456789abcdef', substr(md5(tk), 3, 1)) >= 9
        |            THEN 1.0 ELSE -1.0 END) ELSE 0.0 END))) AS v FROM t),
        |n AS (SELECT doc_id, v,
        |    list_sum(list_transform(v, x -> x * x)) AS n2 FROM v),
        |p AS (SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN n na ON na.doc_id = c.doc_a
        |  JOIN n nb ON nb.doc_id = c.doc_b
        |  WHERE na.n2 > 0 AND nb.n2 > 0
        |    AND round(list_sum(list_transform(range(1, 17),
        |        i -> na.v[i] * nb.v[i])) / sqrt(na.n2 * nb.n2), 4) >= 0.6),
        |sym AS (SELECT doc_a AS u1, doc_b AS u2 FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT u1 AS node, u1 AS lbl FROM sym
        |  UNION
        |  SELECT sym.u2, reach.lbl FROM reach JOIN sym ON reach.node = sym.u1
        |  WHERE reach.lbl < sym.u2),
        |comp AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node),
        |lab AS (SELECT d.doc_id, coalesce(comp.label, d.doc_id) AS canon_id
        |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node)
        |SELECT doc_id, canon_id,
        |  (count(*) OVER (PARTITION BY canon_id))::BIGINT AS group_size
        |FROM lab""".stripMargin,
    // q114 — q35's fingerprint CTE verbatim, brute true Hamming ≤ 3
    // pairs, then the q43-pattern min-label fixpoint + singleton
    // totality + group sizes (the q112/q113 derivation in Hamming space)
    "q114_simhash_neardup_groups" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |tk AS (SELECT doc_id, unnest(toks) AS tk FROM t),
        |th AS (SELECT doc_id,
        |    ('0x' || substr(md5(tk), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5(tk), 9, 8))::BIGINT AS lo FROM tk),
        |b AS (SELECT doc_id, j,
        |    sum(CASE WHEN ((CASE WHEN j < 32 THEN lo ELSE hi END)
        |          >> (j % 32)::INT) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM th, (SELECT unnest(range(0, 64)) AS j) GROUP BY doc_id, j),
        |fp AS (SELECT doc_id,
        |    sum(CASE WHEN s > 0 AND j < 32 THEN (1::BIGINT << j::INT) ELSE 0 END)::BIGINT AS fp_lo,
        |    sum(CASE WHEN s > 0 AND j >= 32 THEN (1::BIGINT << ((j - 32)::INT)) ELSE 0 END)::BIGINT AS fp_hi
        |  FROM b GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.fp_lo, b.fp_lo)) + bit_count(xor(a.fp_hi, b.fp_hi)) <= 3),
        |sym AS (SELECT doc_a AS u1, doc_b AS u2 FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT u1 AS node, u1 AS lbl FROM sym
        |  UNION
        |  SELECT sym.u2, reach.lbl FROM reach JOIN sym ON reach.node = sym.u1
        |  WHERE reach.lbl < sym.u2),
        |comp AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node),
        |lab AS (SELECT d.doc_id, coalesce(comp.label, d.doc_id) AS canon_id
        |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.node)
        |SELECT doc_id, canon_id,
        |  (count(*) OVER (PARTITION BY canon_id))::BIGINT AS group_size
        |FROM lab""".stripMargin,
    "q35_simhash_neardups" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |tk AS (SELECT doc_id, unnest(toks) AS tk FROM t),
        |th AS (SELECT doc_id,
        |    ('0x' || substr(md5(tk), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5(tk), 9, 8))::BIGINT AS lo FROM tk),
        |b AS (SELECT doc_id, j,
        |    sum(CASE WHEN ((CASE WHEN j < 32 THEN lo ELSE hi END)
        |          >> (j % 32)::INT) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM th, (SELECT unnest(range(0, 64)) AS j) GROUP BY doc_id, j),
        |fp AS (SELECT doc_id,
        |    sum(CASE WHEN s > 0 AND j < 32 THEN (1::BIGINT << j::INT) ELSE 0 END)::BIGINT AS fp_lo,
        |    sum(CASE WHEN s > 0 AND j >= 32 THEN (1::BIGINT << ((j - 32)::INT)) ELSE 0 END)::BIGINT AS fp_hi
        |  FROM b GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  (bit_count(xor(a.fp_lo, b.fp_lo)) + bit_count(xor(a.fp_hi, b.fp_hi)))::BIGINT AS dist
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp_lo, b.fp_lo)) + bit_count(xor(a.fp_hi, b.fp_hi)) <= 3""".stripMargin,
    // q37 — exact kNN over the same md5 feature-hash vectors as q38's
    // verify stage: integer-valued 16-dim vectors make every score exact
    // in doubles, and both engines order by (rounded score DESC, doc_id)
    // — a deterministic total order.
    "q37_embed_knn" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |v AS (SELECT doc_id, list_transform(range(0, 16), i ->
        |      list_sum(list_transform(toks, tk ->
        |        CASE WHEN strpos('0123456789abcdef', substr(md5(tk), 2, 1)) - 1 = i
        |          THEN (CASE WHEN strpos('0123456789abcdef', substr(md5(tk), 3, 1)) >= 9
        |            THEN 1.0 ELSE -1.0 END) ELSE 0.0 END))) AS v FROM t),
        |n AS (SELECT doc_id, v,
        |    list_sum(list_transform(v, x -> x * x)) AS n2 FROM v),
        |q AS (SELECT v AS qv, n2 AS qn2 FROM n WHERE doc_id = 0)
        |SELECT n.doc_id,
        |  round(list_sum(list_transform(range(1, 17),
        |      i -> n.v[i] * q.qv[i])) / sqrt(n.n2 * q.qn2), 4) AS score
        |FROM n, q
        |WHERE n.doc_id <> 0 AND n.n2 > 0 AND q.qn2 > 0
        |ORDER BY score DESC, n.doc_id ASC LIMIT 10""".stripMargin,
    "q63_gpt_tokens" ->
      """WITH t AS (SELECT doc_id, text,
        |  regexp_extract_all(text,
        |    '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')
        |    AS pt,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents)
        |SELECT doc_id, len(pt) AS n_pretokens,
        |  len(list_distinct(pt)) AS n_distinct_pretokens,
        |  round(len(pt)::DOUBLE / len(ws), 4) AS expansion_ratio
        |FROM t""".stripMargin)

  /** q100's oracle is each stage's oracle VERBATIM as a parenthesized
    * WITH-subquery, joined on doc_id — a regression in any composed
    * stage fails the manifest too. */
  val oracles: Map[String, String] = oracles0 + ("q100_pipeline" ->
    s"""SELECT d.doc_id, d.doc_id % 97 = 0 AS is_benchmark,
       |  p.kept AS quality_kept, c.kept AS dedup_kept,
       |  coalesce(x.contaminated, FALSE) AS contaminated,
       |  t.tier, s.split,
       |  (p.kept AND c.kept AND NOT coalesce(x.contaminated, FALSE)
       |    AND NOT (d.doc_id % 97 = 0)) AS selected
       |FROM documents d
       |JOIN (${oracles0("q75_filter_cascade")}) p ON d.doc_id = p.doc_id
       |JOIN (${oracles0("q73_dedup_clusters")}) c ON d.doc_id = c.doc_id
       |LEFT JOIN (${oracles0("q66_decontaminate")}) x ON d.doc_id = x.doc_id
       |JOIN (${oracles0("q69_split_assign")}) s ON d.doc_id = s.doc_id
       |JOIN (${oracles0("q99_ccnet_tiers")}) t ON d.doc_id = t.doc_id""".stripMargin) +
    ("q105_dsir_resample" ->
      s"""WITH w AS (${oracles0("q89_dsir_weights")}),
         |g AS (SELECT doc_id, sum_mnats,
         |    sum_mnats + round(-1000 * ln(-ln(
         |      (('0x' || substr(md5('dsir-s:' || doc_id::VARCHAR), 1, 8))::BIGINT
         |        + 0.5) / 4294967296)))::BIGINT AS gkey
         |  FROM w)
         |SELECT doc_id, sum_mnats, gkey FROM g
         |ORDER BY gkey DESC, doc_id LIMIT 100""".stripMargin) +
    ("q103_bpe_train" -> bpeOracle(8)) +
    ("q104_bpe_tokenize" -> bpeApplyOracle(8))
}
