package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Checkpointer.CheckpointSyntax

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — THE vector-compression artifact a 100 TB
  * embedding store actually serves: split each dim-D vector into m
  * subvectors of D/m dims, quantize each against its own small codebook,
  * and store m small codes (m bytes at ks ≤ 256) instead of D floats —
  * 32× less memory/IO at D=64/m=8, and query-time distance is estimated
  * from the codes alone via ADC (asymmetric distance computation): one
  * m·ks lookup table per query, then a table-sum per candidate, no float
  * vector ever read. Composes with the q26 IVF cells (IVF-PQ): coarse
  * cell prune → in-cell ADC scan.
  *
  * Tiering (the q79 discipline):
  *  - production: [[fitCodebooks]] — per-subspace k-means via
  *    [[Ann.kmeansCentroids]]; seed-dependent, spec-verified (PqSpec).
  *  - cross-engine twin: [[md5Codebooks]] — deterministic integer
  *    codebook entries derived from md5 nibbles, over the integer-valued
  *    md5Embed vectors. Every distance is integer-exact in doubles, so
  *    DuckDB replays encode + ADC bit-for-bit and the whole operator
  *    carries a full hash oracle (q84).
  *
  * Scale shape: [[encode]] and [[adc]] are MAP-ONLY column expressions —
  * codebooks are driver literals folded into the plan (m·ks·subdim
  * doubles — a few KB; a 256-entry float codebook is always
  * broadcast-sized), no shuffle, no UDF; everything stays inside
  * whole-stage codegen.
  */
object Pq {

  /** Deterministic integer codebooks from md5 nibbles: entry value at
    * (subspace s, code j, dim d) = (first md5 nibble of "pq:seed:s:j:d")
    * mod 9 − 4 ∈ [−4, 4]. Replayable by any engine with md5. */
  def md5Codebooks(m: Int, ks: Int, subDim: Int,
      seed: String = "pq"): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    IndexedSeq.tabulate(m, ks, subDim) { (s, j, d) =>
      val dig = md.digest(s"$seed:$s:$j:$d".getBytes("UTF-8"))
      (((dig(0) >> 4) & 0xf) % 9 - 4).toDouble
    }
  }

  /** Deterministic md5-derived query vector (same nibble rule as the
    * codebooks, independent seed) — the cross-engine ADC probe. */
  def md5Query(dim: Int, seed: String = "pqq"): IndexedSeq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    IndexedSeq.tabulate(dim) { i =>
      val dig = md.digest(s"$seed:$i".getBytes("UTF-8"))
      (((dig(0) >> 4) & 0xf) % 9 - 4).toDouble
    }
  }

  /** Euclidean k-means (Lloyd) over a vector column — PQ trains on the
    * L2 objective, NOT the dot-product objective [[Ann.kmeansCentroids]]
    * optimizes for cosine IVF cells (on un-normalized subvectors the two
    * disagree badly). Deterministic pseudo-sample init (the Ann
    * discipline), assignment by argmin ‖v−c‖² computed as
    * argmax(v·c − ‖c‖²/2) so the per-point work is one broadcast dot per
    * centroid; update is a per-(cell, dim) mean — shuffle ∝ points·dim,
    * never pairwise. Returns ≤ k centroids (empty cells drop). */
  def kmeansL2(points: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 4): IndexedSeq[IndexedSeq[Double]] = {
    import graft.functions.VectorFunctions
    var centroids = points
      .orderBy(xxhash64(col(idCol))) // deterministic pseudo-sample
      .limit(k)
      .select(monotonically_increasing_id().as("cell"), col(vecCol).as("centroid"))
      .cp()
    for (_ <- 1 to iters) {
      val assigned = points.crossJoin(broadcast(centroids))
        .select(col(idCol), col(vecCol),
          struct(
            (VectorFunctions.dot(col(vecCol), col("centroid")) -
              lit(0.5) * VectorFunctions.dot(col("centroid"), col("centroid"))).as("score"),
            col("cell")).as("sc"))
        .groupBy(col(idCol))
        .agg(max(col("sc")).as("b"), first(col(vecCol)).as("v"))
        .select(col("b.cell").as("cell"), col("v"))
      val next = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d"))
        .agg(avg(col("x")).as("x"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("d"), col("x")))).as("dx"))
        .select(col("cell"), transform(col("dx"), e => e.getField("x")).as("centroid"))
        .cp()
      graft.util.BlockRelease.release(centroids)
      centroids = next
    }
    val out = centroids.orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    graft.util.BlockRelease.release(centroids)
    out
  }

  /** Production codebooks: per-subspace L2 k-means over the corpus (the
    * classic PQ training loop). Returns the same in-memory shape as
    * [[md5Codebooks]]; the collect is ks·subDim per subspace — codebook-
    * sized by construction, never corpus-sized. */
  def fitCodebooks(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int, ks: Int, iters: Int = 4): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val dim = vecs.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val subDim = dim / m
    IndexedSeq.tabulate(m) { s =>
      val sub = vecs.select(col(idCol),
        slice(col(vecCol), s * subDim + 1, subDim).as("sv"))
      val cents = kmeansL2(sub, idCol, "sv", ks)
      // k-means can converge to < ks distinct centroids on tiny corpora;
      // pad deterministically so codes stay in [0, ks)
      if (cents.length >= ks) cents.take(ks)
      else cents ++ IndexedSeq.fill(ks - cents.length)(cents.head)
    }
  }

  /** Squared L2 between a subvector slice of `v` and a literal codebook
    * entry, as a column expression (sum of subDim squared diffs —
    * unrolled literals, codegen-friendly). */
  private def subDist2(v: Column, s: Int, entry: IndexedSeq[Double]): Column =
    entry.indices.map { d =>
      val x = element_at(v, s * entry.length + d + 1) - lit(entry(d))
      x * x
    }.reduce(_ + _)

  /** PQ encode: array<int> of m codes, code s = argmin_j ‖v_sub −
    * cb(s)(j)‖² with ties to the SMALLEST j (array_position returns the
    * first minimum — the deterministic tie-break both engines share). */
  def encode(v: Column, codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): Column = {
    val codes = codebooks.indices.map { s =>
      val dists = array(codebooks(s).map(e => subDist2(v, s, e)): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    array(codes: _*)
  }

  /** Reconstruction (decode): concatenation of the selected codebook
    * entries — array<double> of the original dim. */
  def decode(codes: Column, codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): Column =
    concat(codebooks.indices.map { s =>
      // entry lookup: element_at over a literal array-of-arrays
      val table = array(codebooks(s).map(e => array(e.map(lit): _*)): _*)
      element_at(table, element_at(codes, s + 1) + 1)
    }: _*)

  /** Total squared reconstruction error ‖v − decode(encode(v))‖² as one
    * map-side expression (the training-diagnostics column). */
  def reconstructionError2(v: Column,
      codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): Column = {
    val codes = encode(v, codebooks)
    val rec = decode(codes, codebooks)
    aggregate(zip_with(v, rec, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
  }

  /** ADC — asymmetric distance from a PLAIN query vector to a CODED
    * corpus vector: Σ_s ‖q_sub(s) − cb(s)(code_s)‖². The query-side
    * lookup table (m·ks squared distances) is folded into the plan as
    * literals — the per-row work is m table lookups + a sum, never a
    * D-dim float scan. `q` is a driver-side literal query vector. */
  def adc(codes: Column, q: IndexedSeq[Double],
      codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): Column = {
    codebooks.indices.map { s =>
      val subDim = codebooks(s).head.length
      val qSub = q.slice(s * subDim, (s + 1) * subDim)
      // literal lookup table: dist²(q_sub, entry_j) for every j
      val table = array(codebooks(s).map { e =>
        lit(e.indices.map(d => { val x = qSub(d) - e(d); x * x }).sum)
      }: _*)
      element_at(table, element_at(codes, s + 1) + 1)
    }.reduce(_ + _)
  }

  /** PQ-compressed brute top-k: encode once (storage tier), then rank by
    * ADC — the in-cell scan of an IVF-PQ. One TakeOrderedAndProject, no
    * shuffle before the top-k. */
  def adcTopK(vecs: DataFrame, idCol: String, vecCol: String,
      q: IndexedSeq[Double], k: Int,
      codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): DataFrame = {
    vecs.select(col(idCol), encode(col(vecCol), codebooks).as("codes"))
      .withColumn("adc_dist2", adc(col("codes"), q, codebooks))
      .orderBy(col("adc_dist2"), col(idCol))
      .limit(k)
  }
}
