package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate — the mergeable-sketch aggregation tier
  * (SURVEY.md §2.11 "TypedImperativeAggregate (mutable buffer, e.g.
  * HLL/sketches)").
  *
  * Buffer = the k smallest 64-bit hashes seen. Exact while < k distinct
  * values; beyond that the estimator (k−1)/u₍k₎ (u₍k₎ = k-th minimum as a
  * fraction of hash space) has relative error ≈ 1/√(k−2). Buffers merge by
  * union-and-truncate, so partial aggregation and shuffle-combine work like
  * any built-in aggregate — constant state per group regardless of input
  * size, which is the entire point at 100 TB (exact distinct needs a
  * shuffle of every value; this needs k longs).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    md5Mode: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  /** Cross-engine hash tier (`md5Mode`): the 64-bit hash is the first 8
    * bytes (= first 16 hex chars) of md5 of the value's decimal/string
    * rendering — any engine with md5 reproduces the sketch and estimate
    * bit-for-bit (the q38/q37 md5-twin precedent), which is what puts q55
    * under the DuckDB hash oracle. The default tier stays the fast native
    * mix64 (hash choice is orthogonal to the sketch's guarantees). */
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  /** Hash biased by flipping the sign bit: natural (signed) ordering of the
    * stored value equals unsigned ordering of the raw hash, so a plain
    * TreeSet keeps the k unsigned-minimum hashes and
    * `stored − Long.MinValue` is the unsigned magnitude. */
  private def hash(v: Any): Long = {
    val h = if (md5Mode) {
      val s = v match {
        case u: UTF8String => u.toString
        case other => other.toString
      }
      ByteBuffer.wrap(
        md5.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        .getLong // big-endian, matching hex-literal parsing of the prefix
    } else v match {
      case s: UTF8String => Hashing.mix64(Hashing.fnv1a64(s.getBytes))
      case l: Long => Hashing.mix64(l)
      case i: Int => Hashing.mix64(i.toLong)
      case other => Hashing.mix64(Hashing.fnv1a64(other.toString))
    }
    h ^ Long.MinValue
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(hash(v))
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    while (a.size > k) a.remove(a.last)
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    if (buf.size < k) buf.size.toLong
    else {
      // u_k = k-th minimum as fraction of the unsigned 64-bit hash space.
      // The unsigned→double conversion goes through BigDecimal for a
      // SINGLE correctly-rounded rounding: the tempting
      // `stored.toDouble + 2^63` double-rounds (stored rounds at its own
      // ulp, the sum rounds again), which can land one ulp off what an
      // engine converting the unsigned value directly (DuckDB's
      // UBIGINT::DOUBLE) produces — the op order below is the oracle's.
      val raw = buf.last.longValue() ^ Long.MinValue // back to raw hash bits
      val kthD = new java.math.BigDecimal(
        java.lang.Long.toUnsignedString(raw)).doubleValue()
      val u = kthD / 18446744073709551616.0 // 2^64, exact as a double
      math.round((k - 1) / math.max(u, 1e-18))
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(l => bb.putLong(l))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = createAggregationBuffer()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}

object KmvSketch {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Approximate COUNT(DISTINCT c) with a k-entry mergeable sketch. */
  def kmv_distinct(c: Column, k: Int = 256): Column =
    column(KmvDistinct(expression(c), k).toAggregateExpression())

  /** The cross-engine twin: md5-derived hashes, so the sketch (and thus
    * the estimate) is reproducible in any engine with md5 — the oracled
    * tier (q55). */
  def kmv_distinct_md5(c: Column, k: Int = 256): Column =
    column(KmvDistinct(expression(c), k, md5Mode = true).toAggregateExpression())

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  /** Per-group KMV sketch ROWS over a distinct (group, u) hash frame:
    * the k smallest `uCol` values per group — u must be a uniform hash
    * in [0, 2^60) (the engine's u60 md5-prefix discipline, so the sketch
    * replays cross-engine). The rank ≤ k filter rides Spark's partial
    * WindowGroupLimit, so the exchange carries ≤ k rows per group — the
    * fixed-size-summary property that lets S sketches answer all S²/2
    * pair questions without re-touching the corpus. */
  def groupSketches(su: DataFrame, groupCol: String, uCol: String,
      k: Int = 256): DataFrame =
    su.withColumn("_rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col(uCol))))
      .filter(col("_rn") <= k)
      .select(col(groupCol), col(uCol))

  /** CROSS-GROUP OVERLAP ESTIMATES from per-group sketch rows (Beyer et
    * al. 2007, the q108 estimator — factored here per the r12 verdict so
    * production callers get the sketch-only path with no truth-join
    * scaffolding): for every group pair (ga < gb), re-rank the union of
    * the two sketches and read Jaccard from the top-k overlap —
    * ρ = |top-k ∩ both| / k, union ≈ (k−1)/u_k (u_k as a fraction of the
    * 2^60 hash space), intersection ≈ ρ·union. When the combined sketch
    * holds FEWER than k values both sketches were complete sets and the
    * small case is EXACT (nx < k branch). Integer outputs only
    * (jacc_milli = ⌊1000ρ⌋) — the q107 BIGINT determinism discipline.
    *
    * Input: `sk` as produced by [[groupSketches]] (≤ k rows per group,
    * ALL of them when the group has < k distinct hashes). Cost shape:
    * everything is sketch-sized — S·k rows exploded to pair memberships,
    * never the corpus. Returns (ga, gb, nx, c, union_est, inter_est,
    * jacc_milli_est) for all pairs of groups present in `sk`. */
  def overlapEstimates(sk: DataFrame, groupCol: String, uCol: String,
      k: Int = 256): DataFrame = {
    val g = sk.select(col(groupCol).as("_g")).distinct()
    val pairs = g.select(col("_g").as("ga"))
      .crossJoin(g.select(col("_g").as("gb")))
      .filter(col("ga") < col("gb"))
    val mem = pairs
      .withColumn("_m", explode(array(col("ga"), col("gb"))))
      .join(sk, col("_m") === sk(groupCol))
      .groupBy(col("ga"), col("gb"), col(uCol).as("_u"))
      .agg(max((col("_m") === col("ga")).cast("long")).as("in_a"),
        max((col("_m") === col("gb")).cast("long")).as("in_b"))
    val top = mem
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("ga"), col("gb")).orderBy(col("_u"))))
      .filter(col("_rn") <= k)
    top.groupBy(col("ga"), col("gb")).agg(
        count(lit(1)).as("nx"),
        max(when(col("_rn") === k, col("_u"))).as("kth"),
        sum(col("in_a") * col("in_b")).as("c"))
      .withColumn("union_est", expr(
        s"CASE WHEN nx < $k THEN nx ELSE CAST(round(${k - 1}.0 / " +
          "(CAST(kth AS DOUBLE) / 1152921504606846976.0)) AS BIGINT) END"))
      .withColumn("inter_est",
        expr(s"CASE WHEN nx < $k THEN c ELSE (c * union_est) DIV $k END"))
      .withColumn("jacc_milli_est",
        expr(s"(1000 * c) DIV greatest(CASE WHEN nx < $k THEN nx ELSE $k END, 1)"))
      .select(col("ga"), col("gb"), col("nx"), col("c"),
        col("union_est"), col("inter_est"), col("jacc_milli_est"))
  }
}
