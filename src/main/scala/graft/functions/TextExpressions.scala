package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text pipeline — operations Spark's
  * built-in function set can't express as a single scalar op (SURVEY.md
  * §2.11: custom `Expression` beats UDF beats everything else; these avoid
  * UDF serialization and evaluate directly on InternalRow).
  *
  * All hashing is self-contained FNV-1a (no library dependency, stable
  * across JVMs) so results are deterministic forever — the property the
  * reference gets from uuid5 (project/qdrant/consumer_post.py:56-60).
  */
object Hashing {
  final val FnvOffset: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L

  def fnv1a64(bytes: Array[Byte], seed: Long = FnvOffset): Long = {
    var h = seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def fnv1a64(s: String): Long = fnv1a64(s.getBytes("UTF-8"))

  /** Murmur3-style 64-bit finalizer. FNV-1a alone has weak high-bit
    * avalanche (a last-byte change barely moves the top 24 bits — measured:
    * "seed-0".."seed-3" produced near-identical doubles when divided by
    * Long.MaxValue, degenerating every hyperplane to a constant vector).
    * Use `mixed` whenever the HIGH bits or the sign of the hash matter. */
  def mix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def mixed(s: String): Long = mix64(fnv1a64(s))
}

/** Deterministic text → fixed-dim float embedding by signed feature hashing
  * (HashingTF-style), L2-normalized. Stands in for the reference's
  * SentenceTransformer encode (project/qdrant/consumer_post.py:91) — the
  * downstream contract is only "deterministic text → unit float vector"
  * (SURVEY.md X4). */
case class EmbedText(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val acc = new Array[Double](dim)
    val tokens = text.toLowerCase.trim.split("\\s+")
    var t = 0
    while (t < tokens.length) {
      val h = Hashing.fnv1a64(tokens(t))
      val bucket = java.lang.Math.floorMod(h, dim.toLong).toInt
      val sign = if ((h >>> 63) == 0L) 1.0 else -1.0
      acc(bucket) += sign
      t += 1
    }
    var normSq = 0.0
    var i = 0
    while (i < dim) { normSq += acc(i) * acc(i); i += 1 }
    val norm = math.sqrt(normSq)
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) {
      out(i) = if (norm == 0.0) acc(i).toFloat else (acc(i) / norm).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): EmbedText =
    copy(child = newChild)
  override def prettyName: String = "embed_text"
}

/** 64-bit SimHash over whitespace tokens — near-duplicate fingerprint where
  * Hamming distance ≤ k ⇔ high similarity (LLM-pipeline dedup extension). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val votes = new Array[Int](64)
    val tokens = text.toLowerCase.trim.split("\\s+")
    var t = 0
    while (t < tokens.length) {
      val h = Hashing.fnv1a64(tokens(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Polynomial rolling-hash document fingerprint mod 2⁶¹−1 (Karp–Rabin).
  * Whole-document content address; windowed variants reuse the same base. */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private final val Mod = (1L << 61) - 1
  private final val Base = 257L

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  /** (a*b) mod 2⁶¹−1 via 128-bit decomposition: a·b = hi·2⁶⁴ + lo and
    * 2⁶⁴ ≡ 8, 2⁶¹ ≡ 1 (mod M). */
  private def mulmod(a: Long, b: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & Mod) + (lo >>> 61) + (hi << 3)
    r = (r & Mod) + (r >>> 61)
    if (r >= Mod) r - Mod else r
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (mulmod(h, Base) + (bytes(i) & 0xffL)) % Mod
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

/** MinHash signature in one pass (k permutations approximated by universal
  * hashing over a single FNV-1a base hash per element: hᵢ = aᵢ·h + bᵢ with
  * odd multipliers — the standard one-strong-hash + k-cheap-mixes scheme).
  * O(|set|·k) multiply-adds per row vs k full string rehashes for the
  * HOF formulation — the difference between 117 s and ~2 s on the sf0.1
  * dedup benchmark.
  *
  * Accepts array<string> (elements FNV-hashed here) OR array<long>
  * (elements ARE the content hashes, e.g. from [[WordShingleHashes]]) —
  * identical signatures either way, since WordShingleHashes emits the same
  * FNV-1a of the shingle bytes. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private lazy val elemIsLong: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private lazy val as: Array[Long] = Array.tabulate(k)(i =>
    Hashing.fnv1a64(s"minhash-a-$i") | 1L) // odd multiplier
  private lazy val bs: Array[Long] = Array.tabulate(k)(i =>
    Hashing.fnv1a64(s"minhash-b-$i"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      val h = if (elemIsLong) arr.getLong(e)
        else Hashing.fnv1a64(arr.getUTF8String(e).getBytes)
      var i = 0
      while (i < k) {
        val v = as(i) * h + bs(i)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** All DISTINCT n-word shingle hashes of a document in ONE pass: lowercase
  * once, scan token boundaries once, stream FNV-1a over each shingle's
  * bytes (tokens joined by a single space — byte-identical to the
  * `concat_ws(" ", slice(tokens, i, n))` composition), sort + dedup.
  *
  * Replaces `array_distinct(transform(sequence(...), i => concat_ws(...
  * slice(split(...), i, n))))`, whose `split` subtree sits INSIDE the
  * higher-order-function lambda and is re-evaluated for every shingle
  * index — O(words² · len) regex work per document (measured: the
  * shingling stage, not the LSH join, was ~80% of q33/q36 wall time).
  *
  * Tokenization parity with `split(lower(trim(text)), "\\s+")`: trim
  * strips ASCII spaces only; a leading/trailing non-space whitespace run
  * yields one empty token (Java split with limit -1); empty text → one
  * empty token. Downstream consumers take Jaccard SET sizes, so emitting
  * hashes instead of strings changes nothing (64-bit collisions
  * negligible at any realistic shingle cardinality). */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].toLowerCase.getBytes
    var st = 0
    var en = bytes.length
    while (st < en && bytes(st) == ' ') st += 1
    while (en > st && bytes(en - 1) == ' ') en -= 1

    // token spans (start inclusive, end exclusive), split-with-limit=-1 parity
    var spanStart = new Array[Int](16); var spanEnd = new Array[Int](16)
    var w = 0
    def addSpan(s: Int, e: Int): Unit = {
      if (w == spanStart.length) {
        spanStart = java.util.Arrays.copyOf(spanStart, w * 2)
        spanEnd = java.util.Arrays.copyOf(spanEnd, w * 2)
      }
      spanStart(w) = s; spanEnd(w) = e; w += 1
    }
    if (st == en) addSpan(st, st) // empty text → single empty token
    else {
      var i = st
      if (isWs(bytes(i))) addSpan(i, i) // leading separator → leading ""
      while (i < en) {
        while (i < en && isWs(bytes(i))) i += 1
        if (i < en) {
          val s0 = i
          while (i < en && !isWs(bytes(i))) i += 1
          addSpan(s0, i)
        } else addSpan(i, i) // trailing separator → trailing ""
      }
    }

    val count = math.max(w - (n - 1), 1)
    val hashes = new Array[Long](count)
    var s = 0
    while (s < count) {
      val last = math.min(s + n, w)
      var h = Hashing.FnvOffset
      var j = s
      while (j < last) {
        if (j > s) { h ^= ' '.toLong; h *= Hashing.FnvPrime }
        var b = spanStart(j)
        val e = spanEnd(j)
        while (b < e) { h ^= (bytes(b) & 0xffL); h *= Hashing.FnvPrime; b += 1 }
        j += 1
      }
      hashes(s) = h
      s += 1
    }
    java.util.Arrays.sort(hashes)
    var out = 1
    var i = 1
    while (i < count) {
      if (hashes(i) != hashes(i - 1)) { hashes(out) = hashes(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, out))
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "word_shingle_hashes"
}

/** One-pass DISTINCT md5 word-n-gram shingles as hex strings — q98's
  * ingest-gate kernel. The HOF formulation (`transform(sequence(...), i =>
  * md5(concat_ws(" ", slice(toks, i+1, n))))`) runs in interpreted
  * HigherOrderFunction context where the tokenizing split re-evaluates
  * per shingle index (the r8 SemDeDup interpreted-HOF cost class —
  * measured 70 s at a 50k-doc scale cell); this expression tokenizes
  * once per ROW and feeds byte spans straight into the digest. Output
  * parity: md5 hex of the single-space-joined tokens ≡
  * `md5(array_to_string(toks[i+1:i+n], ' '))` over
  * `regexp_split_to_array(lower(trim(text)), '\s+')` in any engine.
  * Docs with fewer than `n` tokens emit an EMPTY array (they cannot
  * near-dup — unlike [[WordShingleHashes]]'s Jaccard semantics, which
  * keeps one short whole-doc gram). */
case class Md5WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].toLowerCase.getBytes
    var st = 0
    var en = bytes.length
    while (st < en && bytes(st) == ' ') st += 1
    while (en > st && bytes(en - 1) == ' ') en -= 1

    // token spans — identical split-with-limit=-1 parity to WordShingleHashes
    var spanStart = new Array[Int](16); var spanEnd = new Array[Int](16)
    var w = 0
    def addSpan(s: Int, e: Int): Unit = {
      if (w == spanStart.length) {
        spanStart = java.util.Arrays.copyOf(spanStart, w * 2)
        spanEnd = java.util.Arrays.copyOf(spanEnd, w * 2)
      }
      spanStart(w) = s; spanEnd(w) = e; w += 1
    }
    if (st == en) addSpan(st, st)
    else {
      var i = st
      if (isWs(bytes(i))) addSpan(i, i)
      while (i < en) {
        while (i < en && isWs(bytes(i))) i += 1
        if (i < en) {
          val s0 = i
          while (i < en && !isWs(bytes(i))) i += 1
          addSpan(s0, i)
        } else addSpan(i, i)
      }
    }

    val count = w - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val sep = Array(' '.toByte)
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var s = 0
    while (s < count) {
      md.reset()
      var j = s
      while (j < s + n) {
        if (j > s) md.update(sep)
        md.update(bytes, spanStart(j), spanEnd(j) - spanStart(j))
        j += 1
      }
      val d = md.digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = hexDigits((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = hexDigits(d(b) & 0xf)
        b += 1
      }
      seen.add(new String(hex))
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5WordShingles =
    copy(child = newChild)
  override def prettyName: String = "md5_word_shingles"
}

/** ONE left-to-right pass of a learned BPE merge over a token array —
  * q103's per-round kernel. Scans i = 0..n−1: when (ts(i), ts(i+1)) =
  * (a, b), emits a ++ b and advances by 2 (non-overlapping, greedy
  * left-to-right — "aaa" under (a,a) → ["aa","a"]); otherwise emits
  * ts(i). The merge pair is a per-round CONSTANT (constructor params,
  * folded into the plan — no join, no shuffle: the whole application is
  * map-side over the vocabulary table). Exactly replayable in SQL via
  * the run-parity window formulation (consecutive matching positions can
  * only arise when a = b, and the greedy scan selects even offsets
  * within each run — the q103 oracle derives precisely that). */
case class BpeMergeOnce(child: Expression, a: String, b: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private lazy val ua = UTF8String.fromString(a)
  private lazy val ub = UTF8String.fromString(b)
  private lazy val uab = UTF8String.fromString(a + b)

  override def nullSafeEval(input: Any): Any = {
    val ts = input.asInstanceOf[ArrayData]
    val n = ts.numElements()
    val out = new Array[Any](n)
    var w = 0
    var i = 0
    while (i < n) {
      val t = ts.getUTF8String(i)
      if (i + 1 < n && t == ua && ts.getUTF8String(i + 1) == ub) {
        out(w) = uab; w += 1; i += 2
      } else {
        out(w) = t; w += 1; i += 1
      }
    }
    if (w == n) new GenericArrayData(out)
    else new GenericArrayData(
      java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], w))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeOnce =
    copy(child = newChild)
  override def prettyName: String = "bpe_merge_once"
}

/** Hamming distance between two 64-bit fingerprints (companion to SimHash64). */
case class HammingDist64(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(
      java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDist64 =
    copy(left = l, right = r)
  override def prettyName: String = "hamming64"
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def embed_text(c: Column, dim: Int): Column = column(EmbedText(expression(c), dim))
  def minhash_sig(c: Column, k: Int): Column = column(MinHashSig(expression(c), k))
  def word_shingle_hashes(c: Column, n: Int): Column =
    column(WordShingleHashes(expression(c), n))
  def md5_word_shingles(c: Column, n: Int): Column =
    column(Md5WordShingles(expression(c), n))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def rolling_hash(c: Column): Column = column(RollingHash(expression(c)))
  def hamming64(a: Column, b: Column): Column =
    column(HammingDist64(expression(a), expression(b)))
  def bpe_merge_once(c: Column, a: String, b: String): Column =
    column(BpeMergeOnce(expression(c), a, b))
}
