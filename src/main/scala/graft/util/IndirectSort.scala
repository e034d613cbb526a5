package graft.util

/** Stable indirect merge sort over primitive index arrays: returns the
  * indices 0 until n ordered by `lt` (strict less-than); equal elements
  * keep ascending-index order. Sorting 2–5M pair indices through Scala's
  * boxed `sortBy` allocated an Integer + tuple per element on the
  * in-memory MST paths; this sorts two int arrays and boxes nothing. */
object IndirectSort {

  def sorted(n: Int)(lt: (Int, Int) => Boolean): Array[Int] = {
    val a = Array.range(0, n)
    if (n < 2) return a
    val tmp = new Array[Int](n)

    def merge(lo: Int, mid: Int, hi: Int): Unit = {
      System.arraycopy(a, lo, tmp, lo, hi - lo)
      var i = lo
      var j = mid
      var k = lo
      while (i < mid && j < hi) {
        // take the left element on ties → stability
        if (lt(tmp(j), tmp(i))) { a(k) = tmp(j); j += 1 }
        else { a(k) = tmp(i); i += 1 }
        k += 1
      }
      while (i < mid) { a(k) = tmp(i); i += 1; k += 1 }
      while (j < hi) { a(k) = tmp(j); j += 1; k += 1 }
    }

    // bottom-up: no recursion, runs double each pass
    var width = 1
    while (width < n) {
      var lo = 0
      while (lo < n - width) {
        val mid = lo + width
        val hi = math.min(lo + 2 * width, n)
        merge(lo, mid, hi)
        lo += 2 * width
      }
      width *= 2
    }
    a
  }
}
