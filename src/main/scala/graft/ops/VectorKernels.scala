package graft.ops

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight-loop JVM kernels for the vector math in [[SimilarityOps]],
  * invoked from generated code via `StaticInvoke` — same pattern (and
  * same ~50x motivation) as [[TextKernels]]: the Catalyst
  * higher-order-function forms (`aggregate(zip_with(...))`) evaluate
  * an interpreted, boxing lambda per element, which dominated q22/q23/
  * q42 in the round-1 bench.
  *
  * Arithmetic is IDENTICAL to the HOF forms kept in [[SimilarityOps]]
  * (`dotHof`/`bucketHof`, the executable spec): left-to-right IEEE
  * double summation, so kernel == HOF == DuckDB `list_sum` rendering
  * bit-for-bit. `OpsSpec` pins the equivalence.
  */
object VectorKernels {

  /** Malformed input must fail loudly: `ArrayData.getDouble` past the
    * unsafe buffer's end returns garbage (or crashes), silently
    * diverging from the HOF spec forms (which yield null on length
    * mismatch). A ragged embedding column is a data bug — surface it.
    */
  private def requireSameLength(n: Int, m: Int): Unit =
    if (n != m) throw new IllegalArgumentException(
      s"VectorKernels: embedding length mismatch ($n vs $m)")

  /** Exact left-to-right dot product over double arrays. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    requireSameLength(n, b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** One-pass cosine: dot/(|a|*|b|) with the three sums accumulated
    * independently — the same values the three separate HOF loops
    * produce.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    requireSameLength(n, b.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** Hyperplane coefficients for LSH table `t`, flattened
    * [bits * dims], memoized per JVM (they are pure functions of the
    * literal parameters).
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def planes(t: Int, dims: Int, bits: Int): Array[Double] =
    planeCache.computeIfAbsent((t, dims, bits), { key =>
      val (tt, d, bs) = key
      Array.tabulate(bs * d)(j => SimilarityOps.planeCoef(tt, j / d, j % d, d, bs))
    })

  /** Johnson–Lindenstrauss ±1 sign projection on the 1e-4 integer
    * grid: out_j = Σ_i ⌊v_i·10⁴ + 0.5⌋ · s(i,j), with the sign drawn
    * from the two-round Lehmer hash over the flattened (i·outDims + j)
    * index — [[MixOps.portableHash2]]'s exact constants, so the DuckDB
    * rendering can inline the identical integer formula. All-integer,
    * so the projection is order-free and hash-stable across engines.
    */
  def jlProject(v: ArrayData, outDims: Int, seed: Long): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](outDims)
    var i = 0
    while (i < n) {
      val u = math.floor(v.getDouble(i) * 10000 + 0.5).toLong
      var j = 0
      while (j < outDims) {
        val x = i.toLong * outDims + j
        val h1 = ((x % 2147483647L + seed) * 48271L) % 2147483647L
        val h2 = ((h1 + 1L) * 69621L) % 2147483647L
        out(j) += u * (1L - 2L * (h2 % 2L))
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Squared Euclidean distance on the same 1e-4 grid (exact longs —
    * the "original" side of the JL distortion ratio).
    */
  def gridSqDist(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    requireSameLength(n, b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = math.floor(a.getDouble(i) * 10000 + 0.5).toLong -
        math.floor(b.getDouble(i) * 10000 + 0.5).toLong
      acc += d * d
      i += 1
    }
    acc
  }

  /** Squared Euclidean distance between two long vectors (the
    * projected side of the JL distortion ratio).
    */
  def sqDistLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    requireSameLength(n, b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** LSH bucket signature: bit b = sign of the projection onto
    * hyperplane (t, b); left-to-right summation per projection.
    */
  def bucket(v: ArrayData, t: Int, dims: Int, bits: Int): Long = {
    requireSameLength(v.numElements(), dims)
    val p = planes(t, dims, bits)
    var sig = 0L
    var b = 0
    while (b < bits) {
      var proj = 0.0
      val off = b * dims
      var i = 0
      while (i < dims) { proj += v.getDouble(i) * p(off + i); i += 1 }
      if (proj > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
