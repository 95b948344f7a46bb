package graft.ops

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop JVM kernels for the text/dedup hash primitives, invoked
  * from generated code via `StaticInvoke` (see the Column wrappers in
  * [[TextOps]] / [[DedupOps]]).
  *
  * Why these exist: the same math is expressible with Catalyst
  * higher-order functions (transform/aggregate/zip_with), but HOFs are
  * interpreted per element with closure boxing — profiling the sf0.1
  * bench showed the per-character lambda chains dominating whole
  * queries (simhash: 33 s for 5k docs). A static JVM method inside
  * whole-stage codegen does the identical arithmetic ~50x faster and
  * keeps the surrounding projection in one codegen span.
  *
  * The formulas are EXACT int64 arithmetic, mirrored one-for-one by
  * the DuckDB oracle SQL ([[TextOps.tokenHashSql]] etc.) and by the
  * HOF fallbacks ([[TextOps.charHash]]); `OpsSpec` pins kernel ==
  * formula.
  */
object TextKernels {

  val P = 1000000007L
  private val Mix = 2654435761L
  private val MixMod = 1000003L

  /** Position-weighted character hash (code-unit level, matching the
    * split(c, "") + ascii() column formulation for BMP text).
    */
  def rawCharHash(s: String): Long = {
    var sum = 0L
    var i = 0
    while (i < s.length) {
      sum += s.charAt(i).toLong * (((i + 1) * Mix) % MixMod)
      i += 1
    }
    sum
  }

  def tokenHash(s: UTF8String): Long = rawCharHash(s.toString) % P

  private def tokensOf(s: UTF8String): Array[String] = {
    val t = s.toString.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Token hashes WITH multiplicity, in order. */
  def tokenHashes(s: UTF8String): ArrayData =
    new GenericArrayData(tokensOf(s).map(t => rawCharHash(t) % P))

  /** [[tokenHash]] of each element of a PRE-BOUND string array — the
    * array-input form of [[tokenHashes]] for callers that already
    * projected `tokens(text)` into a (checkpointed) column and must
    * not re-tokenize. Matches `list_transform(t, x -> tokenHash(x))`
    * in the oracle. Input arrays must be null-element-free (`tokens`
    * arrays are, by construction).
    */
  def hashArr(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = rawCharHash(a.getUTF8String(i).toString) % P
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Within-document token census over a pre-bound token array as
    * (token, count) STRUCT entries, one per DISTINCT token, first-
    * occurrence order — the q110 within-doc-collapse move for
    * censuses whose downstream needs the token text itself (inverted
    * indexes, vocab builds): the (token, doc) pairs leaving this
    * kernel are unique per doc BY CONSTRUCTION, so exploding it feeds
    * a term-keyed aggregate directly, with no (token, doc)-keyed
    * pre-census shuffle. (A hash-packed variant with a broadcast
    * string join-back measured SLOWER at 1× and 10× — the join-back
    * pass cost more than string keys; the in-kernel collapse is
    * where the win is.)
    */
  def tokenCensusEntries(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val counts =
      new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      val t = a.getUTF8String(i)
      val slot = counts.get(t)
      // clone on first sight: an UnsafeArrayData's UTF8Strings are
      // views into a buffer the scan reuses for the next row
      if (slot == null) counts.put(t.clone(), Array(1L)) else slot(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey, e.getValue()(0))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Packed adjacent-bigram fingerprints over a pre-bound token
    * array: element i = tokenHash(t_i) · P + tokenHash(t_{i+1}).
    * Both halves live in [0, P), so the packed value is < P² ≈
    * 1.0e18 < 2⁶³ (exact in BIGINT on both engines, no overflow
    * under DuckDB's checked arithmetic) and INVERTIBLE — `fp div P`
    * / `fp % P` recover the token hashes, which is what lets a
    * bigram census shuffle 8-byte longs instead of " "-joined
    * strings and still join its marginals back by hash.
    */
  def bigramFps(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = rawCharHash(a.getUTF8String(i).toString) % P
      i += 1
    }
    val out = new Array[Long](n - 1)
    i = 0
    while (i < n - 1) {
      out(i) = hs(i) * P + hs(i + 1)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ALL k-shingle hashes in token order, WITH multiplicity — the
    * positional form for substring-granular dedup: element i is the
    * hash of the k-gram starting at token i (0-based), so a caller
    * can posexplode it and recover exact token spans. Matches
    * `list_transform(ngrams, g -> tokenHash(g))` in the oracle.
    */
  def shingleHashSeq(s: UTF8String, k: Int): ArrayData = {
    val tok = tokensOf(s)
    if (tok.length < k) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](tok.length - k + 1)
    var i = 0
    while (i <= tok.length - k) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tok(i + j))
        j += 1
      }
      out(i) = rawCharHash(sb.toString) % P
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct k-shingle hashes, first-occurrence order (distinct on
    * the shingle STRINGS first, then on the hashes — matching
    * array_distinct(transform(array_distinct(shingles), hash))).
    */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val tok = tokensOf(s)
    if (tok.length < k) return new GenericArrayData(Array.empty[Long])
    val seenStr = new java.util.HashSet[String]()
    val seenHash = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](tok.length)
    var i = 0
    while (i <= tok.length - k) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tok(i + j))
        j += 1
      }
      val sh = sb.toString
      if (seenStr.add(sh)) {
        val h = rawCharHash(sh) % P
        if (seenHash.add(h)) out += h
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** MinHash signature over a distinct hash set (same a/b coefficient
    * streams as [[DedupOps.aCoef]]/[[DedupOps.bCoef]]).
    */
  def minhash(hashSet: ArrayData, numHashes: Int): ArrayData = {
    val hs = hashSet.toLongArray()
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val a = (j * Mix + 1L) % P
      val b = (j * 40503L + 17L) % P
      var best = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = (a * hs(i) + b) % P
        if (v < best) best = v
        i += 1
      }
      sig(j) = best
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** 32-bit SimHash over token hashes with multiplicity. */
  def simhash32(s: UTF8String): Long = {
    val tok = tokensOf(s)
    val counts = new Array[Long](32)
    var i = 0
    while (i < tok.length) {
      val h = rawCharHash(tok(i)) % P
      var b = 0
      while (b < 32) {
        counts(b) += ((h >> b) & 1L) * 2L - 1L
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Position-weighted document fingerprint (1-based token index). */
  def fingerprint(s: UTF8String): Long = {
    val tok = tokensOf(s)
    var sum = 0L
    var i = 0
    while (i < tok.length) {
      sum += (rawCharHash(tok(i)) % P) * (((i + 1) * Mix) % MixMod)
      i += 1
    }
    sum % P
  }

  private val ControlPattern = java.util.regex.Pattern.compile("[\\x00-\\x1F\\x7F]")
  private val SpaceRunPattern = java.util.regex.Pattern.compile("  +")

  /** Corpus text normalization: Unicode NFC composition (combining
    * marks fold into precomposed forms), C0-control + DEL strip,
    * space-run collapse, edge trim — the standard mojibake/control
    * cleanup pass before any hashing or tokenizing. Stage order
    * matters and is part of the contract (strip BEFORE collapse, so a
    * control char flanked by spaces leaves one space, not two).
    * Mirrored step-for-step by [[TextOps.normalizeTextSql]] (DuckDB
    * `nfc_normalize` + RE2 replaces); both sides implement
    * Unicode-standard NFC, so results agree on any input.
    */
  def normalizeText(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val stripped = ControlPattern.matcher(nfc).replaceAll("")
    val collapsed = SpaceRunPattern.matcher(stripped).replaceAll(" ")
    var lo = 0
    var hi = collapsed.length
    while (lo < hi && collapsed.charAt(lo) == ' ') lo += 1
    while (hi > lo && collapsed.charAt(hi - 1) == ' ') hi -= 1
    UTF8String.fromString(collapsed.substring(lo, hi))
  }

  /** Token-histogram Shannon entropy as integer micro-nats — the
    * kernel form of `TextOps.tokenEntropyMicro`/`tokenEntropyAgg`:
    * the same fixed parenthesization and 1e-6 floor per distinct
    * token, integer-summed (order-independent), so all three forms
    * agree exactly. Empty/blank text → 0 (a single empty token's
    * contribution is -1·ln(1) = 0, and so is no token at all).
    */
  def tokenEntropyMicro(s: UTF8String): Long = {
    val tok = tokensOf(s)
    if (tok.length == 0) return 0L
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < tok.length) {
      counts.merge(tok(i), 1L, (a, b) => a + b)
      i += 1
    }
    val n = tok.length.toDouble
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      sum += math.floor((-(c / n) * math.log(c / n)) * 1000000.0 + 0.5).toLong
    }
    sum
  }
}
