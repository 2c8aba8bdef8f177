package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graftshim.GraftShim.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM hash kernels, shared by interpreted eval and generated code.
  * Being a static object keeps doGenCode a one-line static call — the
  * expression stays inside whole-stage codegen (no virtual dispatch, no
  * boxing) while the kernel itself is plain branch-free long arithmetic.
  */
object GraftHashes {
  /** 64-bit polynomial rolling hash (Rabin-Karp style, base 1099511628211L —
    * the FNV prime — over UTF-8 bytes). Deterministic document fingerprint;
    * O(n) per row, embarrassingly parallel — no shuffle at any scale.
    */
  def rollingHash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L // FNV offset basis
    var i = 0
    while (i < bytes.length) {
      h = h * 1099511628211L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** Stafford variant 13 of the splitmix64 finalizer — cheap, well-mixed
    * per-token 64-bit hash (public-domain constant set).
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def tokenHash(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L
      i += 1
    }
    mix64(h)
  }

  /** Hashes of all whitespace tokens in one byte pass (no String
    * allocation, no split array).
    */
  private def tokenHashes(bytes: Array[Byte]): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](16)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        if (i > start) out += tokenHash(bytes, start, i)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  /** Hashes of all 3-token shingles: shingle hash = mix of the three
    * token hashes (order-sensitive). Texts with <3 tokens hash as one
    * whole-text shingle. One pass; O(tokens) — the string-shingle
    * equivalent (concat + rehash per shingle per lane) is O(chars·k).
    */
  def shingleHashes64(s: UTF8String): Array[Long] = {
    val th = tokenHashes(s.getBytes)
    if (th.length < 3)
      return Array(mix64(tokenHash(s.getBytes, 0, s.getBytes.length)))
    val out = new Array[Long](th.length - 2)
    var i = 2
    while (i < th.length) {
      out(i - 2) = mix64(th(i - 2) * 0x9e3779b97f4a7c15L ^
        th(i - 1) * 0xc2b2ae3d27d4eb4fL ^ th(i))
      i += 1
    }
    out
  }

  /** k-lane MinHash signature over the shingle hashes, all lanes in one
    * pass: lane j's permutation is mix64(shingle ^ seed_j). This is the
    * per-row (shuffle-free) half of MinHash-LSH dedup; cost O(shingles·k)
    * cheap mixes instead of k full re-hashes of each shingle string.
    */
  def minhashSig(s: UTF8String, k: Int, seedBase: Long): Array[Long] = {
    val sh = shingleHashes64(s)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var j = 0
      while (j < k) {
        val h = mix64(sh(i) ^ (seedBase + j * 0x9e3779b97f4a7c15L))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  // ArrayData wrappers for codegen static calls
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  def shingleHashesData(s: UTF8String): ArrayData =
    new GenericArrayData(shingleHashes64(s))
  def minhashSigData(s: UTF8String, k: Int, seedBase: Long): ArrayData =
    new GenericArrayData(minhashSig(s, k, seedBase))

  /** Deterministic random hyperplanes for sign-LSH: 32 planes × 64 dims,
    * derived from a fixed splitmix stream, mapped to [-1, 1). Held as a
    * JVM constant — an expression-tree encoding of the same planes (32
    * aggregate/zip_with subtrees + a 2048-double literal) blows past
    * JIT/codegen method limits and falls back to interpreted eval
    * (measured 19 s vs <1 s at sf0.1).
    */
  val LSH_PLANES = 32
  val LSH_DIMS = 64
  lazy val lshPlanes: Array[Array[Double]] =
    Array.tabulate(LSH_PLANES, LSH_DIMS) { (p, d) =>
      (mix64(p.toLong * 131071L + d) >>> 11).toDouble /
        (1L << 52).toDouble * 2.0 - 1.0
    }

  /** 32-bit packed sign-LSH signature of a float-array embedding: one
    * pass, 32×dims multiply-adds, no allocation.
    */
  def signLsh32(arr: ArrayData): Long = {
    val n = math.min(arr.numElements(), LSH_DIMS)
    var sig = 0L
    var p = 0
    while (p < LSH_PLANES) {
      val plane = lshPlanes(p)
      var s = 0.0
      var d = 0
      while (d < n) { s += arr.getFloat(d) * plane(d); d += 1 }
      if (s >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Polynomial hash mod 1e9+7 over code points — deliberately chosen so a
    * DuckDB oracle can replay it exactly (list_reduce over ord(); modular
    * state stays far under BIGINT overflow, which DuckDB treats as an
    * error rather than wrapping — the 64-bit wrapping kernels above are
    * faster but cross-engine-unverifiable). One pass, codegen'd.
    */
  def polyHashMod(s: UTF8String): Long = {
    var h = 0L
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  /** Dot product of two float arrays accumulated in double, sequentially —
    * the SAME IEEE operation order as both `aggregate(zip_with(...))` (a
    * left fold) and DuckDB's `list_reduce(list_prepend(0.0, ...))`, so
    * swapping this kernel in changes nothing the oracle can observe. The
    * point of the swap: higher-order functions are CodegenFallback in
    * Spark (per-row interpreted lambdas + a zipped-array allocation);
    * this is a branch-free fused loop inside whole-stage codegen.
    */
  def floatDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Double-array twin of [[floatDot]] — the same sequential left fold
    * (products and accumulation in double), so it is bit-identical to
    * the `aggregate(zip_with(a, b, *), 0D, +)` HOF formulation AND to
    * DuckDB's list_reduce replay; it just stays inside codegen where
    * the HOF pipeline drops to interpreted eval.
    */
  def doubleDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Cardinality of the intersection of two SORTED-DISTINCT long arrays:
    * a single merge pass, zero allocation — replaces the per-pair
    * array_intersect + array_union hash-set builds in Jaccard verify
    * (|A∪B| falls out as |A|+|B*|-|A∩B| when the arrays are distinct).
    */
  def sortedIntersectCard(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  private val spaceSep = UTF8String.fromString(" ")

  /** Space-join of `toks` minus the 0-based positions in SORTED `rem` —
    * byte-identical to `concat_ws(' ', filter(toks, (t, i) -> NOT
    * array_contains(rem, i)))` (null elements skipped without a
    * separator, concat_ws semantics), but a single two-pointer merge:
    * O(len + removed) where the HOF's per-token array_contains scan is
    * O(len × removed) — quadratic on a boilerplate-heavy doc with most
    * tokens removed (the dd32/dd33 cleaned-text rebuild, VERDICT r10
    * finding 3).
    */
  def removeTokensAt(toks: ArrayData, rem: ArrayData): UTF8String = {
    val n = toks.numElements(); val m = rem.numElements()
    val kept = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var i = 0; var j = 0
    while (i < n) {
      while (j < m && rem.getInt(j) < i) j += 1
      if (!(j < m && rem.getInt(j) == i) && !toks.isNullAt(i))
        kept += toks.getUTF8String(i)
      i += 1
    }
    UTF8String.concatWs(spaceSep, kept.toSeq: _*)
  }

  /** 3-token shingle STRINGS with the exact semantics of
    * `split(text, ' ')` + `concat_ws` (empty tokens preserved, <3 tokens
    * collapses to the whole text) — the portable construction the DuckDB
    * oracles replay with string_split. One pass; exists because the HOF
    * expression tree doing the same work is interpreted.
    */
  def shingleStrings(s: UTF8String): ArrayData = {
    val text = s.toString
    val tk = new scala.collection.mutable.ArrayBuffer[String](16)
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        tk += text.substring(start, i) // empty tokens kept (split semantics)
        start = i + 1
      }
      i += 1
    }
    if (tk.length < 3)
      return new GenericArrayData(Array[Any](s.copy()))
    val out = new Array[Any](tk.length - 2)
    var j = 0
    while (j < tk.length - 2) {
      out(j) = UTF8String.fromString(tk(j) + " " + tk(j + 1) + " " + tk(j + 2))
      j += 1
    }
    new GenericArrayData(out)
  }

  private val HEX = "0123456789abcdef".getBytes

  /** Per-lane minima of md5(shingle || '#' || lane) over a string array —
    * dd08's oracle-portable MinHash signature in one fused pass (byte-
    * identical to array_min(transform(sh, x -> md5(concat(x, '#k'))))
    * which evaluated interpreted, once per lane).
    */
  def md5MinLanes(arr: ArrayData, lanes: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Any](lanes)
    var i = 0
    while (i < arr.numElements()) {
      val sh = arr.getUTF8String(i).getBytes
      var k = 0
      while (k < lanes) {
        md.reset()
        md.update(sh)
        md.update('#'.toByte)
        md.update(('0' + k).toByte) // lanes ≤ 10 by construction
        val digest = md.digest()
        val hex = new Array[Byte](32)
        var b = 0
        while (b < 16) {
          hex(2 * b) = HEX((digest(b) >> 4) & 0xf)
          hex(2 * b + 1) = HEX(digest(b) & 0xf)
          b += 1
        }
        val h = UTF8String.fromBytes(hex)
        if (mins(k) == null ||
            h.compareTo(mins(k).asInstanceOf[UTF8String]) < 0) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** dd18's oracle-portable SimHash in one fused pass: split on single
    * spaces (Java `split(" ", -1)` semantics — empty tokens kept, byte
    * 0x20 never occurs inside a UTF-8 multibyte sequence), md5 each
    * token, majority-vote the first 64 digest bits MSB-first (bit j =
    * bit 7-(j&7) of digest byte j>>3 — exactly the hex-nibble order the
    * DuckDB oracle reads via substr/instr), emit a 64-char '0'/'1'
    * string. Byte-identical to the HOF formulation
    * (transform(sequence(0,63), j -> ... filter(sigs, ...))), which
    * evaluated interpreted at ~64× the cost (measured 12.3 s at sf0.1).
    */
  def md5SimHashBits(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    var n = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var j = 0
        while (j < 64) {
          if (((d(j >> 3) >> (7 - (j & 7))) & 1) == 1) counts(j) += 1
          j += 1
        }
        n += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      out(j) = if (2 * counts(j) >= n) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Marker-token masks for textStats: bit0 = stopword {the,a,of,to,and},
    * bit1 = en, bit2 = es, bit3 = de, bit4 = fr profile hit. All markers
    * are ≤3 ASCII bytes, so only short tokens pay the map lookup.
    */
  private val markerMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    def put(w: String, mask: Int): Unit = m.put(w, mask)
    Seq("the" -> 3, "a" -> 3, "of" -> 3, "and" -> 3, "to" -> 1,
      "el" -> 4, "de" -> 4, "y" -> 4, "la" -> 20,
      "der" -> 8, "die" -> 8, "und" -> 8, "ein" -> 8,
      "le" -> 16, "et" -> 16, "un" -> 16).foreach((put _).tupled)
    m
  }

  /** One-pass text statistics — the fused kernel behind tx01/02/03/06/10.
    * Replaces 4 interpreted HOF lambda passes (split + per-language
    * filter) plus 2 regexp_replace passes per row with a single scan of
    * the UTF-8 bytes. Semantics are bit-identical to the expression-tree
    * formulations the DuckDB oracles mirror:
    *   n_tokens   = length(t) - length(replace(t,' ','')) + 1   (spaces+1)
    *   n_nospace  = non-space character count (code points)
    *   n_stop     = tokens ∈ {the,a,of,to,and}   (split-on-' ' tokens)
    *   n_subwords = Σ ceil(chars(token)/4)        (empty tokens → 0)
    *   pred_lang / pred_score = argmax over 4 language marker profiles,
    *     ties → lexicographically greatest lang (the sort_array desc
    *     (score, lang) struct tie-break tx03's oracle replays).
    */
  def textStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    var spaces = 0; var chars = 0L
    var nStop = 0L; var nSub = 0L
    var en = 0; var es = 0; var de = 0; var fr = 0
    var start = 0; var tokChars = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        if (i < bytes.length) spaces += 1
        nSub += (tokChars + 3) / 4 // ceil(chars/4); empty token → 0
        val bl = i - start
        if (bl >= 1 && bl <= 3) {
          val mask = markerMask.getOrDefault(
            new String(bytes, start, bl, java.nio.charset.StandardCharsets.UTF_8), 0)
          if ((mask & 1) != 0) nStop += 1
          if ((mask & 2) != 0) en += 1
          if ((mask & 4) != 0) es += 1
          if ((mask & 8) != 0) de += 1
          if ((mask & 16) != 0) fr += 1
        }
        start = i + 1; tokChars = 0
      } else if ((bytes(i) & 0xC0) != 0x80) { // code points, not bytes
        chars += 1; tokChars += 1
      }
      i += 1
    }
    // argmax with greatest-lang tie-break: visit langs ascending and take
    // score >= best, so the last equal max (greatest lang) wins.
    var predLang = "de"; var predScore = de
    if (en >= predScore) { predLang = "en"; predScore = en }
    if (es >= predScore) { predLang = "es"; predScore = es }
    if (fr >= predScore) { predLang = "fr"; predScore = fr }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](spaces + 1L, chars, nStop, nSub,
        UTF8String.fromString(predLang), predScore))
  }

  /** One-pass per-doc REPETITION statistics (Gopher §A1.1 family):
    * token count, distinct-token count, most-common-bigram count, total
    * bigrams — all from token/bigram HASHES (sort + longest-run instead
    * of a per-row hash map: zero boxing, one long[] each). Tokenization
    * follows split(' ') semantics exactly (empty spans between
    * consecutive separators count as tokens) so the outputs match the
    * string-based oracle; distinct/top counts differ from the string
    * computation only on a 64-bit collision inside one document
    * (P ≈ n²·2⁻⁶⁴ — the dd10 argument). Per-row, shuffle-free: the
    * 100 TB shape for a per-document statistic.
    */
  def repetitionStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    var n = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) n += 1
      i += 1
    }
    val th = new Array[Long](n)
    var start = 0; var idx = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        th(idx) = tokenHash(bytes, start, i)
        idx += 1
        start = i + 1
      }
      i += 1
    }
    val sorted = th.clone()
    java.util.Arrays.sort(sorted)
    var distinct = 1L
    i = 1
    while (i < n) {
      if (sorted(i) != sorted(i - 1)) distinct += 1
      i += 1
    }
    var top = 0L; var nbg = 0L
    if (n >= 2) {
      val bg = new Array[Long](n - 1)
      i = 0
      while (i < n - 1) {
        bg(i) = mix64(th(i) * 0x9e3779b97f4a7c15L ^ th(i + 1))
        i += 1
      }
      java.util.Arrays.sort(bg)
      var run = 1L; top = 1L
      i = 1
      while (i < n - 1) {
        if (bg(i) == bg(i - 1)) { run += 1; if (run > top) top = run }
        else run = 1
        i += 1
      }
      nbg = n - 1L
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, distinct, top, nbg))
  }

  /** One-pass a-z+space histogram moments for tx22's diversity score:
    * (n, Σc², max c) over the 27-letter alphabet. Counting BYTES equals
    * counting code points here because the targets are ASCII and UTF-8
    * continuation bytes (0x80-0xBF) never collide with ASCII — the same
    * occurrence count `length(t) - length(replace(t, ch, ''))` yields,
    * which is what keeps the kernel byte-identical to the portable
    * oracle formulation. One array, no boxing, no string copies (the
    * 27×replace formulation allocated ~100 rewritten strings per row
    * after projection collapse — measured 2.05 s vs 0.5 s at sf0.1).
    */
  def charDiversity(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val counts = new Array[Long](27)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a'.toByte && b <= 'z'.toByte) counts(b - 'a'.toByte) += 1
      else if (b == ' '.toByte) counts(26) += 1
      i += 1
    }
    var n = 0L; var ssq = 0L; var mx = 0L
    var k = 0
    while (k < 27) {
      val c = counts(k)
      n += c; ssq += c * c; if (c > mx) mx = c
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, ssq, mx))
  }

  /** Flesch-Kincaid input counters in one byte pass: words = spaces + 1
    * (the string_split-on-' ' count), sentences = count of . ! ?,
    * syllables ~= vowel-group starts (a vowel whose previous char is
    * not one — the standard cheap estimator).
    */
  def readabilityStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    var spaces = 0L; var sents = 0L; var syl = 0L
    var prevVowel = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' '.toByte) spaces += 1
      else if (b == '.'.toByte || b == '!'.toByte || b == '?'.toByte)
        sents += 1
      val v = b == 'a'.toByte || b == 'e'.toByte || b == 'i'.toByte ||
        b == 'o'.toByte || b == 'u'.toByte || b == 'A'.toByte ||
        b == 'E'.toByte || b == 'I'.toByte || b == 'O'.toByte ||
        b == 'U'.toByte
      if (v && !prevVowel) syl += 1
      prevVowel = v
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](spaces + 1L, sents, syl))
  }

  /** 64-bit SimHash over whitespace-delimited tokens: each token votes its
    * hash bits +1/-1; the sign vector is the fingerprint. Near-duplicate
    * docs land within small Hamming distance. Single pass over the bytes,
    * no tokens array allocated.
    */
  def simhash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        if (i > start) {
          val h = tokenHash(bytes, start, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Base for string→long hash expressions with codegen via a static call.
  * ImplicitCastInputTypes: analysis inserts a cast (or rejects the call
  * with a type error) instead of letting a wrong-typed column reach the
  * kernel's unsafe getters — the REPL/HTTP SQL surface exposes these.
  */
abstract class HashExpr extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  /** Static method name on GraftHashes; interpreted eval and generated
    * code both dispatch to it.
    */
  protected def kernel: String
  protected def evalKernel(s: UTF8String): Long

  override protected def nullSafeEval(input: Any): Any =
    evalKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.$kernel($c)")
}

/** Rolling-hash document fingerprint (SURVEY §7.2 item 8: text analysis /
  * document fingerprinting). Reference has no equivalent — extension op.
  */
case class RollingHash64(child: Expression) extends HashExpr {
  override def prettyName: String = "rolling_hash64"
  override protected def kernel: String = "rollingHash64"
  override protected def evalKernel(s: UTF8String): Long =
    GraftHashes.rollingHash64(s)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Cross-engine-verifiable polynomial fingerprint (SURVEY §7.2 item 8:
  * document fingerprinting, oracle-checked variant of RollingHash64).
  */
case class PolyHashMod(child: Expression) extends HashExpr {
  override def prettyName: String = "poly_hash_mod"
  override protected def kernel: String = "polyHashMod"
  override protected def evalKernel(s: UTF8String): Long =
    GraftHashes.polyHashMod(s)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** SimHash near-duplicate fingerprint (SURVEY §7.2 item 8: dedup). */
case class SimHash64(child: Expression) extends HashExpr {
  override def prettyName: String = "simhash64"
  override protected def kernel: String = "simhash64"
  override protected def evalKernel(s: UTF8String): Long =
    GraftHashes.simhash64(s)
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** All 3-token shingle hashes of a text (array<bigint>). Basis for
  * MinHash-LSH dedup and n-gram Jaccard (SURVEY §7.2 item 8).
  */
case class ShingleHashes64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def prettyName: String = "shingle_hashes64"
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    GraftHashes.shingleHashesData(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.shingleHashesData($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** k-lane MinHash signature (array<bigint>) of a text's shingle set. */
case class MinHashSig(child: Expression, k: Int, seedBase: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "minhash_sig"
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    GraftHashes.minhashSigData(input.asInstanceOf[UTF8String], k, seedBase)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.minhashSigData($c, $k, ${seedBase}L)")
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** 3-token shingle strings of a text (array<string>), split-semantics
  * faithful — basis of the oracle-portable dd08/dd09 kernels.
  */
case class ShingleStrings(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def prettyName: String = "shingle_strings"
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    GraftHashes.shingleStrings(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.shingleStrings($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Oracle-portable SimHash bit string (64 chars of '0'/'1') — dd18's
  * fused kernel; see GraftHashes.md5SimHashBits for the bit order the
  * DuckDB twin replays.
  */
case class Md5SimHashBits(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "md5_simhash_bits"
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    GraftHashes.md5SimHashBits(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.md5SimHashBits($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Per-lane md5 minima over a string array (array<string>, one entry per
  * lane) — dd08's fused signature kernel.
  */
case class Md5MinLanes(child: Expression, lanes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "md5_min_lanes"
  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    GraftHashes.md5MinLanes(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], lanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.md5MinLanes($c, $lanes)")
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Exact double dot product of two array<float> columns — the codegen'd
  * hot kernel behind cosine similarity search and embedding near-dup
  * (SURVEY §7.2 item 8). Result is bit-identical to the HOF formulation
  * (sequential left fold) — see GraftHashes.floatDot.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "float_dot"
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftHashes.floatDot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraftHashes.floatDot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact dot product of two array<double> columns — see
  * [[GraftHashes.doubleDot]] for the fold-parity contract.
  */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "double_dot"
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(org.apache.spark.sql.types.DoubleType),
      ArrayType(org.apache.spark.sql.types.DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftHashes.doubleDot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraftHashes.doubleDot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two sorted-distinct array<bigint> columns
  * — the codegen'd pair-verification kernel for Jaccard dedup.
  */
case class SortedIntersectCard(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "sorted_intersect_card"
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftHashes.sortedIntersectCard(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraftHashes.sortedIntersectCard($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Linear cleaned-text rebuild — see [[GraftHashes.removeTokensAt]]. */
case class RemoveTokensAt(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "remove_tokens_at"
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(StringType), ArrayType(IntegerType))
  override def dataType: DataType = StringType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftHashes.removeTokensAt(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraftHashes.removeTokensAt($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 32-bit sign-LSH signature of an array<float> embedding column. */
case class SignLsh32(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def prettyName: String = "sign_lsh32"
  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    GraftHashes.signLsh32(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHashes.signLsh32($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** One-pass fused text statistics (see GraftHashes.textStats): the hot
  * kernel behind tx01/02/03/06/10 — token counts, stopword hits, subword
  * estimate and language-ID argmax from a single byte scan, inside
  * whole-stage codegen. Referencing several fields of one TextStats call
  * costs one evaluation (codegen subexpression elimination), where the
  * equivalent HOF subtrees were interpreted AND re-evaluated per output
  * column (the r2 tx perf regression).
  */
case class TextStats(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def prettyName: String = "text_stats"
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = TextStats.schema
  override protected def nullSafeEval(input: Any): Any =
    GraftHashes.textStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHashes.textStats($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_nospace", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("pred_lang", StringType, nullable = false),
    StructField("pred_score", IntegerType, nullable = false)))
}

/** Per-doc repetition statistics — see [[GraftHashes.repetitionStats]]. */
case class RepetitionStats(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def prettyName: String = "repetition_stats"
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = RepetitionStats.schema
  override protected def nullSafeEval(input: Any): Any =
    GraftHashes.repetitionStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.repetitionStats($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))
}

/** Per-doc a-z+space histogram moments — see [[GraftHashes.charDiversity]]. */
case class CharDiversity(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def prettyName: String = "char_diversity"
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = CharDiversity.schema
  override protected def nullSafeEval(input: Any): Any =
    GraftHashes.charDiversity(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.charDiversity($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object CharDiversity {
  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("ssq", LongType, nullable = false),
    StructField("mx", LongType, nullable = false)))
}

/** One-pass readability counters (words, sentence enders, vowel-group
  * starts as the syllable estimate) — the Flesch-Kincaid inputs, fused
  * into one codegen kernel per the CollapseProject lesson (three
  * HOF/replace pipelines over the same text would each rescan it).
  * Byte iteration is multibyte-safe: the classes tested (space, .!?,
  * aeiouAEIOU) are ASCII, and UTF-8 continuation bytes match none.
  */
case class ReadabilityStats(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def prettyName: String = "readability_stats"
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = ReadabilityStats.schema
  override protected def nullSafeEval(input: Any): Any =
    GraftHashes.readabilityStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.readabilityStats($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object ReadabilityStats {
  val schema: StructType = StructType(Seq(
    StructField("words", LongType, nullable = false),
    StructField("sentences", LongType, nullable = false),
    StructField("syllables", LongType, nullable = false)))
}

/** Column wrappers + SQL registration for the custom expressions. */
object GraftFunctions {
  import org.apache.spark.sql.graftshim.GraftShim

  def rolling_hash64(c: Column): Column =
    GraftShim.column(RollingHash64(GraftShim.expression(c)))
  def poly_hash_mod(c: Column): Column =
    GraftShim.column(PolyHashMod(GraftShim.expression(c)))
  def simhash64(c: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(c)))
  def shingle_hashes64(c: Column): Column =
    GraftShim.column(ShingleHashes64(GraftShim.expression(c)))
  def sign_lsh32(c: Column): Column =
    GraftShim.column(SignLsh32(GraftShim.expression(c)))
  def minhash_sig(c: Column, k: Int, seedBase: Long = 0L): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(c), k, seedBase))
  def shingle_strings(c: Column): Column =
    GraftShim.column(ShingleStrings(GraftShim.expression(c)))
  def md5_min_lanes(c: Column, lanes: Int): Column =
    GraftShim.column(Md5MinLanes(GraftShim.expression(c), lanes))
  def md5_simhash_bits(c: Column): Column =
    GraftShim.column(Md5SimHashBits(GraftShim.expression(c)))
  def float_dot(a: Column, b: Column): Column =
    GraftShim.column(FloatDot(GraftShim.expression(a), GraftShim.expression(b)))
  def double_dot(a: Column, b: Column): Column =
    GraftShim.column(DoubleDot(GraftShim.expression(a), GraftShim.expression(b)))
  def sorted_intersect_card(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectCard(
      GraftShim.expression(a), GraftShim.expression(b)))
  def text_stats(c: Column): Column =
    GraftShim.column(TextStats(GraftShim.expression(c)))
  def repetition_stats(c: Column): Column =
    GraftShim.column(RepetitionStats(GraftShim.expression(c)))
  def char_diversity(c: Column): Column =
    GraftShim.column(CharDiversity(GraftShim.expression(c)))
  def readability_stats(c: Column): Column =
    GraftShim.column(ReadabilityStats(GraftShim.expression(c)))
  def bpe_subword_count(c: Column, spec: String): Column =
    GraftShim.column(BpeSubwordCount(GraftShim.expression(c), spec))
  def remove_tokens_at(toks: Column, rem: Column): Column =
    GraftShim.column(RemoveTokensAt(
      GraftShim.expression(toks), GraftShim.expression(rem)))

  /** Make the functions callable from spark.sql text. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "rolling_hash64", es => RollingHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "simhash64", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "poly_hash_mod", es => PolyHashMod(es.head), "scala_udf")
    // 2nd arg = the merge-table spec, a foldable string literal (build
    // it with graft_op('tx34_bpe_merges') or pass a saved table's
    // "lhs rhs" lines joined by \n). A NULL or non-foldable spec is an
    // error, not the empty spec: silently degrading to zero merges
    // would return per-character counts — a quiet wrong answer on the
    // REPL/HTTP surface (ADVICE r10).
    reg.createOrReplaceTempFunction(
      "bpe_subword_count",
      es => {
        if (es.length != 2) throw new IllegalArgumentException(
          "bpe_subword_count(text, spec) takes exactly 2 arguments")
        if (!es(1).foldable) throw new IllegalArgumentException(
          "bpe_subword_count: the merge-table spec (arg 2) must be a " +
            "foldable string literal")
        val spec = es(1).eval()
        if (spec == null) throw new IllegalArgumentException(
          "bpe_subword_count: the merge-table spec (arg 2) is NULL — " +
            "pass the 'lhs rhs' merge lines (empty string = no merges, " +
            "per-character counts, must be explicit)")
        BpeSubwordCount(es.head, spec.toString)
      }, "scala_udf")
    // SQL-addressable operators for sessions built WITHOUT GraftExtensions
    val treg = spark.sessionState.tableFunctionRegistry
    treg.createOrReplaceTempFunction("graft_op", GraftOps.opPlan _, "scala_udf")
    treg.createOrReplaceTempFunction("graft_ops", GraftOps.opsPlan _, "scala_udf")
  }
}
