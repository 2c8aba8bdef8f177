package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.graftshim.GraftShim.AbstractType
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic merge-table subword tokenizer (BPE, Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units" —
  * public literature; greedy pair-merge training, merges applied in rank
  * order at encode time).
  *
  * The semantics are pinned so three independent implementations agree
  * byte-for-byte — this object (training + the codegen encode kernel),
  * the in-JVM naive replay in the specs, and the DuckDB oracle's
  * unrolled relational replay (TextAnalysis.bpeChainSql):
  *
  *  - TRAINING works on the distinct-WORD frequency table (the standard
  *    scale shape: the corpus-sized work — word counting — is one
  *    distributed aggregate; the merge loop runs on the bounded vocab
  *    table, capped at the top `BPE_CAP` words by (freq DESC, word ASC)).
  *  - A pair count is the frequency-weighted number of ADJACENT symbol
  *    positions (overlapping runs count each position: [a,a,a] has two
  *    (a,a) positions).
  *  - The winning pair per step: max count, ties broken by (lhs ASC,
  *    rhs ASC) string order. No pairs left → training stops early.
  *  - APPLYING a merge is ONE simultaneous left-priority pass: scan
  *    left to right, merge (l,r) whenever current symbol = l and next
  *    = r, skip both. One pass is a fixpoint for that pair (the merged
  *    symbol l||r can never recreate (l,r): symbols are nonempty so
  *    l||r ≠ l and l||r ≠ r). Relationally this is gaps-and-islands
  *    parity selection over candidate positions — which is what lets
  *    the DuckDB oracle replay a merge step without recursion.
  *  - ENCODING a word = single chars, then each merge applied once, in
  *    rank order — identical to the word's evolution during training,
  *    so in-vocab words get their training symbolization and unseen
  *    words are handled by the same rule.
  */
object Bpe {

  /** One left-priority simultaneous pass of merge (l, r). */
  def applyMerge(sym: Array[String], l: String, r: String): Array[String] = {
    if (sym.length < 2) return sym
    val out = new scala.collection.mutable.ArrayBuffer[String](sym.length)
    var i = 0
    while (i < sym.length) {
      if (i < sym.length - 1 && sym(i) == l && sym(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += sym(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Greedy merge-table training over a word-frequency table.
    * Deterministic: ties on pair count break by (lhs, rhs) in UTF-8
    * BYTE order — the collation Spark's UTF8String sort and DuckDB's
    * ORDER BY share; Java String compareTo (UTF-16 code units) would
    * diverge for supplementary-plane symbols (ADVICE r10). Residual
    * ASCII-corpus assumption: the initial alphabet splits words by
    * UTF-16 code unit (`_.toString`), so a supplementary-plane char
    * splits into surrogate halves; the encode kernel splits the same
    * way, so train/encode stay mutually consistent, but a DuckDB
    * oracle splitting by codepoint would see a different alphabet —
    * same documented boundary as the png family
    * (Multimodal.scala:44-52).
    */
  def train(words: Seq[(String, Long)], maxMerges: Int)
      : Seq[(String, String, Long)] = {
    var syms: Array[(Array[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toArray, f) }.toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var m = 0
    var exhausted = false
    while (m < maxMerges && !exhausted) {
      val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (s, f) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          cnt.update(k, cnt.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (cnt.isEmpty) exhausted = true
      else {
        val ((l, r), c) = cnt.minBy(identity)(Ordering.fromLessThan[((String, String), Long)] {
          case (((l1, r1), c1), ((l2, r2), c2)) =>
            if (c1 != c2) c1 > c2 // higher count wins
            else {
              val dl = utf8Compare(l1, l2)
              if (dl != 0) dl < 0 else utf8Compare(r1, r2) < 0
            }
        })
        out += ((l, r, c))
        syms = syms.map { case (s, f) => (applyMerge(s, l, r), f) }
        m += 1
      }
    }
    out.toSeq
  }

  /** Unsigned UTF-8 byte-order comparison — the tie-break collation
    * shared with Spark's UTF8String sort and DuckDB's ORDER BY. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Encode one word: chars, then every merge once in rank order. */
  def encodeCount(word: String, merges: Array[(String, String)]): Int = {
    var syms: Array[String] = word.map(_.toString).toArray
    var i = 0
    while (i < merges.length && syms.length >= 2) {
      syms = applyMerge(syms, merges(i)._1, merges(i)._2)
      i += 1
    }
    syms.length
  }

  /** Serialize merges as the kernel's spec string ("lhs rhs" lines —
    * symbols are corpus words' substrings, never containing spaces). */
  def spec(merges: Seq[(String, String, Long)]): String =
    merges.map { case (l, r, _) => s"$l $r" }.mkString("\n")

  /** Parsed spec + a bounded word→count memo (the corpus vocabulary is
    * heavily sublinear in corpus size; the cap just bounds worst-case
    * memory on an adversarial corpus — misses still compute correctly).
    */
  private final class Merges(specStr: String) {
    val pairs: Array[(String, String)] = specStr.split("\n")
      .filter(_.nonEmpty)
      .map { line =>
        val sp = line.indexOf(' ')
        (line.substring(0, sp), line.substring(sp + 1))
      }
    private val memo = new ConcurrentHashMap[String, Integer]()
    private val MemoCap = 65536
    def count(word: String): Int = {
      val hit = memo.get(word)
      if (hit != null) return hit.intValue()
      val n = encodeCount(word, pairs)
      if (memo.size < MemoCap) memo.put(word, Integer.valueOf(n))
      n
    }
  }

  private val specCache = new ConcurrentHashMap[String, Merges]()

  /** Static kernel: total subword count of a space-separated text.
    * Shared by interpreted eval and generated code (the GraftHashes
    * static-call discipline). Empty words (split artifacts) count 0.
    */
  def subwordCount(text: UTF8String, spec: String): Long = {
    val merges = specCache.computeIfAbsent(spec, s => new Merges(s))
    val t = text.toString
    var total = 0L
    var start = 0
    var i = 0
    val n = t.length
    while (i <= n) {
      if (i == n || t.charAt(i) == ' ') {
        if (i > start) total += merges.count(t.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }
}

/** Codegen expression over the static kernel: per-row cost is one text
  * scan plus memoized per-word lookups — stays inside whole-stage
  * codegen (the merge table rides along as a referenced object, parsed
  * once per spec via the static cache, never per row).
  */
case class BpeSubwordCount(child: Expression, spec: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "bpe_subword_count"
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Bpe.subwordCount(input.asInstanceOf[UTF8String], spec)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("bpeSpec", spec, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Bpe.subwordCount($c, $specRef)")
  }
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
