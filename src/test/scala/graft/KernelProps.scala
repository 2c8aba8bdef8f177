package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.GraftHashes

/** Property tests for the pure-JVM kernels behind the custom codegen
  * expressions (no Spark session needed — the kernels are static).
  */
object KernelProps extends Properties("GraftKernels") {

  private val sortedDistinctLongs: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L))
      .map(_.distinct.sorted.toArray)

  property("sortedIntersectCard equals Set intersection size") =
    Prop.forAll(sortedDistinctLongs, sortedDistinctLongs) { (a, b) =>
      GraftHashes.sortedIntersectCard(
        new GenericArrayData(a), new GenericArrayData(b)) ==
        a.toSet.intersect(b.toSet).size.toLong
    }

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
  private val text: Gen[String] =
    Gen.nonEmptyListOf(token).map(_.take(20).mkString(" "))

  property("shingleStrings matches the split/concat reference") =
    Prop.forAll(text) { t =>
      val tk = t.split(" ", -1) // split(text, ' ') semantics: keep empties
      val want: Seq[String] =
        if (tk.length < 3) Seq(t)
        else tk.sliding(3).map(_.mkString(" ")).toSeq
      val got = GraftHashes.shingleStrings(UTF8String.fromString(t))
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == want
    }

  property("removeTokensAt equals the concat_ws+filter reference") =
    Prop.forAll(
      Gen.listOf(Gen.oneOf(token, Gen.const(""))).map(_.take(30)),
      Gen.listOf(Gen.chooseNum(-2, 35))) { (toks, remRaw) =>
      val rem = remRaw.distinct.sorted.toArray
      val want = toks.zipWithIndex
        .filterNot { case (_, i) => rem.contains(i) }
        .map(_._1).mkString(" ")
      val got = GraftHashes.removeTokensAt(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]),
        new GenericArrayData(rem))
      got.toString == want
    }

  property("polyHashMod matches a BigInt fold and stays in [0, p)") =
    Prop.forAll(text) { t =>
      val p = BigInt(1000000007L)
      val want = t.codePoints().toArray.foldLeft(BigInt(0)) {
        (h, c) => (h * 31 + c) mod p
      }.toLong
      val got = GraftHashes.polyHashMod(UTF8String.fromString(t))
      got == want && got >= 0 && got < 1000000007L
    }

  /** Texts INCLUDING empty tokens (leading/trailing/double spaces) — the
    * split(' ') semantics repetitionStats must reproduce exactly.
    */
  private val spaceyText: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(token, Gen.const(""))).map(_.take(25).mkString(" "))

  property("repetitionStats matches split semantics incl. empty tokens") =
    Prop.forAll(spaceyText) { t =>
      val tk = t.split(" ", -1)
      val bgs = if (tk.length < 2) Seq.empty[String]
        else tk.sliding(2).map(_.mkString(" ")).toSeq
      val wantTop = if (bgs.isEmpty) 0L
        else bgs.groupBy(identity).values.map(_.size).max.toLong
      val r = GraftHashes.repetitionStats(UTF8String.fromString(t))
      r.getLong(0) == tk.length.toLong &&
        r.getLong(1) == tk.distinct.length.toLong &&
        r.getLong(2) == wantTop &&
        r.getLong(3) == bgs.length.toLong
    }

  private val floats: Gen[Array[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)

  property("floatDot equals the sequential double fold") =
    Prop.forAll(floats, floats) { (a, b) =>
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      val got = GraftHashes.floatDot(
        new GenericArrayData(a), new GenericArrayData(b))
      java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want)
    }

  /** Independent reimplementation of dd18's SimHash in the ORACLE's
    * arithmetic — hex chars of md5, nibble bit via instr/shift — rather
    * than the kernel's digest-byte loop, over texts WITH empty tokens
    * (leading/trailing/double spaces the corpus never exercises). The
    * kernel's MSB-first bit indexing is exactly what this pins.
    */
  property("md5SimHashBits matches the hex-char majority reference") =
    Prop.forAll(spaceyText) { t =>
      def md5hex(s: String): String = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        d.map(b => f"$b%02x").mkString
      }
      val sigs = t.split(" ", -1).map(tok => md5hex(tok).take(16))
      val want = (0 until 64).map { j =>
        val set = sigs.count { s =>
          val v = "0123456789abcdef".indexOf(s(j / 4))
          ((v >> (3 - j % 4)) & 1) == 1
        }
        if (2 * set >= sigs.length) '1' else '0'
      }.mkString
      GraftHashes.md5SimHashBits(UTF8String.fromString(t)).toString == want
    }

  property("md5MinLanes lanes are independent minima") =
    Prop.forAll(Gen.nonEmptyListOf(token).map(_.take(10))) { shingles =>
      val arr = new GenericArrayData(
        shingles.map(s => UTF8String.fromString(s)).toArray[Any])
      val got = GraftHashes.md5MinLanes(arr, 4)
      def md5hex(s: String): String = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        d.map(b => f"$b%02x").mkString
      }
      (0 until 4).forall { k =>
        got.getUTF8String(k).toString ==
          shingles.map(s => md5hex(s + "#" + k)).min
      }
    }

  /** Texts with non-alphabet chars (digits, unicode) mixed in — the
    * kernel must count ONLY a-z+space, exactly like the oracle's
    * length(t) - length(replace(t, ch, '')) per-char formulation. */
  private val mixedText: Gen[String] =
    Gen.listOf(Gen.frequency(
      (8, Gen.alphaLowerChar), (3, Gen.const(' ')),
      (1, Gen.numChar), (1, Gen.const('é')), (1, Gen.alphaUpperChar)))
      .map(_.mkString)

  property("charDiversity equals the per-char replace-count reference") =
    Prop.forAll(mixedText) { t =>
      val alphabet = ('a' to 'z') :+ ' '
      val counts = alphabet.map(ch => t.count(_ == ch).toLong)
      val row = GraftHashes.charDiversity(UTF8String.fromString(t))
      row.getLong(0) == counts.sum &&
        row.getLong(1) == counts.map(c => c * c).sum &&
        row.getLong(2) == counts.max
    }

  property("readabilityStats equals the split/regex reference") =
    Prop.forAll(mixedText) { t =>
      val row = GraftHashes.readabilityStats(UTF8String.fromString(t))
      val vowels = "aeiouAEIOU".toSet
      val syl = t.zipWithIndex.count { case (c, i) =>
        vowels(c) && (i == 0 || !vowels(t(i - 1))) }
      row.getLong(0) == t.count(_ == ' ').toLong + 1L &&
        row.getLong(1) == t.count(c => c == '.' || c == '!' || c == '?') &&
        row.getLong(2) == syl.toLong
    }

  property("readabilityStats on punctuated prose counts sentences") =
    Prop.passed && {
      val row = GraftHashes.readabilityStats(UTF8String.fromString(
        "The quick brown fox. It jumps! Over the lazy dog?"))
      // 10 words (9 spaces + 1), 3 enders, vowel-group starts:
      // Th[e] q[ui]ck br[o]wn f[o]x [I]t j[u]mps [O]v[e]r th[e]
      // l[a]zy d[o]g = 11
      row.getLong(0) == 10L && row.getLong(1) == 3L && row.getLong(2) == 11L
    }

  /** Skewed key streams: a frequent key 0, a mid band, and a long tail —
    * so the Misra-Gries guarantees are exercised with real heavy keys,
    * not vacuously on uniform noise.
    */
  private val hhStream: Gen[List[Int]] =
    Gen.listOf(Gen.frequency(
      (5, Gen.const(0)), (3, Gen.chooseNum(1, 5)), (2, Gen.chooseNum(6, 30))))

  property("misraGries guarantees hold under arbitrary chunk/merge splits") =
    Prop.forAll(hhStream, Gen.chooseNum(1, 5), Gen.chooseNum(1, 8)) {
      (xs, nChunks, k) =>
        import org.apache.spark.sql.catalyst.InternalRow
        import org.apache.spark.sql.catalyst.expressions.BoundReference
        import org.apache.spark.sql.types.StringType
        val agg = graft.functions.MisraGries(
          BoundReference(0, StringType, nullable = true), k)
        val chunks = xs.grouped(math.max(1, xs.size / nChunks + 1)).toList
        val partials = chunks.map { ch =>
          var b = agg.createAggregationBuffer()
          ch.foreach { x =>
            b = agg.update(b, InternalRow(UTF8String.fromString(s"k$x")))
          }
          agg.deserialize(agg.serialize(b)) // executor round-trip
        }
        val merged = partials match {
          case Nil => agg.createAggregationBuffer()
          case h :: t => t.foldLeft(h)(agg.merge)
        }
        val truth = xs.groupBy(identity)
          .map { case (kk, v) => s"k$kk" -> v.size.toLong }
        val n = xs.size.toLong
        // integer-exact forms of the three guarantees (no float division)
        val sizeOk = merged.size <= k
        val boundsOk = merged.forall { case (key, est) =>
          est <= truth(key) && (truth(key) - est) * (k + 1) <= n
        }
        val heavyOk = truth.forall { case (key, c) =>
          c * (k + 1) <= n || merged.contains(key)
        }
        sizeOk && boundsOk && heavyOk
    }

  property("kmvSketch state is invariant under arbitrary chunk/merge splits") =
    Prop.forAll(hhStream, Gen.chooseNum(1, 5), Gen.chooseNum(2, 8)) {
      (xs, nChunks, k) =>
        import org.apache.spark.sql.catalyst.InternalRow
        import org.apache.spark.sql.catalyst.expressions.BoundReference
        import org.apache.spark.sql.types.StringType
        val agg = graft.functions.KmvSketch(
          BoundReference(0, StringType, nullable = true), k)
        def runChunked(n: Int) = {
          val chunks = xs.grouped(math.max(1, xs.size / n + 1)).toList
          val partials = chunks.map { ch =>
            var b = agg.createAggregationBuffer()
            ch.foreach { x =>
              b = agg.update(b, InternalRow(UTF8String.fromString(s"k$x")))
            }
            agg.deserialize(agg.serialize(b)) // executor round-trip
          }
          partials match {
            case Nil => agg.createAggregationBuffer()
            case h :: t => t.foldLeft(h)(agg.merge)
          }
        }
        val merged = runChunked(nChunks)
        val single = runChunked(1)
        // the whole STATE (not just an envelope) is split-invariant:
        // bottom-k of a set does not depend on arrival order or tree
        val stateOk = merged.toSeq == single.toSeq
        // exact regime: fewer distincts than k → sketch IS the count
        val distinct = xs.distinct.size
        val exactOk = distinct >= k || merged.size == distinct
        val sizeOk = merged.size <= k
        stateOk && exactOk && sizeOk
    }

  // skewed long streams: duplicates + heavy values stress the
  // compaction ladder (a uniform stream barely compacts)
  private val qsStream: Gen[List[Long]] = for {
    n <- Gen.chooseNum(0, 600)
    xs <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.chooseNum(-1000L, 1000L),
      1 -> Gen.oneOf(7L, 7L, 42L, Long.MinValue / 2, Long.MaxValue / 2)))
  } yield xs

  property("quantileSketch envelope holds under arbitrary chunk/merge " +
      "splits") =
    Prop.forAll(qsStream, Gen.chooseNum(1, 7), Gen.chooseNum(8, 32)) {
      (xs, nChunks, k) =>
        import org.apache.spark.sql.catalyst.InternalRow
        import org.apache.spark.sql.catalyst.expressions.BoundReference
        import org.apache.spark.sql.types.LongType
        val phis = Seq(1, 25, 50, 75, 99)
        val agg = graft.functions.QuantileSketch(
          BoundReference(0, LongType, nullable = true), k, phis)
        val chunks = xs.grouped(math.max(1, xs.size / nChunks + 1)).toList
        val partials = chunks.map { ch =>
          var b = agg.createAggregationBuffer()
          ch.foreach(x => b = agg.update(b, InternalRow(x)))
          agg.deserialize(agg.serialize(b)) // executor round-trip
        }
        val merged = partials match {
          case Nil => agg.createAggregationBuffer()
          case h :: t => t.foldLeft(h)(agg.merge)
        }
        val out = agg.eval(merged)
        if (xs.isEmpty) out == null
        else {
          val row = out.asInstanceOf[InternalRow]
          val n = row.getLong(0)
          val err = row.getLong(1)
          val qs = row.getArray(2).toLongArray()
          val sortedXs = xs.sorted
          val nOk = n == xs.size
          // no compactions possible below k inserts per chunk merge
          // path => err can be 0 or small; always non-negative
          val errOk = err >= 0L
          // THE guarantee (see QuantileSketch scaladoc): a RANK
          // INTERVAL, not a point rank — with duplicates the returned
          // value occupies the whole rank range (count(<v), count(<=v)]
          // and a point audit (|count(<=v) - target|) overshoots by the
          // full duplicate mass of v (falsified on List(-1,-1,-1)).
          // The tie-correct envelope: the ranks strictly below v do not
          // overshoot the target, and the ranks up to v reach it, each
          // within the 2·err compaction budget — under ANY merge tree.
          val envOk = phis.zip(qs).forall { case (p, v) =>
            val target = math.max(1L, n * p / 100L)
            val rankLt = sortedXs.count(_ < v).toLong
            val rankLe = sortedXs.count(_ <= v).toLong
            rankLt <= target + 2L * err && rankLe >= target - 2L * err
          }
          // exact regime (err == 0): v IS the target-th order statistic
          // — stated as the tie-correct interval (count(<v) < target
          // <= count(<=v)), which is value-equality to sortedXs(target-1)
          val exactOk = err > 0L || phis.zip(qs).forall { case (p, v) =>
            val target = math.max(1L, n * p / 100L)
            sortedXs.count(_ < v) < target && sortedXs.count(_ <= v) >= target
          }
          nOk && errOk && envOk && exactOk
        }
    }
}

/** Property tests for the dd31 diagonal-islands LCS identity: the
  * relational formulation (positional k-gram matches grouped by the
  * i−j diagonal; longest consecutive run + k−1) equals the classic
  * quadratic dynamic-programming longest common token substring —
  * for ANY pair of token sequences, not just the planted corpus the
  * OperatorInvariantSpec pins. A tiny vocabulary forces dense gram
  * collisions (repeats, multiple diagonals, overlapping runs), the
  * regime where a formulation bug would hide.
  */
object SpanLcsProps extends Properties("DiagonalIslandsLcs") {
  import org.scalacheck.{Gen, Prop}

  private val k = 4 // the dd31 gram width
  private val toks: Gen[Array[String]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.toArray))

  private def dpLcs(x: Array[String], y: Array[String]): Int = {
    var best = 0
    var prev = new Array[Int](y.length + 1)
    var cur = new Array[Int](y.length + 1)
    for (i <- 1 to x.length) {
      java.util.Arrays.fill(cur, 0)
      for (j <- 1 to y.length) if (x(i - 1) == y(j - 1)) {
        cur(j) = prev(j - 1) + 1
        if (cur(j) > best) best = cur(j)
      }
      val tmp = prev; prev = cur; cur = tmp
    }
    best
  }

  /** The operator's relational pipeline, replayed on plain collections:
    * positional k-grams, equi-match on the gram STRING, group by
    * diagonal, longest consecutive-i run, + (k−1); 0 when no match. */
  private def islandsLcs(x: Array[String], y: Array[String]): Int = {
    def grams(t: Array[String]): Seq[(Int, String)] =
      if (t.length < k) Seq.empty
      else (0 to t.length - k).map(i => i -> t.slice(i, i + k).mkString(" "))
    val gb = grams(y).groupBy(_._2)
    val matches = grams(x).flatMap { case (i, g) =>
      gb.getOrElse(g, Seq.empty).map { case (j, _) => (i, j) } }
    if (matches.isEmpty) 0
    else matches.groupBy { case (i, j) => i - j }.values.map { diag =>
      val is = diag.map(_._1).sorted
      // gaps-and-islands: run length = count per (i - rank) group
      is.zipWithIndex.groupBy { case (i, r) => i - r }
        .values.map(_.length).max
    }.max + (k - 1)
  }

  property("diagonal islands equal the DP longest common substring") =
    Prop.forAll(toks, toks) { (x, y) =>
      val truth = dpLcs(x, y)
      val expected = if (truth >= k) truth else 0
      islandsLcs(x, y) == expected
    }

  property("a planted shared window is always recovered") =
    Prop.forAll(toks, toks, Gen.chooseNum(4, 12)) { (x, y, w) =>
      // splice the same w-token window into both sequences
      val win = Array.tabulate(w)(i => s"W$i")
      val xs = x ++ win ++ x
      val ys = y ++ win ++ y
      islandsLcs(xs, ys) >= w
    }
}

/** Property tests for the BPE tokenizer's two formulation identities
  * (graft.functions.Bpe): (1) the kernel's greedy left-to-right scan
  * equals the gaps-and-islands parity selection the DuckDB oracle
  * replays — candidate positions grouped into consecutive islands,
  * odd-ranked positions merged — for ANY symbol sequence and pair
  * (runs of identical symbols are the adversarial case); (2) encoding
  * by applying merges in rank order reproduces the training-time
  * evolution of every in-vocab word. Plus the invariants each merge
  * pass must keep: character conservation and single-pass fixpoint.
  */
object BpeProps extends Properties("BpeTokenizer") {
  import org.scalacheck.{Gen, Prop}
  import graft.functions.Bpe

  private val sym: Gen[String] = Gen.oneOf("a", "b", "c", "ab", "ba")
  private val syms: Gen[Array[String]] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, sym).map(_.toArray))
  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
  private val wordTable: Gen[Seq[(String, Long)]] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.distinct.map(w => w -> (w.length + 1L))))

  /** The oracle's relational formulation, replayed on collections:
    * candidates → islands by (i − rank) → keep odd ranks → rebuild. */
  private def islandsApply(s: Array[String], l: String, r: String)
      : Array[String] = {
    val cand = (0 until s.length - 1).filter(i => s(i) == l && s(i + 1) == r)
    val sel = cand.zipWithIndex
      .groupBy { case (i, rk) => i - rk } // islands of consecutive i
      .values.flatMap(_.map(_._1).sorted.zipWithIndex
        .collect { case (i, off) if off % 2 == 0 => i })
      .toSet
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (sel(i)) { out += l + r; i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toArray
  }

  property("greedy scan equals the oracle's islands-parity selection") =
    Prop.forAll(syms, sym, sym) { (s, l, r) =>
      Bpe.applyMerge(s, l, r).toSeq == islandsApply(s, l, r).toSeq
    }

  property("one pass is a fixpoint and conserves characters") =
    Prop.forAll(syms, sym, sym) { (s, l, r) =>
      val m = Bpe.applyMerge(s, l, r)
      val noPair = (0 until m.length - 1)
        .forall(i => !(m(i) == l && m(i + 1) == r))
      noPair && m.mkString == s.mkString
    }

  property("training is input-order invariant") =
    Prop.forAll(wordTable) { wt =>
      Bpe.train(wt, 8) == Bpe.train(wt.reverse, 8)
    }

  property("encode reproduces the training evolution of vocab words") =
    Prop.forAll(wordTable) { wt =>
      val merges = Bpe.train(wt, 8)
      val pairs = merges.map { case (l, r, _) => (l, r) }.toArray
      // replay training per word and compare symbol counts
      wt.forall { case (w, _) =>
        var s: Array[String] = w.map(_.toString).toArray
        pairs.foreach { case (l, r) => s = Bpe.applyMerge(s, l, r) }
        Bpe.encodeCount(w, pairs) == s.length
      }
    }

  property("kernel subwordCount sums per-word encode over the text") =
    Prop.forAll(wordTable) { wt =>
      val merges = Bpe.train(wt, 8)
      val spec = Bpe.spec(merges)
      val pairs = merges.map { case (l, r, _) => (l, r) }.toArray
      val text = wt.map(_._1).mkString(" ")
      val expect = wt.map { case (w, _) => Bpe.encodeCount(w, pairs).toLong }.sum
      Bpe.subwordCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(text),
        spec) == expect
    }
}
