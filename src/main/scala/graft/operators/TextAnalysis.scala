package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.GraftFunctions

/** Text-analysis operators over the `documents` table (builder mandate;
  * no reference counterpart — `/root/reference` treats all values as opaque
  * strings, SURVEY §1.3).
  *
  * Every operator here is a per-row projection — no shuffle, scales
  * linearly with the corpus, stays inside whole-stage codegen (built-in
  * string/array functions + the custom codegen expressions in
  * graft.functions).
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  /** Fused one-pass text statistics (graft.functions.TextStats): token
    * count, non-space chars, stopword hits, subword estimate, language-ID
    * argmax — all from a single codegen'd byte scan. tx01/02/03/06/10
    * previously built these from HOF lambda subtrees (split + per-language
    * filter), which are CodegenFallback AND were re-evaluated once per
    * output column (the r2 tx perf regression: tx03 0.54→1.06 s). Several
    * getFields of one TextStats call cost one evaluation — codegen
    * subexpression elimination sees the common subtree.
    */
  private def stats: org.apache.spark.sql.Column =
    GraftFunctions.text_stats(col("text"))

  /** tx01: token counting (= chars - chars_without_spaces + 1, the
    * length-difference formula the DuckDB oracle replays).
    */
  private val tx01Tokens: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"), stats.getField("n_tokens").as("n_tokens"))
      .orderBy("doc_id")

  /** tx02: quality scoring — length, token stats, stopword ratio, alpha
    * ratio. Simple deterministic heuristics of the C4/Gopher-rules flavor.
    */
  private val tx02Quality: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        col("n_chars"),
        stats.getField("n_tokens").as("n_tokens"),
        round(stats.getField("n_nospace").cast("double") /
          stats.getField("n_tokens"), 4).as("avg_token_len"),
        round(stats.getField("n_stop").cast("double") /
          stats.getField("n_tokens"), 4).as("stopword_ratio"),
        (stats.getField("n_tokens") >= 10 && col("n_chars") >= 50)
          .as("passes_min_len"))
      .orderBy("doc_id")

  /** tx03: language ID — stopword-profile heuristic: score each candidate
    * language by its marker-token hit count, pick the argmax (ties →
    * lexicographically greatest lang, the sort_array-desc struct semantics
    * the oracle replays with list_reverse_sort). A real pipeline plugs a
    * model in; the Spark shape (per-row scoring, no shuffle) is identical.
    */
  private val tx03LangId: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"),
        stats.getField("pred_lang").as("pred_lang"),
        stats.getField("pred_score").cast("bigint").as("score"))
      .orderBy("doc_id")

  /** tx10: lang-ID EVALUATION — confusion matrix of the tx03 heuristic
    * against the corpus's ground-truth `lang` column (the model-eval
    * loop a real pipeline runs on every classifier revision). Note the
    * corpus is synthetic ASCII, so absolute accuracy is meaningless —
    * the operator shape (predict → groupBy truth×pred) is the point.
    */
  private val tx10LangIdEval: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("lang"), stats.getField("pred_lang").as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")

  /** tx11: text normalization — lowercase, strip non-alphanumerics,
    * collapse runs of spaces, trim: the canonicalization pass that
    * precedes fingerprinting in a dedup pipeline. Output is the
    * fingerprint of the normal form (portable md5).
    */
  private val tx11Normalize: Q = (s, d) =>
    t(s, d, "documents")
      .withColumn("norm", trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
      .select(col("doc_id"), length(col("norm")).cast("bigint").as("n_norm"),
        md5(col("norm")).as("norm_fp"))
      .orderBy("doc_id")

  /** tx04: md5 content fingerprint (DuckDB-mirrorable). */
  private val tx04FingerprintMd5: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
      .orderBy("doc_id")

  /** tx05: rolling-hash fingerprint via the custom codegen Expression
    * (graft.functions.RollingHash64) + SimHash — the scale-path fingerprints
    * (64-bit keys shuffle 16× lighter than md5 strings).
    */
  private val tx05FingerprintRolling: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"),
        GraftFunctions.rolling_hash64(col("text")).as("fp64"),
        GraftFunctions.simhash64(col("text")).as("simhash"))
      .orderBy("doc_id")

  /** tx06: BPE-ish subword token estimate: whitespace tokens + a regex
    * split on letter/digit boundaries, ~4-chars-per-subword heuristic for
    * long tokens (deterministic, model-free token count estimate).
    */
  private val tx06TokenEstimate: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"),
        stats.getField("n_tokens").as("n_words"),
        stats.getField("n_subwords").as("n_subwords_est"))
      .orderBy("doc_id")


  /** tx08: oracle-checked polynomial fingerprint — the custom codegen
    * expression (graft.functions.PolyHashMod) whose modular arithmetic a
    * DuckDB list_reduce replays bit-for-bit (the 64-bit wrapping kernels
    * in tx05 cannot cross the engine boundary: DuckDB errors on BIGINT
    * overflow instead of wrapping).
    */
  private val tx08PolyHash: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"),
        GraftFunctions.poly_hash_mod(col("text")).as("ph"),
        GraftFunctions.poly_hash_mod(lower(col("source"))).as("ph_source"))
      .orderBy("doc_id")

  /** tx09: regex extraction — first long word + counts of pattern matches
    * (PII-scrub / URL-mining shape). Patterns stick to plain character
    * classes so Java regex (Spark) and RE2 (DuckDB) agree.
    */
  private val tx09RegexExtract: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"),
        regexp_extract(col("text"), "([a-z]{7,})", 1).as("first_long_word"),
        size(expr("regexp_extract_all(text, '[a-z]{7,}', 0)"))
          .cast("bigint").as("n_long_words"),
        size(expr("regexp_extract_all(text, '[aeiou]{2,}', 0)"))
          .cast("bigint").as("n_vowel_runs"))
      .orderBy("doc_id")

  /** tx12: edit distance between consecutive documents' prefixes —
    * Levenshtein is the classic char-level near-dup/typo metric (both
    * engines implement the textbook definition). Prefix-bounded (40
    * chars) because full-text edit distance is O(n·m) per pair — the
    * bounded form is what a production near-dup verifier would use
    * after cheap blocking.
    */
  private val tx12EditDistance: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // per-source windows: a global ORDER BY window would serialize on a
    // single partition — the same trap pp02 avoids
    val w = Window.partitionBy("source").orderBy("doc_id")
    t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        substring(col("text"), 1, 40).as("p"))
      .withColumn("next_p", lead("p", 1).over(w))
      .filter(col("next_p").isNotNull)
      .select(col("doc_id"),
        levenshtein(col("p"), col("next_p")).cast("bigint").as("edit_dist"))
      .orderBy("doc_id")
  }

  /** tx07: corpus-level MinHash signature per source + pairwise source
    * similarity estimate. The per-group signature is a lane-wise MIN
    * aggregation of per-doc signatures — composition of stock min()
    * aggregates over the custom per-row MinHashSig expression (builder
    * preference (a): compose before customizing). The lane-agreement
    * fraction between two group signatures estimates the Jaccard
    * similarity of their shingle sets — a fixed-size mergeable sketch,
    * so the shuffle carries 16 longs per group regardless of corpus size.
    */
  private val tx07SourceSignature: Q = (s, d) => {
    val k = 16
    val sigs = t(s, d, "documents")
      .withColumn("sig", GraftFunctions.minhash_sig(col("text"), k))
      .groupBy("source")
      .agg(min(col("sig")(0)).as("m0"),
        (1 until k).map(i => min(col("sig")(i)).as(s"m$i")): _*)
      .withColumn("sig", array((0 until k).map(i => col(s"m$i")): _*))
      .select("source", "sig")
    val a = sigs.select(col("source").as("source_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("source").as("source_b"), col("sig").as("sig_b"))
    a.join(b, col("source_a") < col("source_b"))
      .withColumn("est_jaccard", round(
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
          .cast("double") / k, 4))
      .select("source_a", "source_b", "est_jaccard")
      .orderBy("source_a", "source_b")
  }

  /** tx13: oracle-checked twin of tx07's corpus sketch — per-SOURCE
    * MinHash signature as a lane-wise MIN aggregation of per-doc md5
    * signatures. This is the mergeable-sketch property the oracle can
    * actually replay (min is associative/commutative, so the group
    * signature is independent of partitioning — exactly why the shuffle
    * carries 4 digests per source regardless of corpus size). tx07's
    * xxhash lanes are the fast production path; this pins the merge
    * semantics cross-engine.
    */
  private val tx13SourceSigOracle: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("source"), GraftFunctions.md5_min_lanes(
        GraftFunctions.shingle_strings(col("text")), 4).as("sig"))
      .groupBy("source")
      .agg(min(col("sig")(0)).as("sig0"), min(col("sig")(1)).as("sig1"),
        min(col("sig")(2)).as("sig2"), min(col("sig")(3)).as("sig3"))
      .orderBy("source")

  /** tx17: TERM COMMONNESS — per-doc statistics of its tokens' corpus
    * frequencies (mean and rarest), the frequency-based half of a
    * perplexity-style quality signal without transcendental math (no
    * log: libm ulp drift across engines; all-integer outputs cross
    * engines bit-for-bit). A document of common words scores a high
    * centi-mean; one rare token drives rarest_tf to 1.
    *
    * Scale shape: corpus term frequencies are a partial+final hash agg
    * on the token key (map-side combine collapses within-partition
    * repeats); the per-doc join shuffles (doc_id, token) pairs against
    * the Zipf-bounded vocab — at 100 TB broadcast the top-K vocab and
    * default the tail to tf=1 instead of joining the full table. No
    * global ordering anywhere (a rank formulation would funnel the
    * vocab through one partition — the pp02 trap).
    */
  private val tx17TermCommonness: Q = (s, d) => {
    val toks = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("tf_corpus"))
    toks.join(vocab, Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        // centi-mean as EXACT integer rational — round(avg, 2) sat on a
        // .005 boundary at sf0.1 and the engines' round paths split on
        // the last ulp (caught by the sf0.1 selfcheck); integer div of
        // exact sums cannot drift
        expr("sum(tf_corpus) * 100 div count(1)").as("mean_tf_x100"),
        min("tf_corpus").as("rarest_tf"))
      .orderBy("doc_id")
  }

  private val tx22Alphabet: Seq[String] = ('a' to 'z').map(_.toString) :+ " "

  /** tx22: CHARACTER-DISTRIBUTION DIVERSITY — the log-free cousin of
    * character entropy (the classic gibberish/repetition gate: natural
    * text has a heavy-but-spread letter distribution; keyboard-mash,
    * base64 blobs and "aaaa…" padding collapse it). Score = Gini
    * impurity 1 − Σ(cᵢ/n)² over the a-z+space alphabet, emitted as the
    * EXACT integer rational (n²−Σcᵢ²)·10⁴ DIV n² — no entropy log (libm
    * ulp drift, CLAUDE.md rule), no float division anywhere. The
    * companion top_char_x100 (modal-letter centi-fraction) is the
    * sharper degenerate-text flag.
    *
    * Scale: ONE byte pass per row via the fused `CharDiversity` codegen
    * kernel (n, Σc², max c in a single 27-long histogram — no explode,
    * no shuffle, no string copies). The portable 27×replace/length
    * formulation the oracle runs is count-identical (ASCII targets
    * never collide with UTF-8 continuation bytes) but allocates ~100
    * rewritten strings per row after projection collapse — measured
    * 2.05 s vs 0.5 s at sf0.1 (the dd18 oracle-twin rule: same bytes,
    * faster formulation).
    */
  private val tx22CharDiversity: Q = (s, d) => {
    val cd = graft.functions.GraftFunctions.char_diversity(col("text"))
    t(s, d, "documents")
      .select(col("doc_id"), cd.getField("n").as("n"),
        cd.getField("ssq").as("ssq"), cd.getField("mx").as("mx"))
      .filter(col("n") > 0)
      .selectExpr("doc_id", "n AS n_letters", "ssq AS sum_sq",
        "(n * n - ssq) * 10000 DIV (n * n) AS gini_x10k",
        "mx * 100 DIV n AS top_char_x100")
      .orderBy("doc_id")
  }

  /** tx30: READABILITY (Flesch-Kincaid grade) — the audience-level
    * quality signal tx02's surface ratios don't carry: grade =
    * 0.39·(words/sentences) + 11.8·(syllables/word) − 15.59, emitted
    * ×100 as the integer rational (39·w DIV s) + (1180·syl DIV w) −
    * 1559 (operands non-negative before the final signed subtraction,
    * so Spark's truncating div and DuckDB's flooring // agree).
    * Syllables are estimated as vowel-group starts — the standard
    * cheap estimator; sentences as .!? ends, floored at one.
    *
    * Scale: ONE byte pass per row via the fused `ReadabilityStats`
    * codegen kernel (words, sentence enders, vowel-group starts in a
    * single loop — the CollapseProject lesson: three separate
    * replace/HOF pipelines would each rescan the text after projection
    * collapse). No shuffle beyond the output sort.
    */
  private val tx30Readability: Q = (s, d) => {
    val rs = graft.functions.GraftFunctions.readability_stats(col("text"))
    t(s, d, "documents")
      .select(col("doc_id"), rs.getField("words").as("words"),
        rs.getField("sentences").as("sentences"),
        rs.getField("syllables").as("syllables"))
      .selectExpr("doc_id", "words", "sentences", "syllables",
        "(39 * words DIV greatest(1, sentences)) + " +
          "(1180 * syllables DIV greatest(1, words)) - 1559 AS fkg_x100")
      .orderBy("doc_id")
  }

  /** tx23: TERM-FREQUENCY SPECTRUM — the Zipf band report a tokenizer /
    * vocab plan is sized from (how much corpus mass lives in head vs
    * tail terms; the tail-band mass is what a vocab cutoff throws away
    * as <unk>). Terms are token BIGRAMS (the unigram vocab of this
    * corpus is too dense to have a tail; bigrams spread over 6 octaves)
    * bucketed by frequency OCTAVE — band = ⌊log2 tf⌋+1 computed as
    * length(bin(tf)): pure integer/string arithmetic, no libm log
    * (CLAUDE.md rule), identical in both engines. Mass fractions are
    * exact integer rationals (×10⁴ DIV total).
    *
    * Scale: one corpus tokenize pass → vocab-sized tf aggregate on md5
    * fingerprints (the tx16/dd02 payload rule: bigram text never
    * shuffles) → ~15-row band aggregate. NO global ordering anywhere —
    * the rank formulation of the same curve would funnel the vocab
    * through one partition (the tx17/pp02 trap); octave-bucketing is
    * rank-free.
    */
  private val tx23FreqSpectrum: Q = (s, d) => {
    val vocab = t(s, d, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, CAST(size(toks) - 2 AS INT)),
          |          i -> concat(toks[i], ' ', toks[i + 1]))""".stripMargin))
        .as("bigram"))
      .select(md5(col("bigram")).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("tf"))
    val bands = vocab
      .groupBy(length(expr("bin(tf)")).cast("bigint").as("band"))
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("band_mass"))
    val tot = bands.agg(sum("band_mass").as("total_mass"),
      sum("n_terms").as("total_terms"))
    bands.crossJoin(broadcast(tot))
      .selectExpr("band", "n_terms", "band_mass",
        "band_mass * 10000 DIV total_mass AS mass_x10k",
        "n_terms * 10000 DIV total_terms AS terms_x10k")
      .orderBy("band")
  }

  /** tx24: SOURCE DISTRIBUTION DRIFT — the data-quality monitor that
    * catches a source gone wrong between crawls (template change, spam
    * injection, encoding break): per-source token distribution compared
    * to the corpus distribution by TOTAL VARIATION distance (½·L1),
    * computed exactly — Σ|oᵢ·T − cᵢ·t| is an integer sum, and ONE
    * final ×10⁴ DIV (2·t·T) keeps the whole metric an exact rational
    * (per-term float shares would drift in summation order; the
    * cross-multiplied form cannot). A spiking tv_x10k is the alarm.
    *
    * Scale: per-source counts and corpus counts come off the same
    * tokenize pass (counter-only shuffles); the comparison grid is
    * vocab × sources — broadcast-sized, since vocab is Zipf-bounded
    * (at 100 TB: top-K vocab + a tail bucket, same shape).
    */
  private val tx24SourceDrift: Q = (s, d) => {
    val toks = t(s, d, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val perSrc = toks.groupBy("source", "tok").agg(count(lit(1)).as("o"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val srcTot = perSrc.groupBy("source").agg(sum("o").as("t"))
    val corpusTot = vocab.agg(sum("c").as("big_t"))
    val grid = vocab.crossJoin(broadcast(srcTot))
      .join(perSrc, Seq("source", "tok"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    grid.crossJoin(broadcast(corpusTot))
      .groupBy("source")
      .agg(max("t").as("n_tokens"),
        sum(abs(col("o") * col("big_t") - col("c") * col("t")))
          .as("l1_num"),
        max(col("t") * col("big_t")).as("den"))
      .selectExpr("source", "n_tokens",
        "l1_num * 10000 DIV (2 * den) AS tv_x10k")
      .orderBy("source")
  }

  /** tx28: ENCODING-DAMAGE AUDIT — the crawl-hygiene gate that runs
    * before any tokenizer sees the bytes: classify each document's
    * damage signature (U+FFFD replacement chars = lossy transcode
    * upstream; C0/escape control chars = binary bleed or terminal
    * junk; Ã/Â lead-byte pairs = the classic UTF-8-read-as-Latin-1
    * double-encoding) and roll up per source × class with an exact
    * integer damage rate — the table that decides which crawl source
    * needs re-fetching vs scrubbing. The corpus is verified-ASCII, so
    * damage is PLANTED deterministically (doc_id mod 17 ∈ {0,5,11} →
    * one class each, 3 damage chars per planting — the mm10 quarantine
    * discipline): the oracle replays planting AND detection, so hash
    * equality proves the detector catches exactly the planted rows,
    * no more, no less.
    *
    * Scale: detection is pure per-row replace/length counting (BMP
    * chars, so Spark's UTF-16 length ≡ DuckDB's code-point length) —
    * zero shuffles beyond the counter-only source × class rollup.
    */
  private val tx28EncodingAudit: Q = (s, d) => {
    val repl = "\uFFFD\uFFFDtok\uFFFD"
    val ctrl = "\u0007x\u001Bx\u0007"
    val moji = "\u00C3\u00A9\u00C2\u00A3\u00C3\u00A2"
    val wire = t(s, d, "documents").select(col("doc_id"), col("source"),
      when(col("doc_id") % 17 === 0, concat(col("text"), lit(" " + repl)))
        .when(col("doc_id") % 17 === 5, concat(col("text"), lit(" " + ctrl)))
        .when(col("doc_id") % 17 === 11, concat(col("text"), lit(" " + moji)))
        .otherwise(col("text")).as("w"))
    def occ(ch: Char): org.apache.spark.sql.Column =
      (length(col("w")) - length(replace(col("w"), lit(ch.toString), lit(""))))
        .cast("bigint")
    val classed = wire
      .withColumn("n_repl", occ('\uFFFD'))
      .withColumn("n_ctrl", occ('\u0007') + occ('\u001B'))
      .withColumn("n_moji", occ('\u00C3') + occ('\u00C2'))
      .withColumn("clazz",
        when(col("n_repl") > 0, "replacement")
          .when(col("n_ctrl") > 0, "control")
          .when(col("n_moji") > 0, "mojibake")
          .otherwise("clean"))
    classed.groupBy(col("source"), col("clazz").as("damage_class"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_repl") + col("n_ctrl") + col("n_moji"))
          .as("damage_chars"))
      .withColumn("n_src", sum("n_docs").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")))
      .selectExpr("source", "damage_class", "n_docs", "damage_chars",
        "n_docs * 10000 DIV n_src AS rate_x10k")
      .orderBy("source", "damage_class")
  }

  /** tx29: CANARY EXPOSURE AUDIT — the memorization-risk census a
    * training pipeline runs before release (the Carlini et al. secret
    * sharer protocol, inverted: count how often each unique canary
    * secret appears in the corpus, since extraction risk grows with
    * repetition). The corpus is canary-free by construction, so
    * exposure is PLANTED (the tx28/mm10 discipline): doc_id ≡ 3
    * (mod 23) appends `CANARY-<k>-SEC` with k = (doc_id DIV 23) mod 8,
    * and the doc_id ≡ 3 (mod 46) subset appends it TWICE — so
    * occurrence counts exceed doc counts on a known sub-population and
    * the detector's occurrence/doc/source triple is fully derivable.
    * Detection is a regex sweep (`regexp_extract_all`) — the real
    * operator a secret-scan runs; the oracle replays planting AND
    * detection, so the hash proves the sweep finds exactly what was
    * planted, counted exactly.
    *
    * Scale: one regex pass per row (codegen'd), matches explode to
    * (id, source, canary) triples — kilobytes, since canaries are
    * rare by construction; the rollup groups 50 keys. The two distinct
    * counters share one expand over the tiny match set (homogeneous
    * shapes — the q64 rule).
    */
  private val tx29CanaryAudit: Q = (s, d) => {
    val can = concat(lit("CANARY-"),
      expr("CAST((doc_id div 23) % 8 AS STRING)"), lit("-SEC"))
    val wire = t(s, d, "documents").select(col("doc_id"), col("source"),
      concat(col("text"),
        when(col("doc_id") % 23 === 3, concat(lit(" "), can))
          .otherwise(lit("")),
        when(col("doc_id") % 46 === 3, concat(lit(" "), can))
          .otherwise(lit(""))).as("w"))
    val m = wire
      .select(col("doc_id"), col("source"),
        explode(expr("regexp_extract_all(w, 'CANARY-[0-9]+-SEC', 0)"))
          .as("canary"))
      .withColumn("cid",
        expr("CAST(regexp_extract(canary, 'CANARY-([0-9]+)-SEC', 1)" +
          " AS BIGINT)"))
    m.groupBy("cid")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_docs"),
        countDistinct("source").as("n_sources"))
      .withColumn("risk_class",
        when(col("n_occurrences") >= 5L, "high")
          .when(col("n_occurrences") >= 2L, "repeated")
          .otherwise("single"))
      .orderBy("cid")
  }

  /** tx31: VOCABULARY GROWTH CENSUS (Heaps-law curve) — the sizing
    * study every tokenizer/vocab decision reads first: distinct token
    * TRIGRAMS seen after the first N documents, swept over doc-count
    * prefixes, next to the total gram volume of the prefix. The curve's
    * knee says when additional data stops buying new vocabulary —
    * trigrams, because this synthetic corpus has a 31-word unigram
    * vocabulary that saturates inside the first 100 docs (the tx10
    * caveat: the operator shape is the deliverable; trigrams give the
    * curve real room, ~30 k possible).
    *
    * Scale: first-seen is ONE gram-keyed min aggregate (map-side
    * combine collapses within-partition repeats — the canonical
    * "vocabulary over 100 TB" shape); the prefix sweep is a 6-row
    * broadcast θ-join against the gram table, never a per-cut rescan.
    * All outputs integer — cross-engine hash exact by construction.
    */
  private val tx31VocabGrowth: Q = (s, d) => {
    val tk = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3) // sequence(0,-1) descends (mm02)
    val grams = tk.select(col("doc_id"), explode(expr(
      """transform(sequence(0, size(toks) - 3),
        |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"""
        .stripMargin)).as("gram"))
    val firstSeen = grams.groupBy("gram").agg(min("doc_id").as("fs"))
    val docGrams = grams.groupBy("doc_id").agg(count(lit(1)).as("ngrams"))
    val cuts = s.range(1).select(explode(array(
      Seq(100L, 200L, 500L, 1000L, 2000L, 5000L).map(lit): _*))
      .as("prefix_docs"))
    val vocab = cuts.join(firstSeen, col("fs") < col("prefix_docs"))
      .groupBy("prefix_docs").agg(count(lit(1)).as("vocab"))
    val vol = cuts.join(docGrams, col("doc_id") < col("prefix_docs"))
      .groupBy("prefix_docs").agg(sum("ngrams").as("prefix_grams"))
    cuts.join(vol, Seq("prefix_docs"), "left")
      .join(vocab, Seq("prefix_docs"), "left")
      .select(col("prefix_docs"),
        coalesce(col("prefix_grams"), lit(0L)).as("prefix_grams"),
        coalesce(col("vocab"), lit(0L)).as("vocab"))
      .orderBy("prefix_docs")
  }

  /** tx32: COUNT-MIN SKETCH n-gram counting (Cormode & Muthukrishnan
    * '05) — the fixed-width replacement for exact n-gram count tables.
    * An exact trigram census carries one counter PER DISTINCT GRAM
    * (vocabulary-sized state: Heaps' law says that grows ~n^0.8 — tx31
    * measures it); the CMS carries d×w counters TOTAL (d = 4 rows,
    * width w DERIVED below), counters merge by cell-wise addition
    * (partial aggregates compose across executors/batches for free),
    * and a point estimate reads min over d cells. The estimate NEVER
    * undercounts, and overcounts only on all-d-rows collisions
    * (P ≈ (density)^d per probe).
    *
    * The width is DERIVED from the corpus, not hardcoded (the
    * ss31/pp37 sizing discipline): one constant-size distinct-gram
    * count at plan-build time sets w = max(64, V div 8) — ~8 distinct
    * grams per cell, so the per-probe collision term (density/w-ish)
    * stays put as the corpus grows instead of saturating the way a
    * fixed width does (the r8 cut hardcoded w=4096 after observing
    * w=512 saturate at sf0.1 — this turns that observation into the
    * rule; at sf0.01 the rule yields w≈2030, at sf0.1 w≈3401, and the
    * DuckDB oracle re-derives w from its own count so both stay
    * hash-green). `OperatorInvariantSpec` pins the ≤9 density bound.
    *
    * Cross-engine exact: cell assignment is the pp37 portable-hash
    * pattern (first 8 md5 hex chars of "seed#gram" → BIGINT mod w), so
    * DuckDB rebuilds the identical sketch and the estimates — not just
    * the bound — hash-match. The audit emits, for a deterministic
    * probe set (every 100th doc's grams), the exact count, the CMS
    * estimate and the overshoot; `OperatorInvariantSpec` pins est ≥
    * true for every probe and the 2N/w Markov envelope on overshoot. The
    * exact-count branch exists for the audit only — at 100 TB you ship
    * the 16384-cell sketch and never materialize the census it replaces.
    */
  /** tx33: SOURCE NOVELTY ATTRIBUTION — the data-mixing question tx31's
    * growth curve doesn't answer: WHICH source buys the new vocabulary?
    * Concatenate the sources in canonical (name) order and credit every
    * distinct trigram to the FIRST source containing it; a source's
    * marginal-new count against its own distinct-gram count is its
    * novelty share — the number a mixture designer reads before paying
    * for another crawl of a source whose grams the mix already has
    * (the tx24 drift monitor says sources differ; this says by how
    * many NEW grams). Order-dependence is the point: the attribution
    * is "what does source s add to everything alphabetically before
    * it", a deterministic, replayable convention (same spirit as
    * tx31's doc-order prefixes).
    *
    * Scale: one gram-keyed min aggregate (map-side combine collapses
    * within-partition repeats — the tx31 shape) plus per-source
    * counter aggregates; nothing wider than a gram string ever
    * shuffles. All-integer outputs.
    */
  private val tx33SourceNovelty: Q = (s, d) => {
    val tk = t(s, d, "documents")
      .select(col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    val grams = tk.select(col("source"), explode(expr(
      """transform(sequence(0, size(toks) - 3),
        |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"""
        .stripMargin)).as("gram"))
    val perSrc = grams.groupBy("source")
      .agg(count(lit(1)).as("gram_occurrences"),
        countDistinct(col("gram")).as("distinct_grams"))
    val marginal = grams.groupBy("gram").agg(min("source").as("source"))
      .groupBy("source").agg(count(lit(1)).as("new_grams"))
    perSrc.join(marginal, Seq("source"), "left")
      .select(col("source"), col("gram_occurrences"),
        col("distinct_grams"),
        coalesce(col("new_grams"), lit(0L)).as("new_grams"))
      .withColumn("novelty_x10k",
        expr("new_grams * 10000 DIV distinct_grams"))
      .orderBy("source")
  }

  /** BPE knobs, shared with the oracle generator and the specs:
    * training vocab capped at the top `BPE_CAP` words by (freq DESC,
    * word ASC) — the bounded driver collect that makes the merge loop
    * constant-size by construction (real distributed BPE trainers work
    * exactly this way: word counting is the distributed pass, merges
    * run on the bounded count table). Merge count DERIVES from the
    * capped vocab (the tx32 derive-the-knob discipline), structurally
    * bounded by `BPE_UNROLL` — the number of steps the static oracle
    * SQL unrolls (steps beyond the derived count are relational
    * no-ops; a corpus deriving more would fail the oracle LOUDLY, not
    * silently truncate).
    */
  private[graft] val BPE_CAP = 4096
  private[graft] val BPE_UNROLL = 24
  private[graft] def bpeMergeCount(vocab: Int): Int =
    math.min(BPE_UNROLL, math.max(8, vocab / 2))

  /** The ONE distributed pass BPE training needs: word → corpus
    * frequency, capped. Empty split artifacts are excluded (they
    * tokenize to zero subwords in every implementation). */
  private[graft] def bpeWordFreqs(s: SparkSession, d: String)
      : Seq[(String, Long)] =
    t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(BPE_CAP)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** tx34: BPE MERGE-TABLE TRAINING — the corpus-derived subword
    * tokenizer every token-denominated operator in the repo has been
    * estimating around (tx06's ceil(len/4), whitespace counts in
    * pp32/pp36/pp39). Output is the learned merge table itself:
    * (rank, lhs, rhs, pair_count) — certified cross-engine, because
    * the DuckDB oracle REPLAYS THE TRAINING LOOP relationally: each
    * unrolled step recounts weighted adjacent pairs, picks the same
    * (count DESC, lhs, rhs) winner, and applies the merge as a
    * gaps-and-islands parity selection over candidate positions (a
    * single simultaneous left-priority pass is a fixpoint for its own
    * pair, so one islands pass per step is exact — no recursion).
    *
    * Scale: the corpus-sized work is ONE word-count aggregate; the
    * merge loop runs on the ≤`BPE_CAP`-row frequency table on the
    * driver (documented bounded collect, the ss20 centroid-read
    * shape). See [[graft.functions.Bpe]] for the pinned semantics.
    */
  private val tx34BpeMerges: Q = (s, d) => {
    val wf = bpeWordFreqs(s, d)
    val merges = graft.functions.Bpe.train(wf, bpeMergeCount(wf.length))
    import s.implicits._
    merges.zipWithIndex
      .map { case ((l, r, c), i) => ((i + 1).toLong, l, r, c) }
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
      .orderBy("merge_rank")
  }

  /** tx35: REAL SUBWORD TOKEN COUNTS per document — the upgrade from
    * tx06's ceil(len/4) estimate to counts under the tx34-trained
    * tokenizer, side by side with the estimate (the estimates-vs-real
    * audit a budget owner reads before trusting either number).
    * Encode runs in the [[graft.functions.BpeSubwordCount]] codegen
    * kernel (merge table parsed once per spec via a static cache,
    * per-word counts memoized — per row it is one text scan). The
    * oracle re-derives the merge table from its own scan (unrolled
    * training replay) and joins every doc word to its trained
    * symbolization length — encode ≡ training evolution by the
    * merges-in-rank-order definition, so the two formulations are
    * equal BY CONSTRUCTION, not by luck.
    *
    * Scale: one plan-build word-count job + one kernel scan over the
    * corpus; nothing shuffles but the word-frequency aggregate.
    */
  /** Train on `d`'s corpus and serialize for the kernel — the one
    * plan-build job every consumer of the trained tokenizer runs
    * (tx35, pp32, pp40). */
  private[graft] def bpeSpecFor(s: SparkSession, d: String): String = {
    val wf = bpeWordFreqs(s, d)
    graft.functions.Bpe.spec(
      graft.functions.Bpe.train(wf, bpeMergeCount(wf.length)))
  }

  private val tx35SubwordTokens: Q = (s, d) => {
    val spec = bpeSpecFor(s, d)
    t(s, d, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        GraftFunctions.bpe_subword_count(col("text"), spec)
          .as("n_subwords"),
        expr("CAST((length(text) + 3) DIV 4 AS BIGINT)").as("est_tokens"))
      .withColumn("fertility_x100", expr("n_subwords * 100 DIV n_words"))
      .orderBy("doc_id")
  }

  /** The unrolled relational BPE training replay both BPE oracles
    * share (generated, `BPE_UNROLL` steps): per step — weighted pair
    * counts over the capped vocab, deterministic argmax, islands-parity
    * merge application. `s{m}` is each distinct corpus word's
    * symbolization after m merges; `b{m}` is the step-m winner (empty
    * once the derived merge count is exceeded, making later steps
    * identity). Every multi-consumed CTE is MATERIALIZED (the dd13
    * plan-nesting lesson, oracle side).
    */
  /** `pre` disambiguates every CTE name so two chains (e.g. tx36's
    * half-corpus vs full-corpus trainings) compose in one statement;
    * `srcWhere` restricts the training corpus. The default ("", no
    * filter) reproduces the tx34/tx35/pp32/pp40/st24 oracle text
    * byte-for-byte. */
  private def bpeChainSql(pre: String = "", srcWhere: String = ""): String = {
    val sb = new StringBuilder
    sb ++= s"""${pre}w0 AS MATERIALIZED (
      |  SELECT w, CAST(count(*) AS BIGINT) AS f
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w
      |        FROM documents$srcWhere)
      |  WHERE w <> '' GROUP BY w),
      |${pre}wc AS MATERIALIZED (SELECT w FROM ${pre}w0
      |  ORDER BY f DESC, w LIMIT 4096),
      |${pre}mm AS (SELECT least(24, greatest(8, count(*) // 2)) AS mx
      |  FROM ${pre}wc),
      |${pre}s0 AS MATERIALIZED (SELECT w, f, string_split(w, '') AS sym
      |  FROM ${pre}w0)
      |""".stripMargin
    for (m <- 1 to BPE_UNROLL) {
      val p = s"${pre}s${m - 1}"
      sb ++= s""",${pre}p$m AS (SELECT sym[i] AS l, sym[i + 1] AS r,
        |    CAST(sum(f) AS BIGINT) AS c
        |  FROM $p s JOIN ${pre}wc USING (w),
        |    LATERAL (SELECT unnest(generate_series(1, len(sym) - 1)) AS i)
        |  GROUP BY 1, 2),
        |${pre}b$m AS MATERIALIZED (SELECT l, r, c FROM ${pre}p$m
        |  WHERE (SELECT mx FROM ${pre}mm) >= $m
        |  ORDER BY c DESC, l, r LIMIT 1),
        |${pre}a$m AS (SELECT s.w, i,
        |    i - row_number() OVER (PARTITION BY s.w ORDER BY i) AS isl
        |  FROM $p s, ${pre}b$m b,
        |    LATERAL (SELECT unnest(generate_series(1, len(sym) - 1)) AS i)
        |  WHERE sym[i] = b.l AND sym[i + 1] = b.r),
        |${pre}sel$m AS MATERIALIZED (SELECT w, i FROM (
        |    SELECT w, i, row_number() OVER (PARTITION BY w, isl ORDER BY i)
        |      AS rn FROM ${pre}a$m) WHERE rn % 2 = 1),
        |${pre}pos$m AS (SELECT s.w, s.f, s.sym, p.i FROM $p s,
        |  LATERAL (SELECT unnest(generate_series(1, len(sym))) AS i) p),
        |${pre}s$m AS MATERIALIZED (SELECT pos.w, pos.f,
        |    list(CASE WHEN sel.i IS NOT NULL
        |      THEN pos.sym[pos.i] || pos.sym[pos.i + 1]
        |      ELSE pos.sym[pos.i] END ORDER BY pos.i) AS sym
        |  FROM ${pre}pos$m pos
        |  LEFT JOIN ${pre}sel$m sel ON sel.w = pos.w AND sel.i = pos.i
        |  LEFT JOIN ${pre}sel$m prev ON prev.w = pos.w
        |    AND prev.i = pos.i - 1
        |  WHERE prev.i IS NULL
        |  GROUP BY pos.w, pos.f)
        |""".stripMargin
    }
    sb.toString
  }

  private[graft] def tx34OracleSql: String =
    "WITH " + bpeChainSql() +
      (1 to BPE_UNROLL).map(m =>
        s"SELECT CAST($m AS BIGINT) AS merge_rank, l AS lhs, r AS rhs," +
          s" c AS pair_count FROM b$m")
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY merge_rank")

  /** tx36: TOKENIZER DRIFT — the version-pinning audit every pipeline
    * that retrains its tokenizer needs: train the tx34 merges TWICE,
    * once on the even-doc half of the corpus (yesterday's snapshot)
    * and once on all of it, and diff the merge tables rank by rank.
    * The first disagreeing rank is where tokenizations start to
    * diverge (BPE merges are a prefix-sensitive chain: everything
    * after the first flip can differ), i.e. the rank at which cached
    * token counts, packing plans and budgets stop being comparable
    * across corpus versions. Ties flipping under halved frequencies
    * are exactly the instability this surfaces.
    *
    * Scale: two bounded word-count aggregates + two driver merge
    * loops (the tx34 shape twice); output is ≤ BPE_UNROLL rows. The
    * DuckDB oracle replays BOTH trainings (the prefixed chain
    * generator) and the same full-outer rank diff.
    */
  private val tx36TokenizerDrift: Q = (s, d) => {
    def train(docsFilter: DataFrame => DataFrame)
        : Seq[(String, String)] = {
      val wf = docsFilter(t(s, d, "documents"))
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("w"))
        .limit(BPE_CAP)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      graft.functions.Bpe.train(wf, bpeMergeCount(wf.length))
        .map { case (l, r, _) => (l, r) }
    }
    val h = train(_.filter(col("doc_id") % 2 === 0))
    val f = train(identity)
    import s.implicits._
    (1 to math.max(h.length, f.length)).map { i =>
      val (hp, fp) = (h.lift(i - 1), f.lift(i - 1))
      (i.toLong, hp.map(_._1), hp.map(_._2), fp.map(_._1), fp.map(_._2),
        hp.nonEmpty && hp == fp)
    }.toDF("merge_rank", "lhs_half", "rhs_half", "lhs_full", "rhs_full",
      "agree")
      .orderBy("merge_rank")
  }

  private[graft] def tx36OracleSql: String = {
    def merged(pre: String): String =
      (1 to BPE_UNROLL).map(m =>
        s"SELECT CAST($m AS BIGINT) AS merge_rank, l AS lhs, r AS rhs" +
          s" FROM ${pre}b$m")
        .mkString("(\n", "\nUNION ALL\n", "\n)")
    "WITH " + bpeChainSql("h", " WHERE doc_id % 2 = 0") + "," +
      bpeChainSql("f") +
      s""",mh AS (SELECT * FROM ${merged("h")}),
        |mf AS (SELECT * FROM ${merged("f")})
        |SELECT coalesce(mh.merge_rank, mf.merge_rank) AS merge_rank,
        |  mh.lhs AS lhs_half, mh.rhs AS rhs_half,
        |  mf.lhs AS lhs_full, mf.rhs AS rhs_full,
        |  (mh.lhs IS NOT NULL AND mf.lhs IS NOT NULL
        |    AND mh.lhs = mf.lhs AND mh.rhs = mf.rhs) AS agree
        |FROM mh FULL OUTER JOIN mf ON mh.merge_rank = mf.merge_rank
        |ORDER BY merge_rank""".stripMargin
  }

  /** bpeChainSql extended to per-document real subword counts
    * (`docsw`: doc_id, n_subwords) — the prefix every oracle that
    * consumes the trained tokenizer downstream shares (tx35, pp32,
    * pp40). */
  private[graft] def bpeDocPrefixSql: String = "WITH " + bpeDocCtes

  /** The same CTE list without the WITH keyword, for oracles that need
    * `WITH RECURSIVE` in front (mm17's packing fold). */
  private[graft] def bpeDocCtes: String =
    bpeChainSql() +
      s""",ns AS (SELECT w, CAST(len(sym) AS BIGINT) AS nsub
        |  FROM s$BPE_UNROLL),
        |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |docsw AS MATERIALIZED (SELECT doc_id,
        |    CAST(coalesce(sum(ns.nsub), 0) AS BIGINT) AS n_subwords
        |  FROM dw LEFT JOIN ns ON ns.w = dw.w GROUP BY doc_id)
        |""".stripMargin

  private[graft] def tx35OracleSql: String =
    bpeDocPrefixSql +
      s"""SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
        |  docsw.n_subwords,
        |  CAST((length(d.text) + 3) // 4 AS BIGINT) AS est_tokens,
        |  docsw.n_subwords * 100
        |    // CAST(len(string_split(d.text, ' ')) AS BIGINT)
        |    AS fertility_x100
        |FROM documents d JOIN docsw USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin

  /** The tx32 width rule, shared with `OperatorInvariantSpec`:
    * ~8 distinct grams per cell, floor 64. */
  private[graft] def cmsWidth(distinctGrams: Long): Long =
    math.max(64L, distinctGrams / 8L)

  private val tx32CountMin: Q = (s, d) => {
    val depth = 4
    val tk = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    // corpus gram stream: feeds the width derivation, the sketch build
    // AND the audit branch. r8 A/B'd an eager checkpoint SLOWER with
    // three consumers (3.1 s vs 2.4-2.6 s); the r9 width job added a
    // fourth full pass and flipped the call — re-A/B'd same-session:
    // checkpointed 3.15/3.36 s vs un-checkpointed 3.59/3.97 s at
    // sf0.1 (r8 code measured 2.84 on the same host — the remaining
    // +0.3 s is the sizing job itself, the price of self-derivation)
    val grams = tk.select(col("doc_id"), explode(expr(
      """transform(sequence(0, size(toks) - 3),
        |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"""
        .stripMargin)).as("gram"))
      .transform(graft.Par.spread)
      .localCheckpoint()
    // derived width: ONE constant-size distinct count at plan-build
    // time (scaladoc above) — the result is a scalar, so inlining it
    // as a literal keeps the cell expression codegen-friendly
    val width = cmsWidth(grams.select("gram").distinct().count())
    def cellExpr(gramCol: String): String =
      s"CAST(conv(substring(md5(concat(CAST(s AS STRING), '#', " +
        s"$gramCol)), 1, 8), 16, 10) AS BIGINT) % $width"
    // the sketch: one grouped count over (seed, cell) — 4·w rows max
    val sketch = grams
      .select(explode(expr(s"sequence(0, ${depth - 1})")).as("s"),
        col("gram").as("g"))
      .groupBy(col("s"), expr(cellExpr("g")).as("cell"))
      .agg(count(lit(1)).as("n"))
    // deterministic probe set + exact truth (audit-only branch)
    val probes = grams.filter(col("doc_id") % 100 === 0)
      .select("gram").distinct()
    val truth = grams.join(probes, Seq("gram"), "left_semi")
      .groupBy("gram").agg(count(lit(1)).as("true_n"))
    truth
      .select(col("gram"), col("true_n"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("s"))
      .withColumn("cell", expr(cellExpr("gram")))
      .join(sketch, Seq("s", "cell"))
      .groupBy("gram", "true_n").agg(min("n").as("cms_n"))
      .select(col("gram"), col("true_n"), col("cms_n"),
        (col("cms_n") - col("true_n")).as("overshoot"))
      .orderBy("gram")
  }

  val queries: Map[String, Q] = Map(
    "tx34_bpe_merges" -> tx34BpeMerges,
    "tx35_subword_tokens" -> tx35SubwordTokens,
    "tx36_tokenizer_drift" -> tx36TokenizerDrift,
    "tx33_source_novelty" -> tx33SourceNovelty,
    "tx32_countmin_ngrams" -> tx32CountMin,
    "tx31_vocab_growth" -> tx31VocabGrowth,
    "tx29_canary_audit" -> tx29CanaryAudit,
    "tx28_encoding_audit" -> tx28EncodingAudit,
    "tx24_source_drift" -> tx24SourceDrift,
    "tx23_freq_spectrum" -> tx23FreqSpectrum,
    "tx22_char_diversity" -> tx22CharDiversity,
    "tx30_readability" -> tx30Readability,
    "tx17_term_commonness" -> tx17TermCommonness,
    "tx01_token_count" -> tx01Tokens,
    "tx02_quality_score" -> tx02Quality,
    "tx03_lang_id" -> tx03LangId,
    "tx04_fingerprint_md5" -> tx04FingerprintMd5,
    "tx05_fingerprint_hash64" -> tx05FingerprintRolling,
    "tx06_token_estimate" -> tx06TokenEstimate,
    "tx07_source_signature" -> tx07SourceSignature,
    "tx08_polyhash_fingerprint" -> tx08PolyHash,
    "tx09_regex_extract" -> tx09RegexExtract,
    "tx10_langid_eval" -> tx10LangIdEval,
    "tx11_normalize" -> tx11Normalize,
    "tx12_edit_distance" -> tx12EditDistance,
    "tx13_source_sig_oracle" -> tx13SourceSigOracle,
  )

  val oracleSql: Map[String, String] = Map(
    // tx34/tx35: the full BPE training loop replayed relationally
    // (generated, BPE_UNROLL steps — see bpeChainSql's scaladoc)
    "tx34_bpe_merges" -> tx34OracleSql,
    "tx35_subword_tokens" -> tx35OracleSql,
    "tx36_tokenizer_drift" -> tx36OracleSql,
    // tx33: gram build + first-source min + per-source counters, all
    // replayed; integer division exact both engines
    "tx33_source_novelty" ->
      """WITH tk AS (SELECT source, string_split(text, ' ') AS toks
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |bg AS MATERIALIZED (SELECT source,
        |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |  FROM tk, LATERAL (SELECT
        |    unnest(generate_series(1, len(toks) - 2)) AS i)),
        |ps AS (SELECT source,
        |    CAST(count(*) AS BIGINT) AS gram_occurrences,
        |    CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams
        |  FROM bg GROUP BY 1),
        |fs AS (SELECT gram, min(source) AS source FROM bg GROUP BY 1),
        |mg AS (SELECT source, CAST(count(*) AS BIGINT) AS new_grams
        |  FROM fs GROUP BY 1)
        |SELECT ps.source, ps.gram_occurrences, ps.distinct_grams,
        |  CAST(coalesce(mg.new_grams, 0) AS BIGINT) AS new_grams,
        |  CAST(coalesce(mg.new_grams, 0) * 10000 // ps.distinct_grams
        |    AS BIGINT) AS novelty_x10k
        |FROM ps LEFT JOIN mg USING (source)
        |ORDER BY ps.source""".stripMargin,
    // tx31: trigram build, first-seen min, prefix θ-joins replayed;
    // all-integer outputs
    // tx32: identical sketch rebuilt cell-for-cell (the pp37 portable
    // md5→BIGINT cell hash), estimates join the same 4 rows per probe;
    // width RE-DERIVED from the oracle's own distinct-gram count
    // (greatest(64, V // 8) — integer division, exact in both engines)
    "tx32_countmin_ngrams" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |bg AS MATERIALIZED (SELECT doc_id,
        |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |  FROM tk, LATERAL (SELECT
        |    unnest(generate_series(1, len(toks) - 2)) AS i)),
        |wd AS (SELECT greatest(64, count(DISTINCT gram) // 8) AS wth
        |  FROM bg),
        |seeds AS (SELECT unnest(generate_series(0, 3)) AS s),
        |sk AS MATERIALIZED (SELECT s,
        |    CAST(('0x' || substr(md5(CAST(s AS VARCHAR) || '#' || gram),
        |      1, 8)) AS BIGINT) % (SELECT wth FROM wd) AS cell,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM bg CROSS JOIN seeds GROUP BY 1, 2),
        |truth AS MATERIALIZED (SELECT gram,
        |    CAST(count(*) AS BIGINT) AS true_n
        |  FROM bg WHERE gram IN (
        |    SELECT DISTINCT gram FROM bg WHERE doc_id % 100 = 0)
        |  GROUP BY 1),
        |est AS (SELECT t.gram, t.true_n, min(sk.n) AS cms_n
        |  FROM truth t CROSS JOIN seeds
        |  JOIN sk ON sk.s = seeds.s AND sk.cell =
        |    CAST(('0x' || substr(md5(CAST(seeds.s AS VARCHAR) || '#' ||
        |      t.gram), 1, 8)) AS BIGINT) % (SELECT wth FROM wd)
        |  GROUP BY 1, 2)
        |SELECT gram, true_n, CAST(cms_n AS BIGINT) AS cms_n,
        |  CAST(cms_n - true_n AS BIGINT) AS overshoot
        |FROM est ORDER BY gram""".stripMargin,
    "tx31_vocab_growth" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |bg AS MATERIALIZED (SELECT doc_id,
        |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |  FROM tk, LATERAL (SELECT
        |    unnest(generate_series(1, len(toks) - 2)) AS i)),
        |fs AS (SELECT gram, min(doc_id) AS fs FROM bg GROUP BY 1),
        |dg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ngrams
        |  FROM bg GROUP BY 1),
        |cuts AS (SELECT CAST(unnest([100, 200, 500, 1000, 2000, 5000])
        |    AS BIGINT) AS prefix_docs),
        |v AS (SELECT prefix_docs, CAST(count(*) AS BIGINT) AS vocab
        |  FROM cuts JOIN fs ON fs.fs < cuts.prefix_docs GROUP BY 1),
        |p AS (SELECT prefix_docs, CAST(sum(ngrams) AS BIGINT)
        |    AS prefix_grams
        |  FROM cuts JOIN dg ON dg.doc_id < cuts.prefix_docs GROUP BY 1)
        |SELECT c.prefix_docs,
        |  CAST(coalesce(p.prefix_grams, 0) AS BIGINT) AS prefix_grams,
        |  CAST(coalesce(v.vocab, 0) AS BIGINT) AS vocab
        |FROM cuts c LEFT JOIN p USING (prefix_docs)
        |LEFT JOIN v USING (prefix_docs)
        |ORDER BY prefix_docs""".stripMargin,
    // tx29: planting + regex sweep + exposure rollup all replayed.
    "tx29_canary_audit" ->
      """WITH wire AS (SELECT doc_id, source, text ||
        |    CASE WHEN doc_id % 23 = 3 THEN ' CANARY-' ||
        |        CAST((doc_id // 23) % 8 AS VARCHAR) || '-SEC'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 46 = 3 THEN ' CANARY-' ||
        |        CAST((doc_id // 23) % 8 AS VARCHAR) || '-SEC'
        |      ELSE '' END AS w
        |  FROM documents),
        |m AS (SELECT doc_id, source,
        |    unnest(regexp_extract_all(w, 'CANARY-[0-9]+-SEC')) AS canary
        |  FROM wire),
        |g AS (SELECT
        |    CAST(regexp_extract(canary, 'CANARY-([0-9]+)-SEC', 1)
        |      AS BIGINT) AS cid,
        |    count(*) AS n_occurrences,
        |    count(DISTINCT doc_id) AS n_docs,
        |    count(DISTINCT source) AS n_sources
        |  FROM m GROUP BY 1)
        |SELECT cid, n_occurrences, n_docs, n_sources,
        |  CASE WHEN n_occurrences >= 5 THEN 'high'
        |       WHEN n_occurrences >= 2 THEN 'repeated'
        |       ELSE 'single' END AS risk_class
        |FROM g ORDER BY cid""".stripMargin,
    // tx28: planting AND detection replayed — chr() builds the same BMP
    // damage chars the Spark side plants as \u literals; counts via the
    // replace/length idiom (code-point-exact both engines on BMP).
    "tx28_encoding_audit" ->
      """WITH wire AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 17 = 0 THEN text || ' ' || chr(65533) ||
        |        chr(65533) || 'tok' || chr(65533)
        |      WHEN doc_id % 17 = 5 THEN text || ' ' || chr(7) || 'x' ||
        |        chr(27) || 'x' || chr(7)
        |      WHEN doc_id % 17 = 11 THEN text || ' ' || chr(195) ||
        |        chr(169) || chr(194) || chr(163) || chr(195) || chr(162)
        |      ELSE text END AS w
        |  FROM documents),
        |c AS (SELECT source,
        |    CAST(length(w) - length(replace(w, chr(65533), ''))
        |      AS BIGINT) AS n_repl,
        |    CAST(length(w) - length(replace(w, chr(7), '')) AS BIGINT)
        |      + CAST(length(w) - length(replace(w, chr(27), ''))
        |      AS BIGINT) AS n_ctrl,
        |    CAST(length(w) - length(replace(w, chr(195), '')) AS BIGINT)
        |      + CAST(length(w) - length(replace(w, chr(194), ''))
        |      AS BIGINT) AS n_moji
        |  FROM wire),
        |cl AS (SELECT source,
        |    CASE WHEN n_repl > 0 THEN 'replacement'
        |      WHEN n_ctrl > 0 THEN 'control'
        |      WHEN n_moji > 0 THEN 'mojibake'
        |      ELSE 'clean' END AS damage_class,
        |    n_repl + n_ctrl + n_moji AS dmg
        |  FROM c),
        |g AS (SELECT source, damage_class,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dmg) AS BIGINT) AS damage_chars
        |  FROM cl GROUP BY 1, 2)
        |SELECT source, damage_class, n_docs, damage_chars,
        |  CAST(n_docs * 10000 // CAST(sum(n_docs) OVER
        |    (PARTITION BY source) AS BIGINT) AS BIGINT) AS rate_x10k
        |FROM g ORDER BY source, damage_class""".stripMargin,
    "tx24_source_drift" ->
      """WITH tk AS (SELECT source,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |per_src AS (SELECT source, tok, count(*) AS o
        |  FROM tk GROUP BY 1, 2),
        |vocab AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
        |src_tot AS (SELECT source, CAST(sum(o) AS BIGINT) AS t
        |  FROM per_src GROUP BY 1),
        |corpus_tot AS (SELECT CAST(sum(c) AS BIGINT) AS big_t FROM vocab),
        |grid AS (SELECT st.source, v.tok, v.c, st.t,
        |    coalesce(p.o, 0) AS o
        |  FROM vocab v CROSS JOIN src_tot st
        |  LEFT JOIN per_src p ON p.source = st.source AND p.tok = v.tok)
        |SELECT g.source, max(g.t) AS n_tokens,
        |  CAST(sum(abs(g.o * ct.big_t - g.c * g.t)) AS BIGINT)
        |    * 10000 // (2 * max(g.t) * max(ct.big_t)) AS tv_x10k
        |FROM grid g CROSS JOIN corpus_tot ct
        |GROUP BY g.source ORDER BY g.source""".stripMargin,
    "tx23_freq_spectrum" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT md5(tk[i] || ' ' || tk[i + 1]) AS fp
        |  FROM t, unnest(generate_series(1, len(tk) - 1)) AS s(i)),
        |v AS (SELECT fp, count(*) AS tf FROM bg GROUP BY fp),
        |b AS (SELECT CAST(length(bin(tf)) AS BIGINT) AS band,
        |    count(*) AS n_terms, CAST(sum(tf) AS BIGINT) AS band_mass
        |  FROM v GROUP BY 1),
        |tt AS (SELECT CAST(sum(band_mass) AS BIGINT) AS total_mass,
        |    CAST(sum(n_terms) AS BIGINT) AS total_terms FROM b)
        |SELECT band, n_terms, band_mass,
        |  band_mass * 10000 // total_mass AS mass_x10k,
        |  n_terms * 10000 // total_terms AS terms_x10k
        |FROM b CROSS JOIN tt ORDER BY band""".stripMargin,
    // tx30: words via string_split count, sentences via replace-length
    // delta, syllables via the vowel-group-start comprehension — all
    // count-identical to the fused byte-pass kernel (ASCII test classes
    // never collide with UTF-8 continuation bytes)
    "tx30_readability" ->
      """WITH ch AS (SELECT doc_id, text, string_split(text, '') AS t
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
        |    CAST(len(t) - len(replace(replace(replace(text, '.', ''),
        |      '!', ''), '?', '')) AS BIGINT) AS sentences,
        |    CAST(coalesce(list_sum([CASE WHEN
        |        contains('aeiouAEIOU', t[i]) AND (i = 1 OR NOT
        |        contains('aeiouAEIOU', t[i-1])) THEN 1 ELSE 0 END
        |      for i in generate_series(1, len(t))]), 0) AS BIGINT)
        |      AS syllables
        |  FROM ch)
        |SELECT doc_id, words, sentences, syllables,
        |  (39 * words // greatest(1, sentences)) +
        |  (1180 * syllables // greatest(1, words)) - 1559 AS fkg_x100
        |FROM m ORDER BY doc_id""".stripMargin,
    "tx22_char_diversity" -> {
      val cnt = tx22Alphabet.zipWithIndex.map { case (ch, i) =>
        s"CAST(length(text) - length(replace(text, '$ch', '')) AS BIGINT) AS c$i"
      }
      val cs = tx22Alphabet.indices.map(i => s"c$i")
      s"""WITH c AS (SELECT doc_id,
         |    ${cnt.mkString(",\n    ")}
         |  FROM documents),
         |s AS (SELECT doc_id, ${cs.mkString(" + ")} AS n,
         |    ${cs.map(c => s"$c * $c").mkString(" + ")} AS ssq,
         |    greatest(${cs.mkString(", ")}) AS mx
         |  FROM c)
         |SELECT doc_id, n AS n_letters, ssq AS sum_sq,
         |  (n * n - ssq) * 10000 // (n * n) AS gini_x10k,
         |  mx * 100 // n AS top_char_x100
         |FROM s WHERE n > 0 ORDER BY doc_id""".stripMargin
    },
    "tx17_term_commonness" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, count(*) AS tf_corpus FROM tk GROUP BY tok)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(tf_corpus) * 100 // count(*) AS BIGINT) AS mean_tf_x100,
        |  min(tf_corpus) AS rarest_tf
        |FROM tk JOIN v USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "tx01_token_count" ->
      """SELECT doc_id,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |    AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx02_quality_score" ->
      """SELECT doc_id, n_chars,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |    AS n_tokens,
        |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / (length(text) - length(replace(text, ' ', '')) + 1), 4)
        |    AS avg_token_len,
        |  round(CAST(len(list_filter(string_split(text, ' '),
        |      tk -> tk IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
        |    / (length(text) - length(replace(text, ' ', '')) + 1), 4)
        |    AS stopword_ratio,
        |  (length(text) - length(replace(text, ' ', '')) + 1 >= 10
        |     AND n_chars >= 50) AS passes_min_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx04_fingerprint_md5" ->
      "SELECT doc_id, md5(lower(text)) AS fp FROM documents ORDER BY doc_id",
    // tx03: the argmax over (score, lang) structs replays in DuckDB via
    // list_reverse_sort — struct comparison is field-order lexicographic
    // in both engines, so the desc tie-break on lang matches exactly.
    "tx03_lang_id" ->
      """WITH s AS (SELECT doc_id,
        |  [{'score': len(list_filter(string_split(text, ' '),
        |        t -> t IN ('the', 'a', 'of', 'and'))), 'lang': 'en'},
        |   {'score': len(list_filter(string_split(text, ' '),
        |        t -> t IN ('el', 'la', 'de', 'y'))), 'lang': 'es'},
        |   {'score': len(list_filter(string_split(text, ' '),
        |        t -> t IN ('der', 'die', 'und', 'ein'))), 'lang': 'de'},
        |   {'score': len(list_filter(string_split(text, ' '),
        |        t -> t IN ('le', 'la', 'et', 'un'))), 'lang': 'fr'}] AS cand
        |  FROM documents)
        |SELECT doc_id, list_reverse_sort(cand)[1].lang AS pred_lang,
        |       CAST(list_reverse_sort(cand)[1].score AS BIGINT) AS score
        |FROM s ORDER BY doc_id""".stripMargin,
    "tx06_token_estimate" ->
      """SELECT doc_id,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |    AS n_words,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |      t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT)
        |    AS n_subwords_est
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx08_polyhash_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''),
        |        c -> CAST(ord(c) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 1000000007) AS ph,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(lower(source), ''),
        |        c -> CAST(ord(c) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 1000000007) AS ph_source
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx09_regex_extract" ->
      """SELECT doc_id,
        |  coalesce(regexp_extract(text, '([a-z]{7,})', 1), '')
        |    AS first_long_word,
        |  CAST(len(regexp_extract_all(text, '[a-z]{7,}', 0)) AS BIGINT)
        |    AS n_long_words,
        |  CAST(len(regexp_extract_all(text, '[aeiou]{2,}', 0)) AS BIGINT)
        |    AS n_vowel_runs
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx10_langid_eval" ->
      """WITH s AS (SELECT lang,
        |  list_reverse_sort(
        |  [{'score': len(list_filter(string_split(text, ' '),
        |        t -> t IN ('the', 'a', 'of', 'and'))), 'lang': 'en'},
        |   {'score': len(list_filter(string_split(text, ' '),
        |        t -> t IN ('el', 'la', 'de', 'y'))), 'lang': 'es'},
        |   {'score': len(list_filter(string_split(text, ' '),
        |        t -> t IN ('der', 'die', 'und', 'ein'))), 'lang': 'de'},
        |   {'score': len(list_filter(string_split(text, ' '),
        |        t -> t IN ('le', 'la', 'et', 'un'))), 'lang': 'fr'}]
        |  )[1].lang AS pred_lang
        |  FROM documents)
        |SELECT lang, pred_lang, count(*) AS n FROM s
        |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin,
    "tx11_normalize" ->
      """SELECT doc_id,
        |  CAST(length(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS n_norm,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx12_edit_distance" ->
      """WITH p AS (SELECT doc_id, source, substring(text, 1, 40) AS p
        |           FROM documents),
        |n AS (SELECT doc_id, p,
        |    lead(p) OVER (PARTITION BY source ORDER BY doc_id) AS next_p
        |  FROM p)
        |SELECT doc_id, CAST(levenshtein(p, next_p) AS BIGINT) AS edit_dist
        |FROM n WHERE next_p IS NOT NULL ORDER BY doc_id""".stripMargin,
    "tx13_source_sig_oracle" ->
      """WITH t AS (SELECT source, text, string_split(text, ' ') AS tk
        |           FROM documents),
        |sh AS (SELECT source,
        |    unnest(CASE WHEN len(tk) < 3 THEN [text]
        |      ELSE [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |            for i in generate_series(1, len(tk) - 2)] END) AS s
        |  FROM t)
        |SELECT source,
        |  min(md5(s || '#0')) AS sig0, min(md5(s || '#1')) AS sig1,
        |  min(md5(s || '#2')) AS sig2, min(md5(s || '#3')) AS sig3
        |FROM sh GROUP BY source ORDER BY source""".stripMargin,
    // tx05 (custom 64-bit wrapping hashes) and tx07 (MinHash sketch lanes)
    // are not DuckDB-expressible → rows-only checks + in-JVM specs.
  )
}
