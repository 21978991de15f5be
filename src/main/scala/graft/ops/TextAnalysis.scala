package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (driver north
  * star): language-ID, quality scoring, token counting, fingerprinting.
  * Every formula is a pure Catalyst column expression built from exact
  * integer counts, so results hash-match the DuckDB oracle bit-for-bit.
  */
object TextAnalysis {

  /** Count word-boundary regex matches. */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  // Small per-language stopword marker sets (n-gram heuristic grade).
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "nicht"),
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "los", "que", "es"),
    "fr" -> Seq("le", "les", "des", "est"),
    "zh" -> Seq("de", "shi", "bu", "le"))

  /** Per-language stopword-hit score. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => countMatches(text, s"\\b$m\\b")).reduce(_ + _)

  /** Predicted language: highest marker score; ties resolve in fixed
    * alphabetical priority (deterministic, oracle-replicable CASE chain). */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> langScore(text, ms) }
    scores.foldRight(lit("und")) { case ((lang, score), rest) =>
      val geAll = scores.map(_._2).map(score >= _).reduce(_ && _)
      when(score > 0 && geAll, lit(lang)).otherwise(rest)
    }
  }

  def wordCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** Syllable-count proxy: vowel-group runs (the standard readability
    * heuristic — each maximal [aeiouy]+ run counts one syllable). */
  def syllableCount(text: Column): Column =
    countMatches(lower(text), "[aeiouy]+")

  /** Sentence count with the >= 1 floor every readability formula
    * assumes (a fragment with no terminal punctuation is one sentence). */
  def sentenceCount(text: Column): Column =
    greatest(countMatches(text, "[.!?]+"), lit(1))

  /** Flesch reading ease from the exact integer counts — the operand
    * order is pinned (two divides, two multiplies, left-assoc subtract)
    * so both engines produce the identical IEEE double. */
  def fleschEase(words: Column, sentences: Column,
      syllables: Column): Column =
    lit(206.835) -
      lit(1.015) * (words.cast("double") / sentences.cast("double")) -
      lit(84.6) * (syllables.cast("double") / words.cast("double"))

  /** Rule-grade ORG mention pattern: a run of capitalized tokens ending
    * in a corporate suffix token — the pattern upgrade of the gazetteer
    * X4 NER (no lexicon needed; the capitalization + suffix rules carry
    * the signal). Shared verbatim with the DuckDB twin (RE2 and
    * java.util.regex agree on this subset). */
  val OrgPattern: String =
    "(?:[A-Z][A-Za-z]+ )+(?:Inc|Corp|LLC|Ltd|GmbH|Co)\\b"

  /** All ORG-shaped mentions in order of occurrence (pure map stage). */
  def orgMentions(text: Column): Column =
    regexp_extract_all(text, lit(OrgPattern), lit(0))

  /** BPE-ish subword token count: letter runs, digit runs, and individual
    * punctuation marks each count as one token. Retained as the proxy the
    * earlier gates (ta_text_profile / ta_corpus_stats / pack_sequences /
    * curate_sample) were built on; [[bpeTokenCount]] is the real merges
    * tokenizer. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** REAL merges-table BPE token count: greedy rank-order merges over the
    * committed /graft/bpe_merges.txt fixture (BpeImpl), as a codegen'd
    * Catalyst expression — pure map stage at any corpus size. */
  def bpeTokenCount(text: Column): Column = {
    import org.apache.spark.sql.graft.{BpeTokenCount, internal}
    internal.column(BpeTokenCount(internal.expression(text)))
  }

  /** Token count under a LEARNED merges table (the (left, right) pairs
    * from BpeTrain.train, rank order) — one codegen'd kernel call per
    * row; the map-stage way to apply a corpus-trained tokenizer. */
  def bpeTokenCountLearned(text: Column,
      merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graft.{BpeLearnedTokenCount, internal}
    internal.column(BpeLearnedTokenCount(internal.expression(text),
      merges.iterator.flatMap(m => Iterator(m._1, m._2)).toArray))
  }

  def punctRatio(text: Column): Column =
    countMatches(text, "[.!?,;:]").cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def stopwordRatio(text: Column): Column =
    langScore(text, Seq("the", "and", "of", "is", "a", "to", "in")).cast("double") /
      greatest(wordCount(text), lit(1)).cast("double")

  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(wordCount(text), lit(1)).cast("double")

  /** Composite quality score in ~[0,1]: long enough, low punctuation
    * noise, natural stopword density, plausible word length. The exact
    * formula is arbitrary but fixed — both engines compute it identically
    * from exact integer counts. */
  def qualityScore(text: Column): Column = {
    val lenOk = least(length(text).cast("double") / 400.0, lit(1.0))
    val punctOk = when(punctRatio(text) <= 0.05, 1.0).otherwise(0.5)
    val stopOk = least(stopwordRatio(text) * 5.0, lit(1.0))
    val wordOk = when(meanWordLen(text).between(3.0, 9.0), 1.0).otherwise(0.5)
    lenOk * 0.4 + punctOk * 0.2 + stopOk * 0.2 + wordOk * 0.2
  }

  /** Content-defined document fingerprint (md5 over normalized text). */
  def fingerprint(text: Column): Column = Dedup.fingerprint(text)

  // --- Unigram-frequency quality proxy (CCNet-style) -------------------

  /** Per-doc unigram log-frequency score — the exact-integer stand-in for
    * the LM-perplexity quality filter (CCNet ranks docs by a small LM's
    * perplexity; the distribution-shape signal survives with corpus
    * unigram frequencies, and floor(log2(count)) = length(bin(count))-1
    * keeps every number integer so both engines agree bit-for-bit — no
    * float log). Docs averaging LOW log-frequency are rare-word-heavy
    * (OCR noise, word salad) — the drop candidates.
    *
    * Two-pass corpus-model shape: pass 1 builds the unigram table (one
    * shuffle on the 64-bit word hash — 8-byte keys, the d2/d8
    * convention); pass 2 scores each occurrence through the model join
    * and re-aggregates per doc. At 100 TB the vocabulary is Zipf-bounded
    * (far below row count) — broadcast it when it fits, else this plain
    * hash join co-partitions both sides on the word hash.
    * Returns (id, n_words, logfreq_sum, logfreq_avg). */
  def unigramLogFreq(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String): org.apache.spark.sql.DataFrame = {
    val words = docs.select(col(id),
      explode(split(Dedup.normalized(col(text)), " ")).as("__w"))
      .select(col(id), xxhash64(col("__w")).as("__h"))
    val vocab = words.groupBy(col("__h")).agg(count(lit(1)).as("__c"))
    words.join(vocab, Seq("__h"))
      .withColumn("__s", (length(bin(col("__c"))) - 1).cast("long"))
      .groupBy(col(id)).agg(
        count(lit(1)).as("n_words"),
        sum(col("__s")).as("logfreq_sum"),
        (sum(col("__s")).cast("double") / count(lit(1)).cast("double"))
          .as("logfreq_avg"))
  }

  /** Per-doc BIGRAM conditional log-probability proxy — one LM order up
    * from [[unigramLogFreq]] (CCNet ranks by a 5-gram KenLM; the bigram
    * conditional carries the first slice of context signal the unigram
    * misses: word-salad docs score low even when every word is common,
    * because their word PAIRS are rare). Score of an occurrence (w1, w2)
    * is floor(log2 c(w1,w2)) - floor(log2 c(w1·)) <= 0, an exact-integer
    * stand-in for log2 p(w2|w1) with c(w1·) the bigram-prefix count, so
    * both engines agree bit-for-bit — no float log.
    *
    * Same two-pass corpus-model shape as the unigram: pass 1 builds the
    * bigram and prefix tables off ONE bigram projection (two group-bys,
    * both shuffling 8-byte hashes); pass 2 scores each occurrence
    * through the model joins and re-aggregates per doc. Vocab² is still
    * Zipf-bounded far below corpus size at 100 TB — broadcast when it
    * fits, else the joins co-partition on the hash. Docs with fewer than
    * two words surface with n_bigrams = 0 and avg 0.0 (left join back).
    * Returns (id, n_bigrams, logprob_sum, logprob_avg). */
  def bigramLogProb(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String): org.apache.spark.sql.DataFrame = {
    val bg = docs
      .select(col(id), split(Dedup.normalized(col(text)), " ").as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(col(id), explode(transform(
        sequence(lit(1), size(col("__ws")) - 1),
        i => concat_ws(" ", slice(col("__ws"), i, lit(2))))).as("__b"))
      .select(col(id),
        xxhash64(substring_index(col("__b"), " ", 1)).as("__h1"),
        xxhash64(col("__b")).as("__h12"))
    val m12 = bg.groupBy(col("__h12")).agg(count(lit(1)).as("__c12"))
    val m1 = bg.groupBy(col("__h1")).agg(count(lit(1)).as("__c1"))
    val scored = bg.join(m12, Seq("__h12")).join(m1, Seq("__h1"))
      .withColumn("__s",
        (length(bin(col("__c12"))) - length(bin(col("__c1")))).cast("long"))
      .groupBy(col(id)).agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("__s")).as("logprob_sum"),
        (sum(col("__s")).cast("double") / count(lit(1)).cast("double"))
          .as("logprob_avg"))
    docs.select(col(id)).join(scored, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logprob_sum"), lit(0L)).as("logprob_sum"),
        coalesce(col("logprob_avg"), lit(0.0)).as("logprob_avg"))
  }

  /** TOP-K COLLOCATIONS by pointwise mutual information — the adjacent
    * word pairs that co-occur far beyond what their marginal frequencies
    * predict (the "new york" detector every corpus profiler ships; high-
    * PMI pairs are also the multi-word units a tokenizer vocabulary
    * wants). All probabilities are over BIGRAM events, so one projection
    * feeds everything: p(w1 w2) = c12/N, p(w1 ·) = prefix count/N,
    * p(· w2) = suffix count/N, and PMI = log2(N*c12 / (c1*c2)) is kept
    * exact-integer via the floor-log2 convention of [[unigramLogFreq]]:
    * pmi_floor = floor(log2(N*c12)) - floor(log2(c1*c2)) (within 1 of
    * floor(PMI) — the deterministic stand-in for the float log).
    *
    * Ranking is (pmi_floor desc, n_pair desc, md5-prefix key asc) via the
    * bounded [[Sampling.topKByKey]] aggregate over a packed key — the
    * vocabulary-squared pair table never funnels through one sort
    * partition. `minCount` prunes the rare-pair noise floor (standard
    * collocation practice: PMI is maximal for singletons). Counts are
    * assumed < 2^40 per distinct pair (packing bound; holds to ~10^12
    * occurrences of a single bigram). Returns
    * (rk, gram, n_pair, n_left, n_right, pmi_floor). */
  def pmiCollocations(docs: org.apache.spark.sql.DataFrame, text: String,
      topK: Int, minCount: Long = 5L): org.apache.spark.sql.DataFrame = {
    require(topK > 0 && minCount >= 1)
    val bg = docs
      .select(split(Dedup.normalized(col(text)), " ").as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__ws")) - 1),
        i => concat_ws(" ", slice(col("__ws"), i, lit(2))))).as("gram"))
      .select(col("gram"),
        xxhash64(substring_index(col("gram"), " ", 1)).as("__h1"),
        xxhash64(substring_index(col("gram"), " ", -1)).as("__h2"))
    val tot = bg.agg(count(lit(1)).as("__n"))
    val pair = bg.groupBy(col("gram"), col("__h1"), col("__h2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val pre = bg.groupBy(col("__h1")).agg(count(lit(1)).as("n_left"))
    val suf = bg.groupBy(col("__h2")).agg(count(lit(1)).as("n_right"))
    val scored = pair.join(pre, Seq("__h1")).join(suf, Seq("__h2"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi_floor",
        (length(bin(col("__n") * col("n_pair"))) -
          length(bin(col("n_left") * col("n_right")))).cast("long"))
      .withColumn("__k",
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long"))
    val top = scored
      .agg(Sampling.topKByKey(
        -((col("pmi_floor") + 128L) * lit(1L << 40) + col("n_pair")),
        col("__k"), topK).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "s")))
      .select((col("pos") + 1).cast("int").as("rk"), col("s.id").as("__k"))
    top.join(scored, "__k")
      .select(col("rk"), col("gram"), col("n_pair"), col("n_left"),
        col("n_right"), col("pmi_floor"))
  }

  /** DSIR-style IMPORTANCE WEIGHTS (arXiv:2302.03169): score every doc by
    * how much more likely its words are under a TARGET distribution (the
    * domain you want more of) than under the raw corpus — the
    * domain-adaptation selection signal, here with the same exact-integer
    * log2 convention as [[unigramLogFreq]]: per word occurrence,
    * s = floor(log2(c_target+1)) - floor(log2(c_raw+1)) (add-one smoothed
    * so target-absent words contribute -floor(log2(c_raw+1))), per doc
    * the sum and mean of s. Rank/threshold on the mean to select.
    *
    * Scale shape: BOTH models come from one grouped aggregation over one
    * word projection (count + conditional count per 8-byte word hash —
    * a single shuffle), then one score pass through the model join: the
    * two-scan minimum for model-then-score. `target` is any boolean
    * Column over the doc row (a lang/source/quality predicate).
    * Returns (id, n_words, logratio_sum, logratio_avg). */
  def importanceWeights(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String, target: Column): org.apache.spark.sql.DataFrame = {
    val words = docs.select(col(id), target.as("__t"),
        explode(split(Dedup.normalized(col(text)), " ")).as("__w"))
      .select(col(id), col("__t"), xxhash64(col("__w")).as("__h"))
    val model = words.groupBy(col("__h")).agg(
      count(lit(1)).as("__cr"),
      count(when(col("__t"), 1)).as("__ct"))
    words.join(model, Seq("__h"))
      .withColumn("__s",
        (length(bin(col("__ct") + 1)) - length(bin(col("__cr") + 1)))
          .cast("long"))
      .groupBy(col(id)).agg(
        count(lit(1)).as("n_words"),
        sum(col("__s")).as("logratio_sum"),
        (sum(col("__s")).cast("double") / count(lit(1)).cast("double"))
          .as("logratio_avg"))
  }

  /** Gopher/C4-style FILTER FUNNEL: per-doc verdicts for a fixed,
    * ordered rule chain plus the FIRST failing rule — the per-rule
    * ablation table a curation run publishes so threshold changes can be
    * priced before re-running the corpus. Rules (in funnel order):
    * min_chars (>= 200), min_words (>= 40), stopword_ratio (>= 0.06),
    * top_word_frac (<= 0.12, the Gopher most-common-word screen via a
    * longest-run count over the sorted word array — per-row fold, no
    * explode). Pure map stage: one corpus scan, no shuffle. */
  def filterFunnel(text: Column): Seq[Column] = {
    val words = split(Dedup.normalized(text), " ")
    val topFrac = topRun(array_sort(words)).getField("n").cast("double") /
      greatest(size(words), lit(1)).cast("double")
    val passChars = length(text) >= 200
    val passWords = size(words) >= 40
    val passStop = stopwordRatio(text) >= 0.06
    val passTop = topFrac <= 0.12
    val firstFail = when(!passChars, "min_chars")
      .when(!passWords, "min_words")
      .when(!passStop, "stopword_ratio")
      .when(!passTop, "top_word_frac")
      .otherwise("none")
    Seq(passChars.as("pass_min_chars"), passWords.as("pass_min_words"),
      passStop.as("pass_stopword"), passTop.as("pass_top_word"),
      firstFail.as("first_fail"))
  }

  // --- Repetition quality filters (Gopher-style) -----------------------
  // Per-document repetition signals used to drop low-quality boilerplate
  // (duplicate-line fraction, duplicate-line CHARACTER fraction, most
  // frequent word bigram). All four are per-row column expressions over
  // the sorted line/bigram arrays — one O(len) pass per doc, no explode,
  // no shuffle — so at 100 TB they cost a map stage and nothing else.

  /** Lines of a document (split on newline, trailing \r trimmed). */
  def docLines(text: Column): Column =
    transform(split(text, "\n"), l => regexp_replace(l, "\r$", ""))

  private val NoPrev: Column = lit(null).cast("string")

  /** Count of distinct elements of a sorted array (adjacent-unequal;
    * null-safe compare so the initial state never aliases an element). */
  private def distinctCount(sorted: Column): Column =
    aggregate(sorted,
      struct(NoPrev.as("prev"), lit(0L).as("n")),
      (st, x) => struct(x.as("prev"),
        when(x <=> st.getField("prev"), st.getField("n"))
          .otherwise(st.getField("n") + 1L).as("n")),
      st => st.getField("n"))

  /** Characters contributed by occurrences 2..k of each repeated element
    * of a sorted array (the Gopher "characters in duplicate lines"
    * numerator). */
  private def dupChars(sorted: Column): Column =
    aggregate(sorted,
      struct(NoPrev.as("prev"), lit(0L).as("c")),
      (st, x) => struct(x.as("prev"),
        when(x <=> st.getField("prev"), st.getField("c") + length(x))
          .otherwise(st.getField("c")).as("c")),
      st => st.getField("c"))

  /** (gram, count) of the most frequent element of a sorted array; ties
    * resolve to the lexicographically smallest (first strict maximum in
    * ascending order). */
  private def topRun(sorted: Column): Column =
    aggregate(sorted,
      struct(NoPrev.as("prev"), lit(0L).as("run"),
        lit("").as("best"), lit(0L).as("bestn")),
      (st, x) => {
        val run = when(x <=> st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          when(run > st.getField("bestn"), x)
            .otherwise(st.getField("best")).as("best"),
          when(run > st.getField("bestn"), run)
            .otherwise(st.getField("bestn")).as("bestn"))
      },
      st => struct(st.getField("best").as("gram"),
        st.getField("bestn").as("n")))

  /** Word bigrams of the normalized text, in order (non-distinct). */
  def wordBigrams(text: Column): Column = {
    val words = split(Dedup.normalized(text), " ")
    transform(sequence(lit(1), greatest(size(words) - 1, lit(1))),
      i => concat_ws(" ", slice(words, i, lit(2))))
  }

  /** Gopher-style repetition profile: (n_lines, n_distinct_lines,
    * dup_line_char_frac, top_bigram, top_bigram_count). Input must be the
    * full document content (lines split on '\n'). */
  def repetitionProfile(content: Column): Seq[Column] = {
    val lines = array_sort(docLines(content))
    val totalChars = aggregate(lines, lit(0L), (acc, x) => acc + length(x))
    val bigrams = array_sort(wordBigrams(content))
    val top = topRun(bigrams)
    Seq(
      size(lines).cast("long").as("n_lines"),
      distinctCount(lines).as("n_distinct_lines"),
      (dupChars(lines).cast("double") /
        greatest(totalChars, lit(1L)).cast("double")).as("dup_line_char_frac"),
      top.getField("gram").as("top_bigram"),
      top.getField("n").as("top_bigram_count"))
  }
}
