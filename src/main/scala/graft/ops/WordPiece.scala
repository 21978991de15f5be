package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WORDPIECE tokenizer (the BERT family — Wu et al. 2016, arXiv:
  * 1609.08144 §4.1; Devlin et al. 2018): a two-flavor piece vocabulary
  * (word-INITIAL pieces vs '##'-style CONTINUATION pieces, modeled here
  * as an explicit `st` flag instead of the '##' prefix convention) and
  * GREEDY longest-match-first segmentation: at each position take the
  * longest vocabulary piece of the position's flavor, advance, repeat.
  * Completes the repo's tokenizer triad — BPE ([[BpeTrain]]) builds
  * words bottom-up by learned merges, unigram-LM ([[UnigramTok]])
  * segments top-down by Viterbi against scored pieces, WordPiece
  * segments top-down greedily against a flavored vocabulary.
  *
  * Deterministic cross-engine by construction: greedy needs no scores —
  * the only argmax is MAX(piece length) at a position, and two distinct
  * pieces of equal length matching the same (word, position, flavor)
  * would be the same string, so the winner is unique and both engines
  * replay segmentation bit-for-bit with no tiebreak convention at all.
  * Every (char, flavor) occurrence seeds the vocabulary's single-char
  * floor, so matching can never fail (no UNK) and a word of length L
  * finishes in <= L steps.
  *
  * Scale shape (the [[UnigramTok]] two-pass vocabulary trick): corpus
  * text is scanned once into the Zipf-bounded distinct-word table;
  * vocabulary selection and segmentation run on words only. Greedy
  * keeps ONE state per word (the unigram DP keeps one per position), so
  * each of the <= [[MaxWordLen]] rounds is a candidate-length explode
  * (<= [[MaxPiece]] rows per word), an equi-join against the broadcast
  * vocabulary on (piece, flavor), and a max-length hash aggregation —
  * map-side combined, window-free. Rounds are localCheckpoint'ed so
  * plan depth stays O(1) per round.
  */
object WordPiece {

  /** Longest piece considered (chars). */
  val MaxPiece = 4

  /** Words longer than this are excluded (and excluded from token
    * counts) — the documented domain cap bounding the unroll in both
    * engines. The gated corpora max out at 8. */
  val MaxWordLen = 16

  /** Multi-char pieces kept PER FLAVOR (top by count desc, piece asc). */
  val MultiPieces = 32

  /** The flavored piece vocabulary over the word table `w` (columns
    * (w, c)): every substring of length 1..[[MaxPiece]] weighted by
    * word count, flavor st = 1 iff the substring starts the word; all
    * single chars of each flavor plus the top [[MultiPieces]] multi-char
    * pieces per flavor. Returns (p, st, cnt). */
  def vocab(w: DataFrame): DataFrame = {
    val cand = w.select(col("c"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), s0 ->
           |  transform(sequence(1, least($MaxPiece, length(w) - s0 + 1)),
           |    pl -> named_struct(
           |      'p', substring(w, s0, pl),
           |      'st', CASE WHEN s0 = 1 THEN 1 ELSE 0 END))))"""
          .stripMargin)).as("x"))
      .select(col("x.p").as("p"), col("x.st").as("st"), col("c"))
      .groupBy(col("p"), col("st")).agg(sum(col("c")).as("cnt"))
    val singles = cand.filter(length(col("p")) === 1)
    val m1 = cand.filter(length(col("p")) > 1 && col("st") === 1)
      .orderBy(col("cnt").desc, col("p")).limit(MultiPieces)
    val m0 = cand.filter(length(col("p")) > 1 && col("st") === 0)
      .orderBy(col("cnt").desc, col("p")).limit(MultiPieces)
    singles.unionByName(m1).unionByName(m0)
  }

  /** Greedy longest-match segmentation of every word of length <=
    * [[MaxWordLen]]: (w, c, n_pieces). One state row per word; round i
    * advances every unfinished word past its longest matching piece. */
  def segments(w: DataFrame, pieces: DataFrame): DataFrame = {
    val eligible = w.filter(length(col("w")) <= MaxWordLen).localCheckpoint()
    val v = broadcast(pieces.select(col("p"), col("st")).localCheckpoint())
    var st = eligible.select(col("w"), lit(0).as("pos"), lit(0).as("np"))
      .localCheckpoint()
    val seen = scala.collection.mutable.ArrayBuffer[DataFrame]()
    (1 to MaxWordLen).foreach { _ =>
      val done = st.filter(col("pos") === length(col("w")))
      val adv = st.filter(col("pos") < length(col("w")))
        .withColumn("pl",
          explode(expr(s"sequence(1, least($MaxPiece, length(w) - pos))")))
        .withColumn("p", expr("substring(w, pos + 1, pl)"))
        .withColumn("st", when(col("pos") === 0, 1).otherwise(0))
        .join(v, Seq("p", "st"))
        .groupBy(col("w"), col("pos"), col("np"))
        .agg(max(col("pl")).as("adv"))
        .select(col("w"), (col("pos") + col("adv")).as("pos"),
          (col("np") + 1).as("np"))
      val nxt = done.unionByName(adv).localCheckpoint()
      seen += st
      st = nxt
    }
    val out = eligible.join(st, Seq("w"))
      .filter(col("pos") === length(col("w")))
      .select(col("w"), col("c"), col("np").as("n_pieces"))
      .localCheckpoint() // materialize before the rounds are released
    (seen :+ st).foreach(_.unpersist())
    eligible.unpersist()
    v.unpersist()
    out
  }

  // ---- DuckDB twin ([[UnigramTok.sqlCtes]] conventions) ----

  /** Shared CTE chain: word table `wwords`, flavored candidates `wcand`,
    * selected vocabulary `wsel`, greedy rounds `g1..gN`, segmentations
    * `wsegs`. */
  def sqlCtes: String = {
    val rounds = (1 to MaxWordLen).map { i =>
      val prev = s"g${i - 1}"
      s"""g$i AS MATERIALIZED (
         |  SELECT w, pos + adv AS pos, np + 1 AS np FROM (
         |    SELECT v.w, v.pos, v.np, MAX(length(s.p)) AS adv
         |    FROM $prev v
         |    JOIN wsel s
         |      ON s.p = substr(v.w, v.pos + 1, length(s.p))
         |     AND s.st = CASE WHEN v.pos = 0 THEN 1 ELSE 0 END
         |    WHERE v.pos < length(v.w)
         |    GROUP BY v.w, v.pos, v.np) x
         |  UNION ALL
         |  SELECT w, pos, np FROM $prev WHERE pos = length(w))"""
        .stripMargin
    }.mkString(",\n")
    s"""wwords AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(string_split(
       |          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
       |          AS w
       |        FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |wcand AS (
       |  SELECT substr(w, CAST(st0 AS INT), CAST(pl AS INT)) AS p,
       |    CASE WHEN st0 = 1 THEN 1 ELSE 0 END AS st,
       |    CAST(SUM(c) AS BIGINT) AS cnt
       |  FROM (SELECT w, c, st0,
       |          unnest(range(1, least($MaxPiece, length(w) - st0 + 1) + 1))
       |            AS pl
       |        FROM (SELECT w, c, unnest(range(1, length(w) + 1)) AS st0
       |              FROM wwords))
       |  GROUP BY 1, 2),
       |wm1 AS (SELECT p, st, cnt FROM wcand
       |        WHERE length(p) > 1 AND st = 1
       |        ORDER BY cnt DESC, p LIMIT $MultiPieces),
       |wm0 AS (SELECT p, st, cnt FROM wcand
       |        WHERE length(p) > 1 AND st = 0
       |        ORDER BY cnt DESC, p LIMIT $MultiPieces),
       |wsel AS MATERIALIZED (
       |  SELECT p, st, cnt FROM wcand WHERE length(p) = 1
       |  UNION ALL SELECT p, st, cnt FROM wm1
       |  UNION ALL SELECT p, st, cnt FROM wm0),
       |g0 AS (SELECT w, 0 AS pos, 0 AS np
       |       FROM wwords WHERE length(w) <= $MaxWordLen),
       |$rounds,
       |wsegs AS MATERIALIZED (
       |  SELECT u.w, u.c, g.np AS n_pieces
       |  FROM wwords u JOIN g$MaxWordLen g
       |    ON g.w = u.w AND g.pos = length(u.w))""".stripMargin
  }

  /** wordpiece_vocab twin. */
  def vocabSql: String =
    s"""WITH $sqlCtes
       |SELECT p AS piece, st AS is_start, cnt FROM wsel
       |ORDER BY piece, is_start""".stripMargin

  /** wordpiece_segments twin. */
  def segmentsSql: String =
    s"""WITH $sqlCtes
       |SELECT w, c AS word_count, CAST(n_pieces AS INT) AS n_pieces
       |FROM wsegs
       |ORDER BY w""".stripMargin

  /** ta_tokens_wordpiece twin. */
  def tokenCountsSql: String =
    s"""WITH $sqlCtes,
       |dw AS (
       |  SELECT doc_id, unnest(string_split(
       |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
       |  FROM documents)
       |SELECT doc_id, COUNT(*) AS n_words,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_tokens
       |FROM dw JOIN wsegs USING (w)
       |WHERE w <> ''
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
}
