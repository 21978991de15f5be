package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed BPE TRAINING — learning the merges table from the corpus
  * (the complement of [[BpeImpl]], which tokenizes with a committed
  * fixture): the classical algorithm (Sennrich et al. 2016,
  * arXiv:1508.07909) run as `rounds` Spark aggregations. Each round
  * counts adjacent token pairs over the distinct-word vocabulary
  * (weighted by word frequency), takes the argmax — ties resolved
  * (count desc, left asc, right asc) so the learned table is
  * deterministic — and applies the merge to the vocabulary encoding.
  *
  * The vocabulary is encoded in the double-space token form BpeSpec
  * already proved equivalent to the kernel's left-to-right
  * non-overlapping merge pass (' a  b ' -> ' ab ' consumes one delimiter
  * space per side), so both the application step here and the DuckDB
  * twin's replay use plain `replace`.
  *
  * Scale shape: pair counting shuffles (a, b) keys over the DISTINCT
  * vocabulary (the ta_unigram_logfreq two-pass trick — corpus text is
  * scanned once for word counts, never per round); the per-round argmax
  * is a TakeOrdered(1), a one-row driver collect; the merge application
  * is a map-stage string replace. Rounds are sequential by nature (each
  * merge conditions the next) — the distributed work is inside each
  * round, which is exactly how production BPE trainers parallelize.
  */
object BpeTrain {

  /** Distinct words + occurrence counts + char-level encoding. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(
        regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " "))
        .as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("c"))
      .withColumn("enc",
        concat(lit(" "), concat_ws("  ", split(col("w"), "")), lit(" ")))

  /** Learn `rounds` merges; returns (round, left, right, n_pairs) rows.
    * Stops early if no pair remains (tiny corpora). */
  def train(docs: DataFrame, textCol: String, rounds: Int): Seq[Row] = {
    var enc = vocab(docs, textCol).localCheckpoint()
    val out = Seq.newBuilder[Row]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val top = enc
        .withColumn("ts", split(trim(col("enc")), "  "))
        .filter(size(col("ts")) >= 2)
        .select(col("c"), explode(expr(
          "transform(sequence(1, size(ts) - 1), " +
            "i -> struct(element_at(ts, i) as a, element_at(ts, i + 1) as b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Row(r, a, b, n)
        enc = enc.withColumn("enc",
          expr(s"replace(enc, ' $a  $b ', ' $a$b ')"))
        r += 1
      }
    }
    out.result()
  }

  /** The shared unrolled CTE chain: round r's pair counts from the
    * (r-1)-merged vocabulary, one-row argmax `m$r`, then the merge
    * applied by the same double-space replace — the lloydRoundSql
    * pattern for tokenizer training. Exposes `w$rounds` (the fully
    * merged vocabulary) and `m1..m$rounds` (the learned merges). */
  private def trainCtes(rounds: Int): String = {
    val w0 =
      """w0 AS MATERIALIZED (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c,
        |    ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS enc
        |  FROM (SELECT unnest(string_split(
        |          regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
        |          AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY w)""".stripMargin
    val perRound = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT ts[CAST(i AS INT)] AS a, ts[CAST(i AS INT) + 1] AS b,
         |    SUM(c) AS n
         |  FROM (SELECT c, ts, unnest(range(1, len(ts))) AS i
         |        FROM (SELECT c, string_split(trim(enc), '  ') AS ts
         |              FROM w${r - 1}) q$r)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT a, b, CAST(n AS BIGINT) AS n FROM p$r
         |        ORDER BY n DESC, a, b LIMIT 1),
         |w$r AS MATERIALIZED (
         |  SELECT w, c,
         |    replace(enc, ' ' || m.a || '  ' || m.b || ' ',
         |                 ' ' || m.a || m.b || ' ') AS enc
         |  FROM w${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"$w0,\n$perRound"
  }

  /** bpe_train twin: the learned merges, one row per round. */
  def trainSql(rounds: Int): String = {
    val rows = (1 to rounds)
      .map(r => s"SELECT $r AS round, a AS left, b AS right, n AS n_pairs FROM m$r")
      .mkString("\nUNION ALL ")
    s"""WITH ${trainCtes(rounds)}
       |$rows
       |ORDER BY round""".stripMargin
  }

  /** bpe_train_apply twin: per-doc token counts under the learned
    * merges — the fully merged vocabulary `w$rounds` joined back to the
    * corpus word multiset (the two-pass vocabulary trick). */
  def applySql(rounds: Int): String =
    s"""WITH ${trainCtes(rounds)},
       |tok AS (
       |  SELECT w, CAST(len(string_split(trim(enc), '  ')) AS INT) AS nt
       |  FROM w$rounds),
       |dw AS (
       |  SELECT doc_id, unnest(string_split(
       |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
       |  FROM documents)
       |SELECT doc_id, CAST(SUM(nt) AS BIGINT) AS n_tokens_learned,
       |  COUNT(*) AS n_words
       |FROM dw JOIN tok USING (w)
       |WHERE w <> ''
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Per-word token counts under `merges` (from [[train]]) — the learned
    * tokenizer applied to the vocabulary, Spark side. */
  def tokenizedVocab(docs: DataFrame, textCol: String,
      merges: Seq[Row]): DataFrame =
    merges.foldLeft(vocab(docs, textCol)) { (df, m) =>
      val (a, b) = (m.getString(1), m.getString(2))
      df.withColumn("enc", expr(s"replace(enc, ' $a  $b ', ' $a$b ')"))
    }.withColumn("nt", size(split(trim(col("enc")), "  ")))
      .select(col("w"), col("nt"))
}
