package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed BPE TRAINING — learning the merges table from the corpus
  * (the complement of [[BpeImpl]], which tokenizes with a committed
  * fixture): the classical algorithm (Sennrich et al. 2016,
  * arXiv:1508.07909) run as `rounds` Spark aggregations. Each round
  * takes the argmax over a MAINTAINED pair-count table — ties resolved
  * (count desc, left asc, right asc) so the learned table is
  * deterministic — and applies the merge to the vocabulary encoding.
  *
  * The vocabulary is encoded in the double-space token form BpeSpec
  * already proved equivalent to the kernel's left-to-right
  * non-overlapping merge pass (' a  b ' -> ' ab ' consumes one delimiter
  * space per side), so both the application step here and the DuckDB
  * twin's replay use plain `replace`. All merge application goes through
  * the Column API (`functions.replace` with `lit` patterns) — learned
  * tokens never pass through a SQL parser, so corpora containing quotes,
  * backslashes, or any other metacharacter train safely (BpeTrainSpec
  * fuzzes exactly that against an in-memory reference trainer).
  *
  * Scale shape, per round:
  *  - argmax = TakeOrdered(1) over the materialized pair-count table
  *    (a one-row driver collect);
  *  - INCREMENTAL pair-delta counting, the production-trainer
  *    optimization: only vocabulary words whose encoding contains the
  *    merged pair change between rounds, so the delta pass explodes
  *    pairs for that filtered subset only (old encoding weighted -c,
  *    merged encoding +c) and folds it into the count table — the full
  *    vocabulary is pair-exploded exactly once, at round 0;
  *  - the count table is localCheckpoint'ed each round (it IS the
  *    incremental state) and the vocabulary encoding every
  *    `checkpointEvery` rounds, so plan depth is O(checkpointEvery),
  *    not O(rounds) — the Components.propagate cadence, which is what
  *    lets the loop run to production vocab sizes without a
  *    driver-side analysis blowup. Superseded checkpoints are
  *    unpersisted so executor storage stays O(vocab), not O(rounds).
  *
  * Rounds are sequential by nature (each merge conditions the next) —
  * the distributed work is inside each round, which is exactly how
  * production BPE trainers parallelize.
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

  /** Adjacent-pair explode of `enc`, each pair weighted `sign * c` —
    * the unit both the initial count and the per-round delta share. */
  private def pairs(df: DataFrame, sign: Int): DataFrame =
    df.withColumn("ts", split(trim(col("enc")), "  "))
      .filter(size(col("ts")) >= 2)
      .select((col("c") * sign).cast("long").as("cc"), explode(expr(
        "transform(sequence(1, size(ts) - 1), " +
          "i -> struct(element_at(ts, i) as a, element_at(ts, i + 1) as b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("cc"))

  /** Learn `rounds` merges; returns (round, left, right, n_pairs) rows.
    * Stops early if no pair remains (tiny corpora).
    *
    * `initial` RESUMES training from an already-learned prefix (e.g. a
    * [[readMerges]]-style store): the prefix is replayed onto the
    * vocabulary encoding (map-stage replaces under the checkpoint
    * cadence — no pair counting), the count table is built once from
    * the resumed state, and learning continues at round
    * `initial.size + 1`. Because every step is deterministic, resumed
    * training is byte-identical to training the full depth in one run —
    * the bpe_train_resume gate proves it cross-engine. */
  def train(docs: DataFrame, textCol: String, rounds: Int,
      checkpointEvery: Int = 8, initial: Seq[Row] = Nil): Seq[Row] = {
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery")
    require(initial.size <= rounds,
      s"initial ${initial.size} merges exceed rounds=$rounds")
    var enc = vocab(docs, textCol).localCheckpoint()
    var encCk = enc          // last checkpointed ancestor (for unpersist)
    var encDepth = 0         // replaces chained since encCk
    initial.foreach { m =>
      val (a, b) = (m.getString(1), m.getString(2))
      enc = enc.withColumn("enc",
        replace(col("enc"), lit(s" $a  $b "), lit(s" $a$b ")))
      encDepth += 1
      if (encDepth >= checkpointEvery) {
        val ck = enc.localCheckpoint()
        encCk.unpersist(); encCk = ck; enc = ck; encDepth = 0
      }
    }
    var counts = pairs(enc, 1)
      .groupBy(col("a"), col("b")).agg(sum(col("cc")).as("n"))
      .localCheckpoint()
    val out = Seq.newBuilder[Row]
    out ++= initial
    var r = initial.size + 1
    var done = false
    while (r <= rounds && !done) {
      val top = counts
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Row(r, a, b, n)
        val pat = lit(s" $a  $b ")
        val rep = lit(s" $a$b ")
        // Delta: only words containing the merged pair change. Recount
        // their pairs before (-c) and after (+c) the merge; everything
        // else in the count table carries over untouched.
        val affected = enc.filter(col("enc").contains(pat))
        val delta = pairs(affected, -1).union(
          pairs(affected.withColumn("enc",
            replace(col("enc"), pat, rep)), 1))
        val next = counts.select(col("a"), col("b"), col("n").as("cc"))
          .union(delta)
          .groupBy(col("a"), col("b")).agg(sum(col("cc")).as("n"))
          .filter(col("n") > 0)
          .localCheckpoint()          // eager: materialized before the
        counts.unpersist()            // old state is released
        counts = next
        enc = enc.withColumn("enc", replace(col("enc"), pat, rep))
        encDepth += 1
        if (encDepth >= checkpointEvery) {
          val ck = enc.localCheckpoint()
          encCk.unpersist()
          encCk = ck
          enc = ck
          encDepth = 0
        }
        r += 1
      }
    }
    counts.unpersist()
    encCk.unpersist()
    out.result()
  }

  /** The shared unrolled CTE chain: round r's pair counts from the
    * (r-1)-merged vocabulary, one-row argmax `m$r`, then the merge
    * applied by the same double-space replace — the lloydRoundSql
    * pattern for tokenizer training. Exposes `w$rounds` (the fully
    * merged vocabulary) and `m1..m$rounds` (the learned merges). The
    * merge step LEFT JOINs the one-row argmax so a dried-up round
    * (empty m$r) carries the vocabulary through unchanged, matching
    * the Spark side's early stop instead of collapsing to zero rows. */
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
         |    COALESCE(replace(enc, ' ' || m.a || '  ' || m.b || ' ',
         |                 ' ' || m.a || m.b || ' '), enc) AS enc
         |  FROM w${r - 1} LEFT JOIN m$r m ON TRUE)""".stripMargin
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

  /** Persist a learned merges table at rest (rank-ordered parquet) — the
    * tokenizer artifact a training job ships: train once, store, load
    * anywhere. One tiny file; the table is vocab-sized by construction. */
  def writeMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Row], path: String): Unit = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("round", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("n_pairs", LongType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(merges: _*), schema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merges table from rest, rank order restored. Driver-side
    * collect is bounded by the vocabulary size — exactly how a tokenizer
    * loads its vocab file. */
  def readMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy(col("round"))
      .select(col("left"), col("right"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))

  /** Per-word token counts under `merges` (from [[train]]) — the learned
    * tokenizer applied to the vocabulary, Spark side. Column-API
    * replaces (no SQL parse of learned tokens), checkpointed every 8
    * folds so the fold survives production-depth merge tables. */
  def tokenizedVocab(docs: DataFrame, textCol: String,
      merges: Seq[Row]): DataFrame = {
    var df = vocab(docs, textCol)
    merges.zipWithIndex.foreach { case (m, i) =>
      val (a, b) = (m.getString(1), m.getString(2))
      df = df.withColumn("enc",
        replace(col("enc"), lit(s" $a  $b "), lit(s" $a$b ")))
      if ((i + 1) % 8 == 0 && i + 1 < merges.length)
        df = df.localCheckpoint()
    }
    df.withColumn("nt", size(split(trim(col("enc")), "  ")))
      .select(col("w"), col("nt"))
  }
}
