package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed QUALITY-CLASSIFIER training — the "distill an expensive
  * quality signal into a cheap model" step every production corpus
  * pipeline runs (CCNet / GPT-3 WebText / LLaMA train fastText-grade
  * classifiers on a labeled slice, then filter the full corpus with the
  * cheap model). Here the teacher signal is the already-gated
  * [[TextAnalysis.qualityScore]] threshold and two students are trained
  * ON-CLUSTER with exact cross-engine arithmetic:
  *
  *  - a depth-[[TreeDepth]] DECISION TREE (CART with the
  *    misclassification-error split criterion — Breiman et al. 1984,
  *    ch. 4; error instead of Gini because the error of a candidate
  *    split is a plain integer, so the per-node argmin is a total order
  *    both engines replay bit-for-bit, no rational/float impurity);
  *  - a BERNOULLI NAIVE BAYES model whose log-probability weights use
  *    the repo's floor(log2) = length(bin(n)) - 1 integer surrogate (the
  *    ta_unigram_logfreq convention) so scoring is exact integer sums.
  *
  * Features are binary and deliberately cheap: presence of the corpus's
  * top-[[NumWords]] words (by document frequency — count desc, word asc,
  * a deterministic total order) plus a one-hot [[NumBuckets]]-way length
  * bucket. The tree learns the length+stopword structure of the quality
  * score (~91-95 % train accuracy vs a ~57 % majority baseline on the
  * gated corpora); NB learns the lexical component only.
  *
  * Scale shape: featurization is one projection + one bounded-vocabulary
  * aggregation (the vocabulary collect is NumWords rows — the centroid
  * convention). Tree training runs [[TreeDepth]] sequential levels; each
  * level is two aggregations over (doc x feature) rows keyed by
  * (node, fidx) — at most 2^level x (NumWords+NumBuckets) groups — and
  * collects one argmin row per impure node (<= 2^level rows). NB training
  * is ONE grouped aggregation. No driver collect is ever
  * corpus-proportional; assignment updates are broadcast joins against
  * the <= 2^level split table.
  */
object Classifier {

  /** Word features: the top-NumWords corpus words by document frequency. */
  val NumWords = 24

  /** One-hot length buckets: fidx NumWords+1+min(len/100, NumBuckets-1). */
  val NumBuckets = 6

  val NumFeatures: Int = NumWords + NumBuckets

  val TreeDepth = 4

  /** Teacher label: qualityScore(text) >= this (the curate_sample gate). */
  val QualityThreshold = 0.8

  /** Deterministic feature vocabulary: (word, fidx 1..numWords) by
    * document frequency desc, word asc. Driver collect bounded by
    * numWords. The width is a parameter (default [[NumWords]]) so the
    * headroom spec can train wider without touching the gated
    * geometry. */
  def vocabulary(docs: DataFrame,
      numWords: Int = NumWords): Seq[(String, Int)] =
    docs.select(col("doc_id"),
        explode(array_distinct(split(Dedup.normalized(col("text")), " ")))
          .as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(numWords).collect()
      .zipWithIndex.map { case (r, i) => (r.getString(0), i + 1) }

  /** Display name of a feature index (word, or len_bucket_k). */
  def featureName(vocab: Seq[(String, Int)], fidx: Int): String =
    if (fidx <= NumWords) vocab.find(_._2 == fidx).map(_._1)
      .getOrElse(s"word_$fidx")
    else s"len_bucket_${fidx - NumWords - 1}"

  /** Sparse binary features (doc_id, fidx): word presence + the one
    * length-bucket hot. `numWords` fixes the bucket fidx base
    * (numWords + 1 + k) and must match the width `vocab` was built
    * with — it stays a parameter (not vocab.size) so a degenerate
    * corpus with fewer distinct words keeps the same feature-index
    * geometry the twins unroll. */
  def features(docs: DataFrame, vocab: Seq[(String, Int)],
      numWords: Int = NumWords): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(vocab.size <= numWords,
      s"vocabulary of ${vocab.size} words exceeds the declared width $numWords")
    val vdf = broadcast(vocab.toDF("w", "fidx"))
    val words = docs.select(col("doc_id"),
        explode(array_distinct(split(Dedup.normalized(col("text")), " ")))
          .as("w"))
      .join(vdf, "w")
      .select(col("doc_id"), col("fidx"))
    val buckets = docs.select(col("doc_id"),
      (lit(numWords + 1) +
        least(floor(length(col("text")) / 100).cast("int"),
          lit(NumBuckets - 1))).cast("int").as("fidx"))
    words.unionByName(buckets)
  }

  /** Teacher labels (doc_id, y in {0, 1}). */
  def labels(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(TextAnalysis.qualityScore(col("text")) >= QualityThreshold, 1)
        .otherwise(0).as("y"))

  /** One learned split: node's stats and the chosen feature. */
  final case class Split(node: Int, depth: Int, fidx: Int,
    n: Long, p: Long, nLeft: Long, pLeft: Long, err: Long)

  /** Train the depth-[[TreeDepth]] tree; returns the split table (plain
    * data — cacheable across the queries that share it). Child node ids
    * are node*2+1 (feature present) / node*2+2 (absent); pure nodes and
    * nodes with no valid split (every feature all-left or all-right)
    * stay put and become leaves at their current id. Every checkpoint
    * taken during training is unpersisted before returning. */
  def trainTree(docs: DataFrame, depth: Int = TreeDepth,
      numWords: Int = NumWords): Seq[Split] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = vocabulary(docs, numWords)
    val feats = features(docs, vocab, numWords).localCheckpoint()
    val lab = labels(docs).localCheckpoint()
    var assign = lab.select(col("doc_id"), lit(0).as("node"))
    var assignCk: DataFrame = null       // previous checkpoint to release
    val splits = Seq.newBuilder[Split]
    (0 until depth).foreach { level =>
      val withY = assign.join(lab, "doc_id")
      val tot = withY.groupBy(col("node"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
      val cand = withY.join(feats, "doc_id")
        .groupBy(col("node"), col("fidx"))
        .agg(count(lit(1)).as("nL"), sum(col("y")).as("pL"))
      val scored = cand.join(tot, "node")
        .filter(col("p") > 0 && col("p") < col("n") &&
          col("nL") > 0 && col("nL") < col("n"))
        .withColumn("err",
          least(col("pL"), col("nL") - col("pL")) +
            least(col("p") - col("pL"),
              (col("n") - col("nL")) - (col("p") - col("pL"))))
      // one row per impure node — bounded by 2^level. min_by over the
      // (err, fidx) total order = the split argmin as a plain hash
      // aggregation (partial + final), no window, no global exchange —
      // at level 0 `node` is a constant and a window here would
      // degenerate to a single-partition sort.
      val chosen = scored
        .groupBy(col("node"))
        .agg(min_by(
          struct(col("fidx"), col("n"), col("p"), col("nL"), col("pL"),
            col("err")),
          struct(col("err"), col("fidx"))).as("s"))
        .select(col("node"), col("s.fidx"), col("s.n"), col("s.p"),
          col("s.nL"), col("s.pL"), col("s.err"))
        .collect()
      if (chosen.nonEmpty) {
        chosen.foreach { r =>
          splits += Split(r.getInt(0), level, r.getInt(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
        }
        val spDf = broadcast(
          chosen.map(r => (r.getInt(0), r.getInt(1))).toSeq
            .toDF("node", "sfidx"))
        val hit = feats.select(col("doc_id"), col("fidx").as("sfidx"))
          .withColumn("present", lit(1))
        assign = assign
          .join(spDf, Seq("node"), "left")
          .join(hit, Seq("doc_id", "sfidx"), "left")
          .select(col("doc_id"),
            when(col("sfidx").isNull, col("node"))
              .when(col("present").isNotNull, col("node") * 2 + 1)
              .otherwise(col("node") * 2 + 2).as("node"))
          .localCheckpoint()           // eager — safe to drop the prior
        if (assignCk != null) assignCk.unpersist()
        assignCk = assign
      }
    }
    if (assignCk != null) assignCk.unpersist()
    feats.unpersist()
    lab.unpersist()
    splits.result()
  }

  /** Route every doc through a trained split table: (doc_id, node, y).
    * Per level one broadcast join against the <=2^level split rows plus
    * a feature-presence probe — a map-side-joinable scan at any corpus
    * size, the deploy shape of the filter.
    *
    * `vocab` must be the TRAINING vocabulary (the one the split table's
    * fidx values were learned against — same contract as [[predictCol]]):
    * re-deriving a vocabulary from the corpus being scored would silently
    * bind the learned fidx values to different words on any corpus other
    * than the training one. */
  def applyTree(docs: DataFrame, splits: Seq[Split],
      vocab: Seq[(String, Int)], depth: Int = TreeDepth,
      numWords: Int = NumWords): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = features(docs, vocab, numWords)
    val lab = labels(docs)
    var assign = lab.select(col("doc_id"), lit(0).as("node"))
    (0 until depth).foreach { level =>
      val lv = splits.filter(_.depth == level)
      if (lv.nonEmpty) {
        val spDf = broadcast(
          lv.map(s => (s.node, s.fidx)).toDF("node", "sfidx"))
        val hit = feats.select(col("doc_id"), col("fidx").as("sfidx"))
          .withColumn("present", lit(1))
        assign = assign
          .join(spDf, Seq("node"), "left")
          .join(hit, Seq("doc_id", "sfidx"), "left")
          .select(col("doc_id"),
            when(col("sfidx").isNull, col("node"))
              .when(col("present").isNotNull, col("node") * 2 + 1)
              .otherwise(col("node") * 2 + 2).as("node"))
      }
    }
    assign.join(lab, "doc_id")
  }

  /** qc_tree_train face: one row per learned split, feature named
    * against the TRAINING vocabulary. */
  def treeTrainDf(spark: SparkSession, vocab: Seq[(String, Int)],
      splits: Seq[Split]): DataFrame = {
    import spark.implicits._
    splits
      .map(s => (s.node, s.depth, s.fidx, featureName(vocab, s.fidx),
        s.n, s.p, s.nLeft, s.pLeft, s.err))
      .toDF("node", "depth", "fidx", "feature", "n", "p", "n_left",
        "p_left", "err")
      .orderBy(col("node"))
  }

  /** qc_tree_score face: every doc routed to its leaf, predicted by leaf
    * majority (ties predict 1), compared to the teacher label. `vocab`
    * is the training vocabulary (see [[applyTree]]). */
  def treeScore(docs: DataFrame, splits: Seq[Split],
      vocab: Seq[(String, Int)], depth: Int = TreeDepth,
      numWords: Int = NumWords): DataFrame = {
    val assign = applyTree(docs, splits, vocab, depth, numWords)
    val leaves = assign.groupBy(col("node"))
      .agg(count(lit(1)).as("ln"), sum(col("y")).as("lp"))
      .withColumn("pred",
        when(col("lp") * 2 >= col("ln"), 1).otherwise(0))
      .select(col("node"), col("pred"))
    assign.join(broadcast(leaves), "node")
      .select(col("doc_id"), col("node").as("leaf"), col("pred"),
        col("y"),
        when(col("pred") === col("y"), 1).otherwise(0).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** Leaf-majority predictions (node -> pred, ties predict 1) — bounded
    * collect (<= 2^TreeDepth rows). `vocab` is the training vocabulary
    * (see [[applyTree]]). */
  def leafPredictions(docs: DataFrame, splits: Seq[Split],
      vocab: Seq[(String, Int)]): Map[Int, Int] =
    applyTree(docs, splits, vocab).groupBy(col("node"))
      .agg(count(lit(1)).as("ln"), sum(col("y")).as("lp"))
      .select(col("node"),
        when(col("lp") * 2 >= col("ln"), 1).otherwise(0).as("pred"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap

  /** The trained tree COMPILED to one scalar Column over the text — the
    * deploy face: a nested CASE of word-presence / length-bucket tests.
    * No joins, no aggregation, fully codegen'd — which is what makes the
    * distilled filter a map-only scan over 100 TB and directly usable
    * inside a Structured Streaming ingest (the stream_qc_filter_exec
    * gate runs exactly that). Must agree row-for-row with the relational
    * [[applyTree]] + leaf-majority path (ClassifierSpec proves it; the
    * shared DuckDB twin gates it). */
  def predictCol(text: Column, vocab: Seq[(String, Int)],
      splits: Seq[Split], leafPred: Map[Int, Int]): Column = {
    val words = array_distinct(split(Dedup.normalized(text), " "))
    val bucket = (lit(NumWords + 1) +
      least(floor(length(text) / 100).cast("int"),
        lit(NumBuckets - 1))).cast("int")
    val wordOf = vocab.map { case (w, f) => f -> w }.toMap
    val splitMap = splits.map(s => s.node -> s.fidx).toMap
    def present(f: Int): Column =
      if (f <= NumWords) array_contains(words, lit(wordOf(f)))
      else bucket === lit(f)
    def node(n: Int): Column = splitMap.get(n) match {
      case Some(f) => when(present(f), node(2 * n + 1))
        .otherwise(node(2 * n + 2))
      // every reachable leaf has training docs (both split children are
      // non-empty by the nL bounds); the default covers unreachable ids
      case None => lit(leafPred.getOrElse(n, 1))
    }
    node(0)
  }

  /** qc_tree_reliability face: per-leaf calibration — how pure each
    * leaf's prediction actually is (the table a curation team reads to
    * decide which leaves to trust or prune). */
  def treeReliability(docs: DataFrame, splits: Seq[Split],
      vocab: Seq[(String, Int)]): DataFrame =
    treeScore(docs, splits, vocab)
      .groupBy(col("leaf"), col("pred"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("correct")).as("n_correct"))
      .orderBy(col("leaf"))

  /** qc_tree_eval face: train accuracy vs the majority baseline — all
    * exact integer counts. */
  def treeEval(docs: DataFrame, splits: Seq[Split],
      vocab: Seq[(String, Int)], depth: Int = TreeDepth,
      numWords: Int = NumWords): DataFrame =
    treeScore(docs, splits, vocab, depth, numWords).agg(
      count(lit(1)).as("n_docs"),
      sum(col("y")).as("n_pos"),
      sum(col("correct")).as("n_correct"),
      greatest(sum(col("y")),
        count(lit(1)) - sum(col("y"))).as("n_majority"))

  // --- Bernoulli Naive Bayes -------------------------------------------

  /** floor(log2 n) + 1 for n >= 1 — the exact-integer log surrogate. */
  private def blen(c: Column): Column = length(bin(c)).cast("long")

  /** Per-feature NB model rows over the FULL feature range 1..NumFeatures
    * (features absent from the corpus get Laplace-only weights):
    * (fidx, feature, c_pos, c_neg, w_present, w_absent) with
    * w_present = [blen(c1+1) - blen(n1+2)] - [blen(c0+1) - blen(n0+2)]
    * and w_absent the complement counts — integer log-likelihood-ratio
    * contributions of a present / absent feature. */
  def nbModel(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = vocabulary(docs)
    val feats = features(docs, vocab)
    val lab = labels(docs)
    val Row(n1: Long, n0: Long) = lab
      .agg(sum(col("y")).cast("long"),
        (count(lit(1)) - sum(col("y"))).cast("long"))
      .collect()(0)
    val counts = feats.join(lab, "doc_id")
      .groupBy(col("fidx"))
      .agg(sum(col("y")).as("c_pos"),
        (count(lit(1)) - sum(col("y"))).as("c_neg"))
    val names = (1 to NumFeatures)
      .map(f => (f, featureName(vocab, f))).toDF("fidx", "feature")
    names.join(counts, Seq("fidx"), "left")
      .select(col("fidx"), col("feature"),
        coalesce(col("c_pos"), lit(0L)).as("c_pos"),
        coalesce(col("c_neg"), lit(0L)).as("c_neg"))
      .withColumn("w_present",
        (blen(col("c_pos") + 1) - blen(lit(n1 + 2))) -
          (blen(col("c_neg") + 1) - blen(lit(n0 + 2))))
      .withColumn("w_absent",
        (blen(lit(n1 + 1) - col("c_pos")) - blen(lit(n1 + 2))) -
          (blen(lit(n0 + 1) - col("c_neg")) - blen(lit(n0 + 2))))
      .orderBy(col("fidx"))
  }

  /** qc_nb_score face: integer NB log-odds score per doc
    * score = prior + sum_absent + sum_{f present} (w_present - w_absent),
    * pred = score > 0. The model collect is NumFeatures rows. */
  def nbScore(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val vocab = vocabulary(docs)
    val feats = features(docs, vocab)
    val lab = labels(docs)
    val Row(n1: Long, n0: Long) = lab
      .agg(sum(col("y")).cast("long"),
        (count(lit(1)) - sum(col("y"))).cast("long"))
      .collect()(0)
    val model = nbModel(docs)
      .select(col("fidx"), col("w_present"), col("w_absent"))
      .collect()
    val prior = (java.lang.Long.toBinaryString(math.max(n1, 1L)).length -
      java.lang.Long.toBinaryString(math.max(n0, 1L)).length).toLong
    val sumAbsent = model.map(_.getLong(2)).sum
    val deltas = model.map(r => (r.getInt(0), r.getLong(1) - r.getLong(2)))
    import spark.implicits._
    val deltaDf = broadcast(deltas.toSeq.toDF("fidx", "delta"))
    val perDoc = feats.join(deltaDf, "fidx")
      .groupBy(col("doc_id")).agg(sum(col("delta")).as("dsum"))
    lab.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("dsum"), lit(0L)) + lit(prior + sumAbsent))
          .as("score"),
        col("y"))
      .withColumn("pred", when(col("score") > 0, 1).otherwise(0))
      .withColumn("correct",
        when(col("pred") === col("y"), 1).otherwise(0))
      .select(col("doc_id"), col("score"), col("pred"), col("y"),
        col("correct"))
      .orderBy(col("doc_id"))
  }

  // --- DuckDB twins -----------------------------------------------------

  /** Shared featurization/label CTEs. `qualitySql` is the caller's exact
    * quality-score SQL over a `text` column (single source with the
    * curate twins). */
  def featureCtesSql(qualitySql: String): String =
    s"""dwords AS (
       |  SELECT DISTINCT doc_id, w
       |  FROM (SELECT doc_id, unnest(string_split(
       |          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
       |          AS w
       |        FROM documents)
       |  WHERE w <> ''),
       |cvocab AS MATERIALIZED (
       |  SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w) AS INT)
       |    AS fidx
       |  FROM (SELECT w, COUNT(*) AS c FROM dwords GROUP BY w)
       |  ORDER BY c DESC, w LIMIT $NumWords),
       |feats AS MATERIALIZED (
       |  SELECT doc_id, fidx FROM dwords JOIN cvocab USING (w)
       |  UNION ALL
       |  SELECT doc_id, CAST($NumWords + 1 +
       |      least(CAST(floor(length(text) / 100) AS INT),
       |        ${NumBuckets - 1}) AS INT) AS fidx
       |  FROM documents),
       |lab AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN $qualitySql >= $QualityThreshold THEN 1 ELSE 0 END
       |      AS y
       |  FROM documents)""".stripMargin

  /** The unrolled tree-training CTE chain: per level, node totals,
    * per-(node, feature) candidate counts, the error-argmin split, and
    * the next assignment (the lloydRoundSql convention). Exposes
    * `a$TreeDepth` (final leaf assignment joined with y) and
    * `sp0..sp${TreeDepth-1}`. */
  def treeCtesSql(qualitySql: String): String = {
    val levels = (0 until TreeDepth).map { l =>
      s"""tot$l AS (
         |  SELECT node, COUNT(*) AS n, SUM(y) AS p
         |  FROM a$l JOIN lab USING (doc_id) GROUP BY node),
         |cand$l AS (
         |  SELECT a.node, f.fidx, COUNT(*) AS nL, SUM(b.y) AS pL
         |  FROM a$l a JOIN feats f USING (doc_id) JOIN lab b USING (doc_id)
         |  GROUP BY a.node, f.fidx),
         |sp$l AS MATERIALIZED (
         |  SELECT node, fidx, n, p, nL, pL, err FROM (
         |    SELECT c.node, c.fidx, t.n, t.p, c.nL, c.pL,
         |      least(c.pL, c.nL - c.pL)
         |        + least(t.p - c.pL, (t.n - c.nL) - (t.p - c.pL)) AS err,
         |      row_number() OVER (PARTITION BY c.node ORDER BY
         |        least(c.pL, c.nL - c.pL)
         |          + least(t.p - c.pL, (t.n - c.nL) - (t.p - c.pL)),
         |        c.fidx) AS rn
         |    FROM cand$l c JOIN tot$l t USING (node)
         |    WHERE t.p > 0 AND t.p < t.n AND c.nL > 0 AND c.nL < t.n)
         |  WHERE rn = 1),
         |a${l + 1} AS MATERIALIZED (
         |  SELECT a.doc_id,
         |    CASE WHEN s.fidx IS NULL THEN a.node
         |         WHEN h.fidx IS NOT NULL THEN a.node * 2 + 1
         |         ELSE a.node * 2 + 2 END AS node
         |  FROM a$l a
         |  LEFT JOIN sp$l s USING (node)
         |  LEFT JOIN feats h ON h.doc_id = a.doc_id AND h.fidx = s.fidx)"""
        .stripMargin
    }.mkString(",\n")
    s"""${featureCtesSql(qualitySql)},
       |a0 AS (SELECT doc_id, 0 AS node FROM lab),
       |$levels""".stripMargin
  }

  /** qc_tree_train twin. */
  def treeTrainSql(qualitySql: String): String = {
    val rows = (0 until TreeDepth).map { l =>
      s"""SELECT CAST(node AS INT) AS node, $l AS depth, fidx,
         |  CASE WHEN fidx <= $NumWords
         |       THEN COALESCE(
         |         (SELECT w FROM cvocab v WHERE v.fidx = sp$l.fidx),
         |         'word_' || CAST(fidx AS VARCHAR))
         |       ELSE 'len_bucket_' || CAST(fidx - $NumWords - 1 AS VARCHAR)
         |       END AS feature,
         |  CAST(n AS BIGINT) AS n, CAST(p AS BIGINT) AS p,
         |  CAST(nL AS BIGINT) AS n_left, CAST(pL AS BIGINT) AS p_left,
         |  CAST(err AS BIGINT) AS err
         |FROM sp$l""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${treeCtesSql(qualitySql)}
       |$rows
       |ORDER BY node""".stripMargin
  }

  /** qc_tree_deploy twin: the scalar-compiled prediction must equal the
    * relational apply, so the twin IS the relational chain projected to
    * (doc_id, pred). */
  def treeDeploySql(qualitySql: String): String =
    s"""WITH ${treeCtesSql(qualitySql)},
       |leaves AS (
       |  SELECT node,
       |    CASE WHEN 2 * SUM(y) >= COUNT(*) THEN 1 ELSE 0 END AS pred
       |  FROM a$TreeDepth JOIN lab USING (doc_id) GROUP BY node)
       |SELECT a.doc_id, l.pred
       |FROM a$TreeDepth a JOIN leaves l USING (node)
       |ORDER BY a.doc_id""".stripMargin

  /** stream_qc_filter_exec twin: the doc ids the deployed filter keeps. */
  def treeStreamFilterSql(qualitySql: String): String =
    s"""WITH ${treeCtesSql(qualitySql)},
       |leaves AS (
       |  SELECT node,
       |    CASE WHEN 2 * SUM(y) >= COUNT(*) THEN 1 ELSE 0 END AS pred
       |  FROM a$TreeDepth JOIN lab USING (doc_id) GROUP BY node)
       |SELECT a.doc_id
       |FROM a$TreeDepth a JOIN leaves l USING (node)
       |WHERE l.pred = 1
       |ORDER BY a.doc_id""".stripMargin

  /** qc_tree_score twin. */
  def treeScoreSql(qualitySql: String): String =
    s"""WITH ${treeCtesSql(qualitySql)},
       |leaves AS (
       |  SELECT node,
       |    CASE WHEN 2 * SUM(y) >= COUNT(*) THEN 1 ELSE 0 END AS pred
       |  FROM a$TreeDepth JOIN lab USING (doc_id) GROUP BY node)
       |SELECT a.doc_id, CAST(a.node AS INT) AS leaf, l.pred, b.y,
       |  CASE WHEN l.pred = b.y THEN 1 ELSE 0 END AS correct
       |FROM a$TreeDepth a JOIN leaves l USING (node) JOIN lab b
       |  USING (doc_id)
       |ORDER BY a.doc_id""".stripMargin

  /** qc_tree_reliability twin: per-leaf calibration counts. */
  def treeReliabilitySql(qualitySql: String): String =
    s"""WITH ${treeCtesSql(qualitySql)},
       |leaves AS (
       |  SELECT node,
       |    CASE WHEN 2 * SUM(y) >= COUNT(*) THEN 1 ELSE 0 END AS pred
       |  FROM a$TreeDepth JOIN lab USING (doc_id) GROUP BY node)
       |SELECT CAST(a.node AS INT) AS leaf, l.pred,
       |  COUNT(*) AS n,
       |  CAST(SUM(b.y) AS BIGINT) AS n_pos,
       |  CAST(SUM(CASE WHEN l.pred = b.y THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_correct
       |FROM a$TreeDepth a JOIN leaves l USING (node) JOIN lab b
       |  USING (doc_id)
       |GROUP BY a.node, l.pred
       |ORDER BY leaf""".stripMargin

  /** qc_tree_eval twin. */
  def treeEvalSql(qualitySql: String): String =
    s"""WITH ${treeCtesSql(qualitySql)},
       |leaves AS (
       |  SELECT node,
       |    CASE WHEN 2 * SUM(y) >= COUNT(*) THEN 1 ELSE 0 END AS pred
       |  FROM a$TreeDepth JOIN lab USING (doc_id) GROUP BY node)
       |SELECT COUNT(*) AS n_docs,
       |  CAST(SUM(b.y) AS BIGINT) AS n_pos,
       |  CAST(SUM(CASE WHEN l.pred = b.y THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_correct,
       |  CAST(greatest(SUM(b.y), COUNT(*) - SUM(b.y)) AS BIGINT)
       |    AS n_majority
       |FROM a$TreeDepth a JOIN leaves l USING (node) JOIN lab b
       |  USING (doc_id)""".stripMargin

  /** Shared NB-model CTE (rows for ALL fidx 1..NumFeatures). */
  private def nbModelCtesSql(qualitySql: String): String =
    s"""${featureCtesSql(qualitySql)},
       |nn AS (
       |  SELECT CAST(SUM(y) AS BIGINT) AS n1,
       |    CAST(COUNT(*) - SUM(y) AS BIGINT) AS n0
       |  FROM lab),
       |fcnt AS (
       |  SELECT f.fidx, CAST(SUM(b.y) AS BIGINT) AS c_pos,
       |    CAST(COUNT(*) - SUM(b.y) AS BIGINT) AS c_neg
       |  FROM feats f JOIN lab b USING (doc_id) GROUP BY f.fidx),
       |model AS MATERIALIZED (
       |  SELECT r.fidx,
       |    CASE WHEN r.fidx <= $NumWords
       |         THEN COALESCE(
       |           (SELECT w FROM cvocab v WHERE v.fidx = r.fidx),
       |           'word_' || CAST(r.fidx AS VARCHAR))
       |         ELSE 'len_bucket_' || CAST(r.fidx - $NumWords - 1 AS VARCHAR)
       |         END AS feature,
       |    COALESCE(c.c_pos, 0) AS c_pos, COALESCE(c.c_neg, 0) AS c_neg,
       |    CAST((length(bin(COALESCE(c.c_pos, 0) + 1)) - length(bin(n1 + 2)))
       |      - (length(bin(COALESCE(c.c_neg, 0) + 1)) - length(bin(n0 + 2)))
       |      AS BIGINT) AS w_present,
       |    CAST((length(bin(n1 + 1 - COALESCE(c.c_pos, 0)))
       |        - length(bin(n1 + 2)))
       |      - (length(bin(n0 + 1 - COALESCE(c.c_neg, 0)))
       |        - length(bin(n0 + 2)))
       |      AS BIGINT) AS w_absent
       |  FROM (SELECT CAST(unnest(range(1, ${NumFeatures + 1})) AS INT)
       |          AS fidx) r
       |  LEFT JOIN fcnt c USING (fidx) CROSS JOIN nn)""".stripMargin

  /** qc_nb twin: the model table. */
  def nbModelSql(qualitySql: String): String =
    s"""WITH ${nbModelCtesSql(qualitySql)}
       |SELECT fidx, feature, c_pos, c_neg, w_present, w_absent
       |FROM model ORDER BY fidx""".stripMargin

  /** qc_nb_score twin: prior + sum of absent weights + per-present
    * deltas, exactly the Spark decomposition. */
  def nbScoreSql(qualitySql: String): String =
    s"""WITH ${nbModelCtesSql(qualitySql)},
       |consts AS (
       |  SELECT CAST((SELECT length(bin(greatest(n1, 1)))
       |        - length(bin(greatest(n0, 1))) FROM nn)
       |      + (SELECT SUM(w_absent) FROM model) AS BIGINT) AS base),
       |perdoc AS (
       |  SELECT f.doc_id,
       |    CAST(SUM(m.w_present - m.w_absent) AS BIGINT) AS dsum
       |  FROM feats f JOIN model m USING (fidx) GROUP BY f.doc_id)
       |SELECT b.doc_id,
       |  CAST(COALESCE(p.dsum, 0) + c.base AS BIGINT) AS score,
       |  CASE WHEN COALESCE(p.dsum, 0) + c.base > 0 THEN 1 ELSE 0 END
       |    AS pred,
       |  b.y,
       |  CASE WHEN (CASE WHEN COALESCE(p.dsum, 0) + c.base > 0 THEN 1
       |        ELSE 0 END) = b.y THEN 1 ELSE 0 END AS correct
       |FROM lab b LEFT JOIN perdoc p USING (doc_id) CROSS JOIN consts c
       |ORDER BY b.doc_id""".stripMargin
}
