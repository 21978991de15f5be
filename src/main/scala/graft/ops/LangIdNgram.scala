package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-n-gram rank-profile language ID (Cavnar & Trenkle 1994,
  * "N-Gram-Based Text Categorization") — the real-algorithm upgrade of
  * [[TextAnalysis.langId]]'s stopword-marker heuristic (kept as the
  * cheaper gate the earlier rows were built on).
  *
  * A language profile is the rank-ordered list of its most frequent
  * character trigrams, trained here over a small committed sample corpus
  * ([[TrainText]]). A document is classified by the out-of-place measure:
  * for each trigram in the document's own top-[[ProfileSize]] profile,
  * the |doc rank - language rank| distance (or [[ProfileSize]] when the
  * trigram is absent from the language profile), summed; lowest total
  * wins, ties resolve alphabetically. Everything is exact integer
  * arithmetic over deterministic orderings, so the full classification
  * replays bit-for-bit in the DuckDB twin (profiles are exported as
  * VALUES rows from the same Scala constants — the lshPlanes convention).
  *
  * Scale shape: trigram extraction is a flatMap; per-doc counting and
  * ranking shuffle on doc_id only (rank windows are per-doc, bounded by
  * document length — never a global window); the language profiles are a
  * languages x ProfileSize literal table, broadcast; the final argmin is
  * again a per-doc window. One doc-keyed shuffle end to end beyond the
  * counting exchange — the per-doc-verdict floor.
  */
object LangIdNgram {

  // 60 ranks discriminates the 7-language set on the held-out gate (15
  // confused it/fr and nl/de, 40 still confused it/pt); Cavnar-Trenkle's
  // published profiles go to 300 — the knob trades profile-table width
  // for accuracy, never plan shape
  val ProfileSize = 60

  /** Committed training corpus — two public-domain-style sample
    * sentences per language, seven languages. Apostrophe-free ASCII so
    * the same literals embed verbatim in the SQL twin. */
  val TrainText: Seq[(String, String)] = Seq(
    "de" -> ("der schnelle braune fuchs springt ueber den faulen hund und " +
      "die kinder spielen in dem garten waehrend die sonne scheint und " +
      "der alte mann liest die zeitung nicht ohne seine brille " +
      "die schule beginnt um neun uhr und die kinder gehen zusammen " +
      "mit ihren freunden durch den park in die stadt"),
    "en" -> ("the quick brown fox jumps over the lazy dog and the " +
      "children are playing in the garden while the sun is shining and " +
      "the old man reads the newspaper with his glasses on the table " +
      "the school begins at nine and the children walk together " +
      "with their friends through the park into the town"),
    "es" -> ("el zorro marron salta sobre el perro perezoso y los ninos " +
      "juegan en el jardin mientras brilla el sol y el hombre viejo lee " +
      "el periodico con sus gafas en la mesa de la casa " +
      "la escuela empieza a las nueve y los ninos caminan juntos " +
      "con sus amigos por el parque hacia la ciudad"),
    "fr" -> ("le renard brun saute par dessus le chien paresseux et les " +
      "enfants jouent dans le jardin pendant que le soleil brille et le " +
      "vieil homme lit le journal avec ses lunettes sur la table " +
      "la classe commence a neuf heures et les enfants marchent " +
      "ensemble avec leurs amis dans le parc vers la ville"),
    "it" -> ("la volpe marrone salta sopra il cane pigro e i bambini " +
      "giocano nel giardino mentre il sole splende e il vecchio legge " +
      "il giornale con i suoi occhiali sul tavolo della casa " +
      "la scuola comincia alle nove e i bambini camminano insieme " +
      "con i loro amici per il parco verso la citta"),
    "nl" -> ("de snelle bruine vos springt over de luie hond en de " +
      "kinderen spelen in de tuin terwijl de zon schijnt en de oude " +
      "man leest de krant met zijn bril op de tafel " +
      "de school begint om negen uur en de kinderen lopen samen " +
      "met hun vrienden door het park naar de stad"),
    "pt" -> ("a raposa marrom salta sobre o cao preguicoso e as criancas " +
      "brincam no jardim enquanto o sol brilha e o velho le o jornal " +
      "com os seus oculos sobre a mesa da casa " +
      "a escola comeca as nove e as criancas caminham juntas " +
      "com os seus amigos pelo parque para a cidade"))

  /** Held-out test sentences (not in [[TrainText]]) injected as synthetic
    * docs by the gate so the classifier provably discriminates — the
    * documents table itself is language-agnostic word salad. */
  val TestSentences: Seq[(String, String)] = Seq(
    "de" -> "die frau kauft das brot und den kaese in der stadt weil der laden heute offen ist",
    "de" -> "wir haben nicht gewusst dass der zug schon um acht uhr faehrt",
    "en" -> "the woman buys the bread and the cheese in the town because the shop is open today",
    "en" -> "we did not know that the train leaves at eight in the morning",
    "es" -> "la mujer compra el pan y el queso en la ciudad porque la tienda esta abierta hoy",
    "es" -> "no sabiamos que el tren sale a las ocho de la manana",
    "fr" -> "la femme achete le pain et le fromage dans la ville parce que le magasin est ouvert",
    "fr" -> "nous ne savions pas que le train part a huit heures du matin",
    "it" -> "la donna compra il pane e il formaggio in citta perche il negozio e aperto oggi",
    "it" -> "non sapevamo che il treno parte alle otto del mattino",
    "nl" -> "de vrouw koopt het brood en de kaas in de stad omdat de winkel vandaag open is",
    "nl" -> "wij wisten niet dat de trein al om acht uur vertrekt",
    "pt" -> "a mulher compra o pao e o queijo na cidade porque a loja esta aberta hoje",
    "pt" -> "nao sabiamos que o trem sai as oito da manha")

  /** Normalize exactly as both engines will: lower, collapse whitespace,
    * pad with single spaces so word boundaries contribute edge trigrams. */
  private def normalize(s: String): String =
    " " + s.toLowerCase(java.util.Locale.ROOT).trim.replaceAll("\\s+", " ") + " "

  /** Rank-ordered top-[[ProfileSize]] trigrams of one training text:
    * count desc, trigram asc — the same total order the SQL twin and the
    * DataFrame op use. Computed once at class load (pure string ops). */
  def profile(text: String): Seq[(String, Int)] = {
    val n = normalize(text)
    n.sliding(3).toSeq
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(ProfileSize)
      .zipWithIndex.map { case ((t, _), i) => (t, i + 1) }
  }

  /** (lang, trigram, rank) rows for every language profile. */
  lazy val ProfileRows: Seq[(String, String, Int)] =
    TrainText.flatMap { case (lang, txt) =>
      profile(txt).map { case (t, r) => (lang, t, r) }
    }

  /** The profiles as DuckDB VALUES rows `('lang', 'tri', rank)` — single
    * source with the Spark side (trigram literals are quote-free by
    * construction of [[TrainText]]). */
  def profileValuesSql: String =
    ProfileRows.map { case (l, t, r) => s"('$l', '$t', $r)" }.mkString(", ")

  /** The injected test docs as VALUES rows `(doc_id, 'lang', 'text')`. */
  def testDocValuesSql(baseId: Long): String =
    TestSentences.zipWithIndex.map { case ((lang, s), i) =>
      s"(${baseId + i}, '$lang', '$s')"
    }.mkString(", ")

  /** Spark-side normalization of a text column — must mirror
    * [[normalize]] term for term. */
  def normalizeCol(text: Column): Column =
    concat(lit(" "),
      regexp_replace(lower(trim(text)), "\\s+", " "), lit(" "))

  /** Language profiles as (lang -> trigram -> rank) lookup maps, langs in
    * alphabetical order — the kernel-side view of [[ProfileRows]]. */
  lazy val ProfileMaps: Seq[(String, Map[String, Int])] =
    ProfileRows.groupBy(_._1).view
      .mapValues(_.map { case (_, t, r) => t -> r }.toMap)
      .toSeq.sortBy(_._1)

  /** The whole classification as ONE per-row kernel (the map-stage face
    * of [[classify]]): normalize, count trigrams, rank the top
    * [[ProfileSize]], score each language's out-of-place distance, argmin
    * with alphabetical ties. Identical term for term to the relational
    * plan — same normalize regex, same (count desc, trigram asc) rank
    * order (binary string compare — ASCII here), same penalty, same tie
    * rule — which the shared DuckDB twin proves. Returns null for texts
    * too short to carry a trigram (the relational plan emits no row).
    * O(len + K·langs) per row, zero shuffles at any corpus size. */
  def classifyKernel(raw: String): (String, Long) = {
    // mirror normalizeCol exactly: Spark trim() strips ASCII space ONLY
    // (Java String.trim strips all <= 0x20 — a silent divergence on
    // leading tabs), then lower, then collapse
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    val t = " " + raw.substring(b, e).toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ") + " "
    // slide by CODE POINT, not UTF-16 unit — the relational plan and the
    // DuckDB twin both index by code point (Spark substring/length on
    // UTF8String, DuckDB substr/len), so a supplementary-plane char must
    // count as ONE trigram position here too (fuzz spec covers non-BMP)
    val cps = t.codePoints().toArray
    if (cps.length < 3) return (null, -1L)
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i + 3 <= cps.length) {
      counts.merge(new String(cps, i, 3), 1, Integer.sum _)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    val top = counts.asScala.toSeq
      .sortBy { case (tri, c) => (-c, tri) }.take(ProfileSize)
    var bestLang: String = null
    var bestDist = Long.MaxValue
    ProfileMaps.foreach { case (lang, prof) =>
      var d = 0L
      var idx = 0
      top.foreach { case (tri, _) =>
        d += (prof.get(tri) match {
          case Some(lr) => math.abs(idx + 1 - lr).toLong
          case None => ProfileSize.toLong
        })
        idx += 1
      }
      if (d < bestDist) { bestDist = d; bestLang = lang }
    }
    (bestLang, bestDist)
  }

  /** Codegen bridge: [[classifyKernel]] boxed as an InternalRow (null for
    * trigram-less text, surfacing as a NULL struct). */
  def classifyRow(s: org.apache.spark.unsafe.types.UTF8String):
      org.apache.spark.sql.catalyst.InternalRow = {
    val (lang, d) = classifyKernel(s.toString)
    if (lang == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(lang), d))
  }

  /** [[classifyKernel]] as a codegen'd Catalyst column: one static call
    * per row returning struct(pred_lang, best_dist). */
  def classifyCol(text: Column): Column = {
    import org.apache.spark.sql.graft.{LangIdNgramExpr, internal}
    internal.column(LangIdNgramExpr(internal.expression(text)))
  }

  /** Classify every row of `docs` (id, text): returns
    * (id, pred_lang, best_dist). */
  def classify(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val langs = TrainText.map(_._1)

    val norm = docs.select(col("id"), normalizeCol(col("text")).as("t"))
    // every char trigram: substr over a 1..len-2 position range (flatMap).
    // Spark's sequence(1, 0) DESCENDS, so texts too short for a trigram
    // must map to an explicit empty position array.
    val tris = norm
      .select(col("id"), col("t"),
        explode(when(length(col("t")) >= 3,
            sequence(lit(1), length(col("t")) - 2))
          .otherwise(array().cast("array<int>"))).as("p"))
      .select(col("id"), expr("substring(t, p, 3)").as("tri"))
    // doc profile: top-K by (count desc, trigram asc), rank 1..K
    val wDoc = Window.partitionBy(col("id"))
      .orderBy(col("c").desc, col("tri"))
    val docProf = tris.groupBy(col("id"), col("tri"))
      .agg(count(lit(1)).as("c"))
      .withColumn("dr", row_number().over(wDoc))
      .filter(col("dr") <= ProfileSize)
      .select(col("id"), col("tri"), col("dr"))
    // language profiles: tiny literal table, broadcast
    val prof = broadcast(
      ProfileRows.toDF("lang", "tri", "lr"))
    // out-of-place distance per (doc, lang): cross the doc profile with
    // the 4 languages, left-join the profile rank, penalty when absent
    val langsDf = broadcast(langs.toDF("lang"))
    val dists = docProf.crossJoin(langsDf)
      .join(prof, Seq("lang", "tri"), "left")
      .withColumn("d", coalesce(abs(col("dr") - col("lr")),
        lit(ProfileSize)))
      .groupBy(col("id"), col("lang"))
      .agg(sum(col("d")).as("dist"))
    val wBest = Window.partitionBy(col("id"))
      .orderBy(col("dist"), col("lang"))
    dists.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("id"), col("lang").as("pred_lang"),
        col("dist").cast("long").as("best_dist"))
  }
}
