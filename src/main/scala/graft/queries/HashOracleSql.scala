package graft.queries

/** DuckDB SQL twins for the seeded-hash dedup operators (d3 MinHash+LSH,
  * d4 SimHash): the permutation family, mix64 finalizer, FNV-1a shingle
  * hash, and Spark's XXH64 band-bucket hash are all re-expressed in exact
  * 64-bit wraparound arithmetic over HUGEINT (mod-2^64 multiply via 32-bit
  * limb split; full-width XOR via the signed-BIGINT bridge, which is
  * two's-complement bitwise on both engines).
  *
  * Structure notes:
  *  - every multi-use subexpression gets its own nested SELECT layer —
  *    DuckDB macro-expands lateral aliases, so alias chains grow
  *    exponentially while projection layers stay linear;
  *  - hot intermediate tables are MATERIALIZED to stop projection merging
  *    from re-inlining them.
  *
  * Constants mirror graft.ops.TextImpl.{minhashSig, mix64, fnv1a64,
  * simhash64} and Spark's XXH64 (seed 42, per-column chaining).
  */
private[queries] object HashOracleSql {
  private val M64 = BigInt(1) << 64
  private val H64 = "CAST('18446744073709551616' AS HUGEINT)"
  private val H63 = "CAST('9223372036854775808' AS HUGEINT)"

  private def mulmod(u: String, c: BigInt): String = {
    val lo = c % (BigInt(1) << 32)
    val hi = c >> 32
    s"(($u * $lo) % $H64 + (($u * $hi) % 4294967296) * 4294967296) % $H64"
  }
  private def sgn(u: String): String =
    s"CAST(CASE WHEN $u >= $H63 THEN $u - $H64 ELSE $u END AS BIGINT)"
  private def uns(s0: String): String =
    s"CASE WHEN $s0 < 0 THEN CAST($s0 AS HUGEINT) + $H64 ELSE CAST($s0 AS HUGEINT) END"
  private def layered(base: String, steps: Seq[(String, String)]): String =
    steps.foldLeft(base) { case (q, (n, e)) => s"SELECT *, $e AS $n FROM ($q)" }

  // XXH64 primes (public xxHash spec, as used by Spark's XxHash64)
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  // minhash permutation family (TextImpl.minhashSig)
  private val Gold = BigInt("9E3779B97F4A7C15", 16)
  private val AddC = BigInt("BF58476D1CE4E5B9", 16)
  // mix64 multipliers (TextImpl.mix64)
  private val Mix1 = BigInt("FF51AFD7ED558CCD", 16)
  private val Mix2 = BigInt("C4CEB9FE1A85EC53", 16)

  /** One XXH64-of-a-single-long application: hashLong(in, seed) with the
    * 31/27-bit rotates and the 33/29/32 avalanche, as projection steps. */
  private def xxhSteps(pfx: String, in: String, seedU: String): Seq[(String, String)] = Seq(
    s"${pfx}inu" -> uns(in),
    s"${pfx}a1" -> mulmod(s"${pfx}inu", P2),
    s"${pfx}r1" -> s"((${pfx}a1 * 2147483648) % $H64 + ${pfx}a1 // 8589934592)",
    s"${pfx}k1" -> mulmod(s"${pfx}r1", P1),
    s"${pfx}h0" -> s"(($seedU) + ${P5 + 8}) % $H64",
    s"${pfx}hx" -> s"xor(${sgn(s"${pfx}h0")}, ${sgn(s"${pfx}k1")})",
    s"${pfx}h1" -> uns(s"${pfx}hx"),
    s"${pfx}r2" -> s"((${pfx}h1 * 134217728) % $H64 + ${pfx}h1 // 137438953472)",
    s"${pfx}h2" -> s"(${mulmod(s"${pfx}r2", P1)} + $P4) % $H64",
    s"${pfx}f1" -> s"xor(${sgn(s"${pfx}h2")}, CAST(${pfx}h2 // 8589934592 AS BIGINT))",
    s"${pfx}f1u" -> uns(s"${pfx}f1"),
    s"${pfx}f2" -> mulmod(s"${pfx}f1u", P2),
    s"${pfx}f3" -> s"xor(${sgn(s"${pfx}f2")}, CAST(${pfx}f2 // 536870912 AS BIGINT))",
    s"${pfx}f3u" -> uns(s"${pfx}f3"),
    s"${pfx}f4" -> mulmod(s"${pfx}f3u", P3),
    s"${pfx}out" -> s"xor(${sgn(s"${pfx}f4")}, CAST(${pfx}f4 // 4294967296 AS BIGINT))",
    s"${pfx}outu" -> uns(s"${pfx}out"))

  /** FNV-1a-64 over the chars of a string column expression, as a
    * list_reduce (ASCII corpus: ord == UTF-16 charAt). */
  private def fnvReduce(strExpr: String): String =
    s"""list_reduce(
       |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
       |        list_transform(regexp_extract_all($strExpr, '.'),
       |                       c -> CAST(ord(c) AS HUGEINT))),
       |      (h, c) -> ((h - h % 128 + xor(CAST(h % 128 AS BIGINT), CAST(c AS BIGINT))) * 1099511628211)
       |                % $H64)""".stripMargin

  /** d3_minhash_lsh: MinHash signatures (16 multiply-shift permutations
    * over mix64'd FNV 5-char shingle hashes, signed minima) -> 4-band
    * XXH64 buckets (Spark xxhash64 chaining, seed 42) -> bounded-bucket
    * candidates -> exact hashed-shingle Jaccard verify at 0.2. */
  /** d3 twin, parameterized by the MinHash geometry knobs (defaults = the
    * registered d3_minhash_lsh shape). `bandRows = numHashes / numBands`
    * drives the per-band signature columns and the length of the chained
    * XXH64 band hash (Spark's xxhash64(cols..., seed 42) is a left fold of
    * single-long XXH64 steps — one chain link per band row). */
  def d3Sql(numHashes: Int = 16, numBands: Int = 4,
      docFilter: String = "TRUE"): String =
    s"""${d3Ctes(numHashes, numBands, docFilter)},
       |inter AS (
       |  SELECT c.id_1, c.id_2, COUNT(*) AS common
       |  FROM cand c JOIN sh a ON a.doc_id = c.id_1
       |              JOIN sh b ON b.doc_id = c.id_2 AND b.h = a.h
       |  GROUP BY c.id_1, c.id_2)
       |SELECT id_1, id_2,
       |  CAST(common AS DOUBLE) / CAST(sa.ns + sb.ns - common AS DOUBLE) AS jaccard
       |FROM inter JOIN sizes sa ON sa.doc_id = id_1 JOIN sizes sb ON sb.doc_id = id_2
       |WHERE CAST(common AS DOUBLE) / CAST(sa.ns + sb.ns - common AS DOUBLE) >= 0.2
       |ORDER BY id_1, id_2""".stripMargin

  /** d3c_minhash_accuracy: the same signature/banding/candidate chain,
    * emitting per candidate pair the agreeing-position count (the
    * MinHash Jaccard estimator) beside the exact hashed-shingle Jaccard
    * — LEFT-joined intersection so zero-overlap candidates keep a row. */
  def d3AccuracySql(numHashes: Int = 16, numBands: Int = 4): String =
    s"""${d3Ctes(numHashes, numBands, "TRUE")},
       |agree AS (
       |  SELECT c.id_1, c.id_2,
       |    CAST(SUM(CASE WHEN a.sv = b.sv THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_agree
       |  FROM cand c JOIN sigs a ON a.doc_id = c.id_1
       |              JOIN sigs b ON b.doc_id = c.id_2 AND b.p = a.p
       |  GROUP BY c.id_1, c.id_2),
       |inter AS (
       |  SELECT c.id_1, c.id_2, COUNT(*) AS common
       |  FROM cand c JOIN sh a ON a.doc_id = c.id_1
       |              JOIN sh b ON b.doc_id = c.id_2 AND b.h = a.h
       |  GROUP BY c.id_1, c.id_2)
       |SELECT g.id_1, g.id_2, g.n_agree,
       |  CAST(g.n_agree AS DOUBLE) / CAST($numHashes AS DOUBLE) AS est,
       |  CAST(COALESCE(i.common, 0) AS DOUBLE) /
       |    CAST(sa.ns + sb.ns - COALESCE(i.common, 0) AS DOUBLE) AS jaccard
       |FROM agree g
       |LEFT JOIN inter i ON i.id_1 = g.id_1 AND i.id_2 = g.id_2
       |JOIN sizes sa ON sa.doc_id = g.id_1
       |JOIN sizes sb ON sb.doc_id = g.id_2
       |ORDER BY g.id_1, g.id_2""".stripMargin

  /** The shared d3 derivation chain: normalized text -> FNV 5-char
    * shingle hashes (`wins`) -> mix64 (`mixed`) -> per-permutation signed
    * minima (`sigs`) -> band signatures -> chained-XXH64 band buckets ->
    * bounded buckets -> candidate pairs (`cand`), plus the distinct
    * hashed-shingle sets (`sh`) and per-doc universe sizes (`sizes`). */
  private def d3Ctes(numHashes: Int, numBands: Int,
      docFilter: String): String = {
    require(numHashes % numBands == 0)
    val bandRows = numHashes / numBands
    val permRows = (0 until numHashes).map { p =>
      val mult = ((2 * p + 1) * Gold) % M64
      s"($p, ${mult % (BigInt(1) << 32)}, ${mult >> 32}, ${(p * AddC) % M64})"
    }.mkString(", ")
    val mixSteps = Seq(
      "s1" -> s"xor(${sgn("h")}, CAST(h // 8589934592 AS BIGINT))",
      "u1" -> uns("s1"),
      "u2" -> mulmod("u1", Mix1),
      "s2" -> s"xor(${sgn("u2")}, CAST(u2 // 8589934592 AS BIGINT))",
      "u3" -> uns("s2"),
      "u4" -> mulmod("u3", Mix2),
      "hms" -> s"xor(${sgn("u4")}, CAST(u4 // 8589934592 AS BIGINT))",
      "hm" -> uns("hms"))
    val mixedSql = layered("SELECT doc_id, h FROM wins", mixSteps)
    val vCols = (0 until bandRows).map(i => s"v$i")
    val bucketSteps = (0 until bandRows).flatMap { i =>
      val seed = if (i == 0) "CAST(42 AS HUGEINT)" else s"x${i}outu"
      xxhSteps(s"x${i + 1}", s"v$i", seed)
    }
    val bucketSql = layered(
      s"SELECT doc_id, band, ${vCols.mkString(", ")} FROM bandsig",
      bucketSteps)
    s"""WITH wins AS MATERIALIZED (
       |  SELECT doc_id,
       |    ${fnvReduce("substr(t, CAST(i AS INT), 5)")} AS h
       |  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 3)) AS i
       |        FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |              FROM documents WHERE $docFilter) n) w),
       |mixed AS MATERIALIZED (SELECT doc_id, hm FROM ($mixedSql) mz),
       |sigs AS MATERIALIZED (
       |  SELECT doc_id, p, MIN(${sgn("v")}) AS sv
       |  FROM (
       |    SELECT doc_id, p,
       |      ((hm * mlo) % $H64 + ((hm * mhi) % 4294967296) * 4294967296 + au) % $H64 AS v
       |    FROM mixed CROSS JOIN (VALUES $permRows) perms(p, mlo, mhi, au)) z
       |  GROUP BY doc_id, p),
       |bandsig AS MATERIALIZED (
       |  SELECT doc_id, p // $bandRows AS band,
       |    ${(0 until bandRows).map(i =>
             s"MAX(CASE WHEN p % $bandRows = $i THEN sv END) AS v$i")
             .mkString(",\n    ")}
       |  FROM sigs GROUP BY doc_id, p // $bandRows),
       |bb AS MATERIALIZED (SELECT doc_id, band, x${bandRows}out AS bucket FROM ($bucketSql) bz),
       |sized AS (
       |  SELECT band, bucket FROM bb GROUP BY band, bucket
       |  HAVING COUNT(*) BETWEEN 2 AND 64),
       |bounded AS (SELECT bb.doc_id, bb.band, bb.bucket FROM bb JOIN sized USING (band, bucket)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
       |  FROM bounded a JOIN bounded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |sh AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM wins),
       |sizes AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id)""".stripMargin
  }

  /** Shared per-doc SimHash64 derivation (ends in CTE `shs`:
    * (doc_id, sh BIGINT, u HUGEINT)). */
  private val simhashWith: String =
    s"""WITH RECURSIVE pows(b, p) AS (
       |  SELECT 0, CAST(1 AS HUGEINT) UNION ALL SELECT b + 1, p * 2 FROM pows WHERE b < 63),
       |toks AS (
       |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok
       |  FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |        FROM documents) n),
       |hashes AS MATERIALIZED (
       |  SELECT doc_id, ${fnvReduce("tok")} AS h
       |  FROM toks WHERE tok <> ''),
       |bits AS (
       |  SELECT doc_id, b, SUM(CASE WHEN (h // p) % 2 = 1 THEN 1 ELSE -1 END) AS acc,
       |         ANY_VALUE(p) AS p
       |  FROM hashes, pows GROUP BY doc_id, b),
       |shu AS (
       |  SELECT doc_id, SUM(CASE WHEN acc > 0 THEN p ELSE CAST(0 AS HUGEINT) END) AS u
       |  FROM bits GROUP BY doc_id),
       |shs AS MATERIALIZED (
       |  SELECT doc_id, ${sgn("u")} AS sh, u FROM shu)""".stripMargin

  /** d4_simhash: 4x16-bit pigeonhole banding over the per-doc SimHash,
    * XOR-popcount verify at Hamming <= 16. Buckets with more than 64
    * members are dropped — the exact twin of `Dedup.simhashPairs`'s
    * `BoundedLongList` cap (NULL-out hot buckets before pair explosion). */
  val d4Sql: String = d4SqlAt(maxHamming = 16, cap = 64)

  /** The d4 twin parameterized by verify threshold and bucket cap —
    * the cross-modal dedup gate reuses it at the simhashPairs default
    * (Hamming 3, cap 64). */
  def d4SqlAt(maxHamming: Int, cap: Int): String = simhashWith +
    s""",
       |banded AS (
       |  SELECT doc_id, sh, band, CAST((u // bp) % 65536 AS INT) AS bucket
       |  FROM shs, (VALUES (0, CAST(1 AS HUGEINT)), (1, CAST(65536 AS HUGEINT)),
       |                    (2, CAST(4294967296 AS HUGEINT)),
       |                    (3, CAST('281474976710656' AS HUGEINT))) blocks(band, bp)),
       |capped AS (
       |  SELECT band, bucket FROM banded
       |  GROUP BY band, bucket HAVING COUNT(*) <= $cap),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2, a.sh AS sh1, b.sh AS sh2
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
       |   AND a.doc_id < b.doc_id
       |  JOIN capped c ON a.band = c.band AND a.bucket = c.bucket)
       |SELECT id_1, id_2, CAST(bit_count(xor(sh1, sh2)) AS INT) AS hamming
       |FROM pairs WHERE bit_count(xor(sh1, sh2)) <= $maxHamming
       |ORDER BY id_1, id_2""".stripMargin

  /** s2_dsv2_source: the DataSourceV2 EDGAR search connector against the
    * hermetic stub, whose JSON body is a pure function of the URL
    * (cik/adsh derive from abs(fnv1a64(url) % 1e6)) — so the whole
    * connector + JSON-parse lineage replays in SQL. */
  val dsv2SourceSql: String =
    s"""WITH ids AS (
       |  SELECT unnest(range(0, (SELECT COUNT(*) FROM documents))) AS i),
       |u AS (
       |  SELECT 'https://efts.test/search-index?q=doc' || CAST(i AS VARCHAR)
       |    AS url
       |  FROM ids),
       |h AS (
       |  SELECT url,
       |    ${fnvReduce("url")} AS hu
       |  FROM u),
       |hs AS (
       |  SELECT url, abs(${sgn("hu")} % 1000000) AS m FROM h),
       |hit AS (
       |  SELECT url, m,
       |    '000' || lpad(CAST(m AS VARCHAR), 7, '0') AS cik,
       |    unnest(['000' || CAST(m AS VARCHAR) || '-26-00001'
       |              || CAST(m AS VARCHAR),
       |            '000' || CAST(m AS VARCHAR) || '-26-00002'
       |              || CAST(m AS VARCHAR)]) AS adsh
       |  FROM hs)
       |SELECT url, CAST(2 AS BIGINT) AS total_hits, cik, adsh
       |FROM hit
       |ORDER BY url, adsh""".stripMargin

  /** stream_neardup_twin: the batch twin of StreamOps.nearDupDedup —
    * keep-first (min doc_id) per SimHash key, with member counts. */
  val streamNearDupTwinSql: String = simhashWith +
    s"""
       |SELECT sh, MIN(doc_id) AS keeper, COUNT(*) AS n_members
       |FROM shs GROUP BY sh
       |ORDER BY sh""".stripMargin

  /** stream_neardup_exec: the surviving-key set of the ACTUAL streaming
    * execution. `dropDuplicatesWithinWatermark` guarantees exactly one
    * output row per key; which member survives depends on arrival order
    * (legitimately nondeterministic on a stream), so the executed gate
    * checks the key set — the deterministic part of the contract — while
    * the `_twin` row gates the full keep-first semantics in batch. */
  val streamNearDupKeysSql: String = simhashWith +
    s"""
       |SELECT DISTINCT sh FROM shs
       |ORDER BY sh""".stripMargin

  /** Shared CTE chain for the connected-components twins: the MinHash
    * near-dup pair set (the full d3 twin as a scoped subquery), its
    * symmetrized edge view, and `iters` unrolled min-label rounds
    * l0..l`iters` — the exact replay of Components.minLabelComponents.
    * MATERIALIZED barriers keep DuckDB from macro-expanding the round
    * chain (see the lateral-alias blowup note above d3Sql). */
  private def ccCtes(iters: Int): String =
    ccCtesOver(s"SELECT id_1, id_2 FROM (${d3Sql()}) __d3", iters)

  /** [[ccCtes]] over an ARBITRARY pair source (any SQL yielding
    * (id_1, id_2) — it may carry its own nested WITH): the min-label
    * unroll is pair-source-agnostic, so the image-dHash dedup apply
    * reuses the exact same round chain as the MinHash d6 family. */
  def ccCtesOver(pairsSql: String, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT id, MIN(rep) AS rep FROM (
         |    SELECT e.src AS id, l.rep FROM sym e JOIN l${i - 1} l ON l.id = e.dst
         |    UNION ALL SELECT id, rep FROM l${i - 1}) z
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""pairs AS MATERIALIZED (SELECT id_1, id_2 FROM ($pairsSql) __p),
       |sym AS (SELECT id_1 AS src, id_2 AS dst FROM pairs
       |        UNION ALL SELECT id_2 AS src, id_1 AS dst FROM pairs),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS rep FROM sym),
       |$rounds""".stripMargin
  }

  /** graph_kcore: `rounds` unrolled peel rounds over the d3 near-dup
    * pair graph — each round keeps only edges whose BOTH endpoints had
    * degree >= k in the previous round's edge set (truncation-equal to
    * the Spark loop by construction: later rounds past the fixpoint are
    * no-ops on both engines). Emits surviving (node, deg). */
  def kcoreSql(k: Int, rounds: Int): String = {
    val peels = (1 to rounds).map { i =>
      s"""d${i - 1} AS MATERIALIZED (
         |  SELECT n, COUNT(*) AS c FROM (
         |    SELECT a AS n FROM e${i - 1}
         |    UNION ALL SELECT b FROM e${i - 1}) z
         |  GROUP BY n),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${i - 1} e
         |  JOIN d${i - 1} x ON x.n = e.a AND x.c >= $k
         |  JOIN d${i - 1} y ON y.n = e.b AND y.c >= $k)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (SELECT id_1, id_2 FROM (${d3Sql()}) __d3),
       |e0 AS (SELECT id_1 AS a, id_2 AS b FROM pairs),
       |$peels
       |SELECT n AS node, COUNT(*) AS deg FROM (
       |  SELECT a AS n FROM e$rounds UNION ALL SELECT b FROM e$rounds) z
       |GROUP BY n ORDER BY node""".stripMargin
  }

  /** graph_triangles_approx: DOULION-style (Tsourakakis et al., KDD'09)
    * DETERMINISTIC edge sampling — keep the canonical co-purchase edges
    * whose Spark xxhash64(id_1, id_2) (a seed-42 two-link XXH64 chain,
    * replayed here in mod-2^64 limb arithmetic) lands in residue 0 mod
    * `invP`, enumerate triangles id-ordered on the sampled subgraph,
    * and scale per-node counts by invP^3 (a triangle survives iff all
    * three edges do, probability 1/invP^3 under a uniform hash). The
    * pseudo-random-by-hash sampling is what makes an approximate
    * algorithm exactly gateable: both engines sample the SAME edges. */
  /** Render projection steps as a run of MATERIALIZED CTEs, `chunk`
    * layers each: DuckDB's projection merging substitutes each layer's
    * aliases into the next, so an unbroken run of k layers whose
    * expressions reference prior aliases 2-3 times builds O(2^k)-node
    * trees per row — fine at the 500-2000-row bases the sampling
    * twins hash, minutes at 10^5 edges. Chunked, each slice evaluates
    * once per row and the tree depth is bounded by `chunk`. Returns
    * (cte list, name of the final cte). */
  private def chunkedCtes(nm: String, base: String,
      steps: Seq[(String, String)], chunk: Int): (String, String) = {
    val groups = steps.grouped(chunk).toSeq
    val ctes = groups.zipWithIndex.map { case (g, i) =>
      val b = if (i == 0) base else s"SELECT * FROM $nm$i"
      s"$nm${i + 1} AS MATERIALIZED (SELECT * FROM (${layered(b, g)}) z)"
    }
    (ctes.mkString(",\n"), s"$nm${groups.size}")
  }

  def triApproxSql(invP: Int): String = {
    val (c1, last1) = chunkedCtes("ta", "SELECT a, b FROM und",
      xxhSteps("t1", "a", "CAST(42 AS HUGEINT)"), chunk = 6)
    val (c2, last2) = chunkedCtes("tb", s"SELECT * FROM $last1",
      xxhSteps("t2", "b", "t1outu"), chunk = 6)
    val scale = invP.toLong * invP * invP
    s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |und AS MATERIALIZED (SELECT DISTINCT a.pk AS a, b.pk AS b
       |        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
       |$c1,
       |$c2,
       |hs AS MATERIALIZED (
       |  SELECT a, b FROM $last2
       |  WHERE ((t2out % $invP) + $invP) % $invP = 0),
       |tri AS (
       |  SELECT e1.a AS u, e1.b AS v, e2.b AS w
       |  FROM hs e1 JOIN hs e2 ON e2.a = e1.b
       |  JOIN hs e3 ON e3.a = e1.a AND e3.b = e2.b),
       |m AS (SELECT u AS node FROM tri
       |      UNION ALL SELECT v FROM tri
       |      UNION ALL SELECT w FROM tri)
       |SELECT node, COUNT(*) AS n_tri_sampled,
       |  COUNT(*) * $scale AS n_tri_est
       |FROM m GROUP BY node ORDER BY node""".stripMargin
  }

  /** d6_neardup_components: per clustered doc its component representative
    * (min doc id within `iters` hops = the component minimum once
    * converged — gated by d6StatsSql's n_unconverged) and the keep bit. */
  def d6Sql(iters: Int): String =
    s"""WITH ${ccCtes(iters)}
       |SELECT id, rep, id = rep AS keep
       |FROM l$iters
       |ORDER BY id""".stripMargin

  /** sample_stratified: deterministic per-stratum sampling — rank docs
    * inside each stratum by Spark's xxhash64(doc_id) (seed 42, replayed
    * here step-for-step in mod-2^64 arithmetic) and keep the first `cap`.
    * `langPerDocSql` must yield (doc_id BIGINT, lang VARCHAR) rows. */
  def stratifiedSampleSql(langPerDocSql: String, cap: Int): String = {
    val hashed = layered(s"SELECT doc_id, lang FROM ($langPerDocSql) ld",
      xxhSteps("smp", "doc_id", "CAST(42 AS HUGEINT)"))
    s"""WITH hs AS MATERIALIZED (
       |  SELECT doc_id, lang, smpout AS h FROM ($hashed) q),
       |rk AS (SELECT doc_id, lang, h,
       |  row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
       |  FROM hs)
       |SELECT doc_id, lang, h, CAST(rk AS INT) AS rk
       |FROM rk WHERE rk <= $cap
       |ORDER BY lang, rk""".stripMargin
  }

  /** sample_cluster_balanced: per-cell seeded sampling — rank vectors
    * inside each Voronoi cell by Spark's xxhash64(vec_id) (seed 42,
    * replayed) and keep the first `cap`. `cellPerVecSql` must yield
    * (vec_id BIGINT, cell INT) rows (it may carry its own WITH chain —
    * DuckDB allows a nested WITH inside a subquery). */
  def clusterBalancedSampleSql(cellPerVecSql: String, cap: Int): String = {
    val hashed = layered(s"SELECT vec_id, cell FROM ($cellPerVecSql) cv",
      xxhSteps("cb", "vec_id", "CAST(42 AS HUGEINT)"))
    s"""WITH hs AS MATERIALIZED (
       |  SELECT vec_id, cell, cbout AS h FROM ($hashed) q),
       |rk AS (SELECT vec_id, cell, h,
       |  row_number() OVER (PARTITION BY cell ORDER BY h, vec_id) AS rk
       |  FROM hs)
       |SELECT vec_id, cell, h, CAST(rk AS INT) AS rk
       |FROM rk WHERE rk <= $cap
       |ORDER BY cell, rk""".stripMargin
  }

  /** sample_mixture: Spark's xxhash64(doc_id) (seed 42) replayed, folded
    * to a [0, 10^6) bucket with the same positive-mod arithmetic as
    * Spark's pmod, kept when below the per-source threshold expression
    * (a CASE over `source` mirroring the Scala weight map). */
  def mixtureSampleSql(threshCase: String): String = {
    val hashed = layered("SELECT doc_id, source FROM documents",
      xxhSteps("mx", "doc_id", "CAST(42 AS HUGEINT)"))
    s"""WITH hs AS MATERIALIZED (
       |  SELECT doc_id, source, mxout AS h FROM ($hashed) q),
       |bk AS (
       |  SELECT doc_id, source,
       |    CAST(((h % 1000000) + 1000000) % 1000000 AS BIGINT) AS bucket,
       |    CAST($threshCase AS BIGINT) AS w_thresh
       |  FROM hs)
       |SELECT doc_id, source, bucket, w_thresh
       |FROM bk WHERE bucket < w_thresh
       |ORDER BY doc_id""".stripMargin
  }

  /** shuffle_shards: Spark's xxhash64(doc_id) replayed; shard by
    * positive mod, position by rank of (h, doc_id) within the shard. */
  def shuffleShardsSql(nShards: Int): String = {
    val hashed = layered("SELECT doc_id FROM documents",
      xxhSteps("sh", "doc_id", "CAST(42 AS HUGEINT)"))
    s"""WITH hs AS MATERIALIZED (
       |  SELECT doc_id, shout AS h FROM ($hashed) q),
       |sharded AS (
       |  SELECT doc_id AS id, h,
       |    CAST(((h % $nShards) + $nShards) % $nShards AS BIGINT) AS shard
       |  FROM hs)
       |SELECT id, h, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, id)
       |    AS BIGINT) AS pos
       |FROM sharded
       |ORDER BY id""".stripMargin
  }

  /** curriculum_order: Spark's xxhash64(doc_id) replayed; difficulty bin
    * from `binSql` (over the raw documents row), shard by positive mod,
    * position by rank of (h, doc_id) within (bin, shard). */
  def curriculumOrderSql(binSql: String, nShards: Int): String = {
    val hashed = layered(
      s"SELECT doc_id, $binSql AS bin FROM documents",
      xxhSteps("cu", "doc_id", "CAST(42 AS HUGEINT)"))
    s"""WITH hs AS MATERIALIZED (
       |  SELECT doc_id, bin, cuout AS h FROM ($hashed) q),
       |sharded AS (
       |  SELECT doc_id, bin, h,
       |    CAST(((h % $nShards) + $nShards) % $nShards AS BIGINT) AS shard
       |  FROM hs)
       |SELECT doc_id, bin, shard,
       |  CAST(row_number() OVER (PARTITION BY bin, shard ORDER BY h, doc_id)
       |    AS INT) AS pos
       |FROM sharded
       |ORDER BY doc_id""".stripMargin
  }

  /** export_manifest: one XXH64(doc_id) drives both the 80/10/10 split
    * band and the shard mod; per-(split, shard) totals plus the
    * order-independent bit_xor content fingerprint over 60-bit fp keys.
    * `fpSql`/`tokSql` are expressions over a raw documents row. */
  def manifestSql(fpSql: String, tokSql: String, nShards: Int): String = {
    val hashed = layered("SELECT doc_id FROM documents",
      xxhSteps("mf", "doc_id", "CAST(42 AS HUGEINT)"))
    s"""WITH hs AS MATERIALIZED (
       |  SELECT doc_id, mfout AS h FROM ($hashed) q),
       |base AS (
       |  SELECT d.doc_id,
       |    CAST(((h % 100) + 100) % 100 AS BIGINT) AS bucket,
       |    CAST(((h % $nShards) + $nShards) % $nShards AS BIGINT) AS shard,
       |    CAST(concat('0x', substr($fpSql, 1, 15)) AS BIGINT) AS fpk,
       |    $tokSql AS nt, length(text) AS nc
       |  FROM hs JOIN documents d USING (doc_id)),
       |sb AS (SELECT *, CASE WHEN bucket < 80 THEN 'train'
       |                      WHEN bucket < 90 THEN 'val'
       |                      ELSE 'test' END AS split FROM base)
       |SELECT split, shard,
       |  split || '-' || CAST(shard AS VARCHAR) || '.parquet' AS file,
       |  COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens,
       |  CAST(SUM(nc) AS BIGINT) AS n_chars,
       |  bit_xor(fpk) AS content_fp
       |FROM sb GROUP BY split, shard
       |ORDER BY split, shard""".stripMargin
  }

  /** span_corruption_plan: Spark's xxhash64(doc_id * 4096 + win)
    * replayed; one masked span per fixed token window, offset seeded by
    * the hash — the deterministic T5-style corruption plan. `winSize`
    * and `spanLen` must match the Scala constants. */
  def spanCorruptionSql(winSize: Int, spanLen: Int): String = {
    val hashed = layered(
      s"""SELECT doc_id, nw, win, doc_id * 4096 + win AS k FROM (
         |  SELECT doc_id, nw,
         |    CAST(unnest(range(0, ((nw - 1) // $winSize) + 1)) AS INT)
         |      AS win
         |  FROM (SELECT doc_id,
         |          len(string_split_regex(trim(text), '\\s+')) AS nw
         |        FROM documents) b) w""".stripMargin,
      xxhSteps("sc", "k", "CAST(42 AS HUGEINT)"))
    s"""WITH hs AS MATERIALIZED (
       |  SELECT doc_id, nw, win, scout AS h FROM ($hashed) q),
       |sp AS (
       |  SELECT doc_id, win, nw,
       |    CAST(win * $winSize AS BIGINT) +
       |      CAST(((h % m) + m) % m AS BIGINT) AS span_start
       |  FROM (SELECT *,
       |          greatest(least($winSize, nw - win * $winSize) -
       |            ${spanLen - 1}, 1) AS m
       |        FROM hs) g)
       |SELECT doc_id, win, span_start,
       |  CAST(least($spanLen, nw - span_start) AS BIGINT) AS span_len
       |FROM sp
       |ORDER BY doc_id, win""".stripMargin
  }

  /** split_assign: Spark's xxhash64(doc_id) replayed; bucket by positive
    * mod 100, split = first band whose cumulative upper bound exceeds the
    * bucket (same fold order as Sampling.assignSplit). */
  def splitAssignSql(bands: Seq[(String, Int)]): String = {
    val hashed = layered("SELECT doc_id FROM documents",
      xxhSteps("sp", "doc_id", "CAST(42 AS HUGEINT)"))
    val cum = bands.map(_._2).scanLeft(0)(_ + _).tail
    val cases = bands.init.zip(cum)
      .map { case ((n, _), ub) => s"WHEN bucket < $ub THEN '$n'" }
      .mkString(" ")
    s"""WITH hs AS MATERIALIZED (
       |  SELECT doc_id, spout AS h FROM ($hashed) q),
       |bk AS (
       |  SELECT doc_id AS id,
       |    CAST(((h % 100) + 100) % 100 AS BIGINT) AS bucket
       |  FROM hs)
       |SELECT id, bucket,
       |  CASE $cases ELSE '${bands.last._1}' END AS split
       |FROM bk
       |ORDER BY id""".stripMargin
  }

  /** sample_temperature: per-source counts -> sqrt-scaled keep rates
    * (alpha = 0.5 temperature reweighting; every double op is an
    * exactly-rounded IEEE op, so the floor'd thresholds match Spark's
    * bit-for-bit) -> the same XXH64 integer-threshold keep decision as
    * the mixture twin. */
  def temperatureSampleSql(stratum: String): String = {
    val hashed = layered(s"SELECT doc_id, $stratum AS source FROM documents",
      xxhSteps("tp", "doc_id", "CAST(42 AS HUGEINT)"))
    s"""WITH cnt AS (
       |  SELECT $stratum AS source, CAST(COUNT(*) AS BIGINT) AS n_source
       |  FROM documents GROUP BY $stratum),
       |mn AS (SELECT MIN(n_source) AS minn FROM cnt),
       |rates AS (
       |  SELECT source, n_source,
       |    CAST(floor(1000000.0 * sqrt(CAST(minn AS DOUBLE)
       |      / CAST(n_source AS DOUBLE))) AS BIGINT) AS w_thresh
       |  FROM cnt, mn),
       |hs AS MATERIALIZED (
       |  SELECT doc_id, source, tpout AS h FROM ($hashed) q),
       |bk AS (
       |  SELECT doc_id, hs.source, n_source,
       |    CAST(((h % 1000000) + 1000000) % 1000000 AS BIGINT) AS bucket,
       |    w_thresh
       |  FROM hs JOIN rates ON hs.source = rates.source)
       |SELECT doc_id, source, n_source, bucket, w_thresh
       |FROM bk WHERE bucket < w_thresh
       |ORDER BY doc_id""".stripMargin
  }

  /** d6c_dedup_apply: the deduplicated corpus — every document minus the
    * non-canonical members of each near-dup component (anti-join against
    * the drop set; docs in no pair are implicitly kept). */
  /** approx_ndv: HLL over xxhash64 of a 60-bit key — the register walk
    * (index = hash low byte, rank = 57 - bitlength of the rest) in exact
    * integers, the register sum in exact 2^-57 units (HUGEINT), and the
    * raw estimate as the one closing double expression. `keySql` must
    * yield (source, k BIGINT) rows. */
  def hllNdvSql(keySql: String): String = {
    val hashed = layered(keySql, xxhSteps("hl", "k", "CAST(42 AS HUGEINT)"))
    s"""WITH hs AS MATERIALIZED (
       |  SELECT source, k, hloutu AS u FROM ($hashed) q),
       |regs AS (
       |  SELECT source, CAST(u % 256 AS BIGINT) AS r,
       |    MAX(CASE WHEN u // 256 = 0 THEN 57
       |        ELSE 57 - length(bin(CAST(u // 256 AS BIGINT))) END) AS mk
       |  FROM hs GROUP BY 1, 2),
       |agg AS (
       |  SELECT source, COUNT(*) AS m_used,
       |    SUM(CAST(CAST(1 AS BIGINT) << CAST(57 - mk AS INT) AS HUGEINT))
       |      AS zs
       |  FROM regs GROUP BY 1),
       |fin AS (
       |  SELECT source, m_used,
       |    zs + (256 - m_used) * CAST(144115188075855872 AS HUGEINT) AS z
       |  FROM agg),
       |ex AS (SELECT source, COUNT(DISTINCT k) AS n_exact
       |       FROM hs GROUP BY 1)
       |SELECT ex.source, n_exact, m_used,
       |  0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 144115188075855872.0
       |    / CAST(z AS DOUBLE) AS hll_ndv
       |FROM ex JOIN fin ON ex.source = fin.source
       |ORDER BY ex.source""".stripMargin
  }

  /** cms_heavyhitters: the d x w counter matrix from the word counts
    * (sum-per-bucket == Spark's per-occurrence explode), buckets via the
    * two-step XXH64 chain (word key, then seed), estimate = min over
    * rows; top-k by (count desc, key) replayed as a rank window — the
    * oracle may sort the vocabulary, the Spark side must not. */
  def cmsTopWordsSql(topK: Int, d: Int, w: Int): String = {
    val seedRows = (0 until d).map(i => s"(CAST($i AS BIGINT))")
      .mkString(", ")
    val hashed = layered(
      "SELECT k, sd FROM (SELECT DISTINCT k FROM occ) kx " +
        s"CROSS JOIN (VALUES $seedRows) s(sd)",
      xxhSteps("c1", "k", "CAST(42 AS HUGEINT)") ++
        xxhSteps("c2", "sd", "c1outu"))
    s"""WITH occ AS MATERIALIZED (
       |  SELECT word,
       |    CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS k
       |  FROM (SELECT unnest(string_split(regexp_replace(lower(trim(text)),
       |    '\\s+', ' ', 'g'), ' ')) AS word FROM documents) wx),
       |ex AS MATERIALIZED (
       |  SELECT word, k, COUNT(*) AS n_exact FROM occ GROUP BY 1, 2),
       |hk AS MATERIALIZED (
       |  SELECT k, sd,
       |    CAST(((c2out % $w) + $w) % $w AS BIGINT) AS bucket
       |  FROM ($hashed) hx),
       |sk AS (
       |  SELECT sd, bucket, SUM(n_exact) AS c
       |  FROM ex JOIN hk USING (k) GROUP BY 1, 2),
       |top AS (
       |  SELECT word, k, n_exact, CAST(rk AS INT) AS rk FROM (
       |    SELECT word, k, n_exact,
       |      row_number() OVER (ORDER BY n_exact DESC, k) AS rk
       |    FROM ex) z WHERE rk <= $topK)
       |SELECT t.rk, t.word, t.n_exact, CAST(MIN(s.c) AS BIGINT) AS n_cms
       |FROM top t JOIN hk USING (k) JOIN sk s USING (sd, bucket)
       |GROUP BY 1, 2, 3
       |ORDER BY t.rk""".stripMargin
  }

  /** stream_cms_exec: just the d x w counter MATRIX (the bounded sketch
    * state a streaming build maintains) — the same occ/hash/bucket chain
    * as [[cmsTopWordsSql]], emitted as (sd, bucket, n) rows. */
  def cmsMatrixSql(d: Int, w: Int): String = {
    val seedRows = (0 until d).map(i => s"(CAST($i AS BIGINT))")
      .mkString(", ")
    val hashed = layered(
      "SELECT k, sd FROM (SELECT DISTINCT k FROM occ) kx " +
        s"CROSS JOIN (VALUES $seedRows) s(sd)",
      xxhSteps("c1", "k", "CAST(42 AS HUGEINT)") ++
        xxhSteps("c2", "sd", "c1outu"))
    s"""WITH occ AS MATERIALIZED (
       |  SELECT word,
       |    CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS k
       |  FROM (SELECT unnest(string_split(regexp_replace(lower(trim(text)),
       |    '\\s+', ' ', 'g'), ' ')) AS word FROM documents) wx),
       |ex AS (SELECT k, COUNT(*) AS n_occ FROM occ GROUP BY 1),
       |hk AS (
       |  SELECT k, sd,
       |    CAST(((c2out % $w) + $w) % $w AS BIGINT) AS bucket
       |  FROM ($hashed) hx)
       |SELECT sd, bucket, CAST(SUM(n_occ) AS BIGINT) AS n
       |FROM ex JOIN hk USING (k)
       |GROUP BY 1, 2
       |ORDER BY sd, bucket""".stripMargin
  }

  /** d6e_dedup_apply_best: corpus minus the non-BEST members of each
    * near-dup component — argmax quality (ties min id) per component,
    * replayed with a rank window over the joined label/quality view. */
  def d6ApplyBestSql(iters: Int, qualitySql: String): String =
    s"""WITH ${ccCtes(iters)},
       |q AS (SELECT doc_id, $qualitySql AS quality FROM documents),
       |scored AS (
       |  SELECT l.id, l.rep, q.quality FROM l$iters l
       |  JOIN q ON q.doc_id = l.id),
       |best AS (
       |  SELECT rep, id AS best_id FROM (
       |    SELECT rep, id,
       |      row_number() OVER (PARTITION BY rep
       |        ORDER BY quality DESC, id) AS rn
       |    FROM scored) z WHERE rn = 1),
       |drops AS (
       |  SELECT s.id FROM scored s JOIN best b USING (rep)
       |  WHERE s.id <> b.best_id)
       |SELECT d.doc_id, q.quality, CAST(length(d.text) AS INT) AS text_len
       |FROM documents d
       |JOIN q ON q.doc_id = d.doc_id
       |LEFT JOIN drops ON d.doc_id = drops.id
       |WHERE drops.id IS NULL
       |ORDER BY d.doc_id""".stripMargin

  def d6ApplySql(iters: Int): String =
    s"""WITH ${ccCtes(iters)},
       |drops AS (SELECT id FROM l$iters WHERE id <> rep)
       |SELECT d.doc_id, CAST(length(d.text) AS INT) AS text_len
       |FROM documents d LEFT JOIN drops ON d.doc_id = drops.id
       |WHERE drops.id IS NULL
       |ORDER BY d.doc_id""".stripMargin

  /** d6b_component_stats: node/component counts plus the number of labels
    * one more round would still change — 0 proves the unroll depth reached
    * the fixpoint on this corpus (the convergence test a production loop
    * runs per round, here driver-gated). */
  def d6StatsSql(iters: Int): String =
    s"""WITH ${ccCtes(iters + 1)}
       |SELECT
       |  (SELECT COUNT(*) FROM l$iters) AS n_nodes,
       |  (SELECT COUNT(DISTINCT rep) FROM l$iters) AS n_components,
       |  (SELECT COUNT(*) FROM l$iters a JOIN l${iters + 1} b
       |     ON a.id = b.id AND a.rep <> b.rep) AS n_unconverged""".stripMargin
}
