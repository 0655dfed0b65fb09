package graft.queries

/** DuckDB oracle SQL for every entry in SparkEntry.queries. Each statement
  * runs against views named after the testdata parquet tables and must
  * produce the same rows/columns as the Spark query (columns are matched by
  * name). Extraction oracles compute the EXPECTED output in closed form
  * from the same deterministic text synthesis — planted negatives that
  * wrongly extract would break the count/hash compare.
  */
object OracleDefs {
  import QueryDefs._
  import graft.ops.TextStats

  val extractIpv4: String =
    """SELECT '10.'||(user_id%200)||'.'||(event_id%250)||'.'||(event_id%100) AS value,
      |       count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  val extractIpv6: String =
    """SELECT '2001:db8:'||(event_id%9998+1)||'::'||(user_id%8999+1000) AS value,
      |       count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  val extractDomain: String =
    """SELECT 'host'||(event_id%50)||'.example.com' AS value, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  val extractEmail: String =
    """SELECT * FROM (
      |  SELECT 'domain' AS indicator_type,
      |         'mail'||(user_id%5)||'.org' AS value, count(*) AS n
      |  FROM events GROUP BY 2
      |  UNION ALL
      |  SELECT 'email',
      |         'user'||(event_id%20)||'@mail'||(user_id%5)||'.org', count(*)
      |  FROM events GROUP BY 2
      |) ORDER BY indicator_type, value""".stripMargin

  val extractHashes: String =
    """SELECT * FROM (
      |  SELECT 'md5' AS indicator_type, count(*) AS n,
      |         min(md5(event_id::VARCHAR)) AS min_value,
      |         max(md5(event_id::VARCHAR)) AS max_value
      |  FROM events
      |  UNION ALL
      |  SELECT 'sha256', count(*),
      |         min(sha256(event_id::VARCHAR||'s')),
      |         max(sha256(event_id::VARCHAR||'s'))
      |  FROM events
      |) ORDER BY indicator_type""".stripMargin

  val extractBitcoin: String =
    s"""SELECT CASE event_id%4 WHEN 0 THEN '$btcGenesis'
       |            WHEN 1 THEN '$btcP2sh' ELSE '$btcBech32' END AS value,
       |       count(*) AS n
       |FROM events WHERE event_id%4 < 3 GROUP BY 1 ORDER BY 1""".stripMargin

  val extractEthereum: String =
    s"""SELECT CASE event_id%4 WHEN 0 THEN '$ethLower'
       |            WHEN 1 THEN '$ethMixed' ELSE '$ethUpper' END AS value,
       |       count(*) AS n
       |FROM events WHERE event_id%4 < 3 GROUP BY 1 ORDER BY 1""".stripMargin

  val extractMonero: String =
    s"""SELECT CASE event_id%3 WHEN 0 THEN '$xmrA' ELSE '$xmrB' END AS value,
       |       count(*) AS n
       |FROM events WHERE event_id%3 < 2 GROUP BY 1 ORDER BY 1""".stripMargin

  val intelClassify: String =
    """SELECT CASE event_id%6 WHEN 0 THEN 'ip' WHEN 1 THEN 'ip'
      |            WHEN 2 THEN 'literal' WHEN 3 THEN 'glob'
      |            ELSE 'literal' END AS entry_type,
      |       count(*) AS n
      |FROM events WHERE event_id%6 < 5 GROUP BY 1 ORDER BY 1""".stripMargin

  val lookupLiteral: String =
    """SELECT c.value AS value, count(*) AS n
      |FROM (SELECT 'host'||(event_id%50)||'.example.com' AS value FROM events) c
      |JOIN (SELECT 'host'||n_nationkey||'.example.com' AS entry
      |      FROM nation WHERE n_nationkey < 5) i
      |  ON c.value = i.entry
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val lookupLpm: String =
    """SELECT '10.'||o2||'.'||o3||'.'||o4 AS value,
      |       CASE WHEN o3 = o2*3 THEN 24 ELSE 16 END AS prefix_len,
      |       CASE WHEN o3 = o2*3 THEN '10.'||o2||'.'||o2*3||'.0/24'
      |            ELSE '10.'||o2||'.0.0/16' END AS entry,
      |       count(*) AS n
      |FROM (SELECT user_id%200 AS o2, event_id%250 AS o3, event_id%100 AS o4
      |      FROM events) t
      |WHERE o2 <= 24
      |GROUP BY 1,2,3 ORDER BY 1,2""".stripMargin

  val lookupGlob: String =
    """SELECT i.entry AS entry, count(*) AS n
      |FROM (SELECT event_id%7 AS m FROM events) c
      |JOIN (SELECT '*.glob'||r_regionkey||'.net' AS entry, r_regionkey AS k
      |      FROM region WHERE r_regionkey < 4
      |      UNION ALL SELECT 'glob:glob5', 5) i
      |  ON c.m = i.k
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val lookupMultiDb: String =
    """SELECT i.database_id AS database_id, c.value AS value, count(*) AS n
      |FROM (SELECT 'host'||(event_id%50)||'.example.com' AS value,
      |             event_id%50 AS m FROM events) c
      |JOIN (SELECT 'threats' AS database_id, n_nationkey AS k FROM nation
      |      WHERE n_nationkey < 5
      |      UNION ALL
      |      SELECT 'allowlist', n_nationkey FROM nation
      |      WHERE n_nationkey >= 5 AND n_nationkey < 10) i
      |  ON c.m = i.k
      |GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  // closed-form A10 gold for goldTurns/goldIntel (QueryDefs):
  //  e%5==0 -> 1 ipv4 match (LPM: /16 when e%20==5, else /8)
  //  e%5==1 -> glob '*.example.com' always + literal when e%3==0
  //  e%5==2 -> md5 literal match when e%4==1
  val matchGold: String =
    """SELECT 'threats' AS database_id, indicator_type, role,
      |       CAST(SUM(c) AS BIGINT) AS match_count
      |FROM (
      |  SELECT 'ipv4' AS indicator_type, event_type AS role, count(*) AS c
      |  FROM events WHERE event_id%5 = 0 GROUP BY 2
      |  UNION ALL
      |  SELECT 'domain', event_type, count(*)
      |  FROM events WHERE event_id%5 = 1 GROUP BY 2
      |  UNION ALL
      |  SELECT 'domain', event_type, count(*)
      |  FROM events WHERE event_id%5 = 1 AND event_id%3 = 0 GROUP BY 2
      |  UNION ALL
      |  SELECT 'md5', event_type, count(*)
      |  FROM events WHERE event_id%5 = 2 AND event_id%4 = 1 GROUP BY 2
      |)
      |GROUP BY 1,2,3 ORDER BY indicator_type, role""".stripMargin

  val routeCounts: String =
    """SELECT * FROM (
      |  SELECT 'ipv4' AS sink, count(*) AS n FROM events WHERE event_id%5 = 0
      |  UNION ALL
      |  SELECT 'domain', CAST(SUM(c) AS BIGINT) FROM (
      |    SELECT count(*) AS c FROM events WHERE event_id%5 = 1
      |    UNION ALL
      |    SELECT count(*) FROM events WHERE event_id%5 = 1 AND event_id%3 = 0)
      |  UNION ALL
      |  SELECT 'md5', count(*) FROM events
      |  WHERE event_id%5 = 2 AND event_id%4 = 1
      |  UNION ALL
      |  SELECT 'clean', count(*) FROM events
      |  WHERE event_id%5 = 3 OR event_id%5 = 4
      |     OR (event_id%5 = 2 AND event_id%4 <> 1)
      |) ORDER BY sink""".stripMargin

  // A1-A6 in closed form over the same synthesized text
  val scanStats: String =
    """WITH t AS (
      |  SELECT CASE event_id%5
      |    WHEN 0 THEN 'saw 10.'||(event_id%20)||'.2.3 in log'
      |    WHEN 1 THEN 'ping evil'||(event_id%3)||'.example.com now'
      |    WHEN 2 THEN 'hash '||md5((event_id%4)::VARCHAR)||' seen'
      |    WHEN 3 THEN 'visit clean'||(event_id%5)||'.org today'
      |    ELSE 'all quiet here' END AS text,
      |    event_id AS e FROM events)
      |SELECT * FROM (
      |  SELECT 'candidates_tested' AS stat, count(*) AS value
      |  FROM t WHERE e%5 < 4
      |  UNION ALL SELECT 'lines_processed', count(*) FROM t
      |  UNION ALL SELECT 'lines_with_matches', count(*) FROM t
      |    WHERE e%5 = 0 OR e%5 = 1 OR (e%5 = 2 AND e%4 = 1)
      |  UNION ALL SELECT 'total_bytes', CAST(SUM(strlen(text)) AS BIGINT) FROM t
      |  UNION ALL SELECT 'total_matches', CAST(SUM(c) AS BIGINT) FROM (
      |    SELECT count(*) AS c FROM t WHERE e%5 = 0
      |    UNION ALL SELECT count(*) FROM t WHERE e%5 = 1
      |    UNION ALL SELECT count(*) FROM t WHERE e%5 = 1 AND e%3 = 0
      |    UNION ALL SELECT count(*) FROM t WHERE e%5 = 2 AND e%4 = 1)
      |) ORDER BY stat""".stripMargin

  val dedupExact: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id,
      |       count(*) AS n_docs
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shingle set expression (k=5), mirroring Dedup.shingles. */
  private def duckShingles(textExpr: String): String =
    s"list_distinct([x FOR x IN [substr($textExpr, i, 5) " +
      s"FOR i IN range(1, greatest(length($textExpr)-4, 1)+1)] " +
      "IF length(x) = 5])"

  /** Distinct word n-gram shingles over a CTE exposing (doc_id, w) with
    * w = lowercased whitespace tokens — the SQL mirror of
    * `Decontaminate.ngramsOfTokens` (minhash shingling).
    */
  private def duckWordShingles(n: Int): String =
    s"list_distinct([array_to_string(list_slice(w, i, i+${n - 1}), ' ') " +
      s"for i in generate_series(1, greatest(len(w)-${n - 1}, 0))])"

  /** Minhash signature array literal over a CTE exposing (doc_id, hs)
    * with hs = one md5 PER SHINGLE ([[duckHsCte]]) — the single SQL mirror
    * of `Dedup.minhashSigTerms` (used by every minhash oracle so the
    * banding definition cannot drift per query): a 60-bit draw (hex chars
    * 1-15) and a 56-bit draw (17-30) from that digest,
    * h_i = (a + i*b) & Mask60 — overflow-free for numHashes <= 64, so
    * DuckDB's checked BIGINT arithmetic reproduces Spark's longs exactly.
    * Staging hs keeps the oracle at one digest per shingle like the Spark
    * side (an inlined md5(s) would re-hash per hash-function term).
    */
  private def duckMinhashSig(numHashes: Int): String = {
    val mask = (1L << 60) - 1
    def a = "CAST('0x'||substr(h,1,15) AS BIGINT)"
    def b = "CAST('0x'||substr(h,17,14) AS BIGINT)"
    (0 until numHashes)
      .map(i => s"list_min(list_transform(hs, h -> ($a + $i * $b) & $mask))")
      .mkString("[", ", ", "]")
  }

  /** The one-digest-per-shingle staging CTE between sh_t and sigs. */
  private val duckHsCte: String =
    "hs_t AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM sh_t)"

  /** Simhash token-hash CTE body `(doc_id, hs)` over a relation exposing
    * (doc_id, text) — one 60-bit draw per DISTINCT lowercase token. The
    * single mirror of TextStats' token hashing, shared by every simhash
    * oracle so the hash definition cannot drift per query.
    */
  private def duckSimhashToks(from: String): String =
    s"""SELECT doc_id,
       |    list_transform(
       |      list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)),
       |      t -> CAST('0x'||substr(md5(t),1,15) AS BIGINT)) AS hs
       |  FROM $from""".stripMargin

  /** Simhash bit-vote fingerprint expression over a CTE exposing `hs` —
    * the single mirror of the Spark side's per-bit majority vote.
    */
  private def duckSimhashVotes(bits: Int): String =
    (0 until bits).map { b =>
      s"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN (1::BIGINT << $b) ELSE 0 END"
    }.mkString(" + ")

  /** Simhash band rows over a CTE `fps(doc_id, fingerprint)`. */
  private def duckSimhashBandRows(bits: Int, bands: Int): String = {
    val r = bits / bands
    // same r=64 guard as Dedup.simhashNearDupPairs: (1L << 64) - 1 is 0
    // under Java's mod-64 shifts, so bands=1 over 64-bit fingerprints
    // needs the all-bits mask spelled explicitly
    val bandMask = if (r >= 64) -1L else (1L << r) - 1
    (0 until bands).map { b =>
      s"SELECT doc_id, fingerprint, $b AS band_idx, (fingerprint >> ${b * r}) & $bandMask AS band_bits FROM fps"
    }.mkString("\n  UNION ALL ")
  }

  /** The capped-bucket CTE (`capped`) over a CTE named `banded`: one side
    * of every band self-join keeps only the `cap` smallest doc_ids per
    * (band_idx, `bandCol`) — the SQL mirror of the uniform skew-guard
    * window, shared by every capped oracle so the cap rule cannot drift.
    */
  private def duckCappedCte(cols: String, bandCol: String,
      cap: Int): String =
    s"""capped AS (
       |  SELECT $cols FROM (
       |    SELECT $cols,
       |      row_number() OVER (PARTITION BY band_idx, $bandCol
       |                         ORDER BY doc_id ASC) AS bpos
       |    FROM banded)
       |  WHERE bpos <= $cap)""".stripMargin

  /** Quality feature CTE body (the `f` relation) over a relation exposing
    * (doc_id, text) — the SQL mirror of TextStats' shared feature
    * expressions (nTokensOfStaged / meanTokenLenExpr / alnumRatioExpr /
    * stopwordHits), shared by every quality oracle.
    */
  private def duckQualityF(from: String): String = {
    val stop = Seq(" the ", " and ", " a ", " of ")
      .map(w => occ("(' '||lower(text)||' ')", w)).mkString(" + ")
    s"""SELECT doc_id,
       |    len(list_filter(string_split_regex(text, '\\s+'),
       |                    t -> len(t) > 0)) AS n_tokens,
       |    CAST(length(text) AS DOUBLE) /
       |      CAST(greatest(len(list_filter(string_split_regex(text, '\\s+'),
       |        t -> len(t) > 0)), 1)
       |        AS DOUBLE) AS mean_token_len,
       |    CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))
       |      AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE)
       |      AS alnum_ratio,
       |    $stop AS stopword_hits
       |  FROM $from""".stripMargin
  }

  /** The first-failing-rule CASE over the `f` relation's feature columns —
    * the SQL mirror of TextStats.failReasonExpr's cascade order. The
    * no_stopwords branch is emitted only when `minStop > 0` (at 0 it can
    * never fire; Spark's cascade agrees vacuously).
    */
  private def duckQualityCase(minTok: Long, maxTok: Long, mtlLo: Double,
      mtlHi: Double, alnumMin: Double, minStop: Long): String = {
    val stopBranch =
      if (minStop > 0)
        s"\n         WHEN stopword_hits < $minStop THEN 'no_stopwords'"
      else ""
    s"""CASE WHEN n_tokens < $minTok THEN 'too_few_tokens'
       |         WHEN n_tokens > $maxTok THEN 'too_many_tokens'
       |         WHEN mean_token_len < $mtlLo OR mean_token_len > $mtlHi
       |           THEN 'mean_token_len'
       |         WHEN alnum_ratio < $alnumMin THEN 'low_alnum_ratio'$stopBranch
       |         END""".stripMargin
  }

  /** UNION ALL band rows over a CTE `sigs(doc_id, sig)` — the SQL mirror
    * of `Dedup.bandedMinhash`'s band-key construction.
    */
  private def duckBandRows(numHashes: Int, bands: Int): String = {
    val r = numHashes / bands
    // sig[1] IS NULL <=> the doc had fewer than k tokens (no shingles);
    // such docs are dropped from banding (mirror of Dedup.bandedMinhash)
    (0 until bands).map { b =>
      s"SELECT doc_id, $b AS band_idx, " +
        s"array_to_string(list_slice(sig, ${b * r + 1}, ${b * r + r}), '#') AS band_key " +
        s"FROM sigs WHERE sig[1] IS NOT NULL"
    }.mkString("\n  UNION ALL ")
  }

  val dedupMinhash: String = {
    val numHashes = 8
    val bands = 4
    val sig = duckMinhashSig(numHashes)
    val bandRows = duckBandRows(numHashes, bands)
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
       |sh_t AS (SELECT doc_id, ${duckWordShingles(5)} AS sh
       |         FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS w FROM d)),
       |$duckHsCte,
       |sigs AS (SELECT doc_id, $sig AS sig FROM hs_t),
       |banded AS (
       |  $bandRows
       |)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM banded a JOIN banded b
       |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |WHERE a.doc_id < b.doc_id
       |ORDER BY 1, 2""".stripMargin
  }

  val dedupSimhash: String = {
    val votes = duckSimhashVotes(32)
    s"""WITH toks AS (
       |  ${duckSimhashToks("documents")}),
       |fps AS (SELECT doc_id, CAST($votes AS BIGINT) AS fingerprint FROM toks)
       |SELECT fingerprint, count(*) AS n_docs,
       |       min(doc_id) AS canonical_doc_id
       |FROM fps GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin
  }

  val dedupNgram: String =
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
       |sh AS (SELECT doc_id, unnest(${duckShingles("text")}) AS shingle FROM d),
       |sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
       |  FROM sh x JOIN sh y ON x.shingle = y.shingle
       |  WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter, sa.set_size AS size_a,
       |       sb.set_size AS size_b,
       |       CAST(inter AS DOUBLE) /
       |         CAST(sa.set_size + sb.set_size - inter AS DOUBLE) AS jaccard
       |FROM pairs
       |JOIN sizes sa ON pairs.doc_a = sa.doc_id
       |JOIN sizes sb ON pairs.doc_b = sb.doc_id
       |WHERE CAST(inter AS DOUBLE) /
       |      CAST(sa.set_size + sb.set_size - inter AS DOUBLE) >= 0.2
       |ORDER BY 1, 2""".stripMargin

  /** Quantized-vector expression mirroring Similarity.quantize. */
  private val qv =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT))"
  private def dot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), p -> p[1]*p[2])) AS BIGINT)"
  /** Mirrors Similarity.cosineQ, INCLUDING its zero-norm guard: the
    * denominator is floored at 1.0 (exact — nonzero quantized norms are
    * >= 1, so the floor only ever bites for zero vectors, where the dot is
    * 0 and cosine 0/1 = 0).
    */
  private def cosine(a: String, b: String): String =
    s"CAST(${dot(a, b)} AS DOUBLE) / " +
      s"greatest(sqrt(CAST(${dot(a, a)} AS DOUBLE)) * " +
      s"sqrt(CAST(${dot(b, b)} AS DOUBLE)), 1.0)"

  val dedupEmbedding: String =
    s"""WITH q AS (SELECT vec_id, $qv AS v FROM embeddings WHERE vec_id < 100)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       ${cosine("a.v", "b.v")} AS cosine
       |FROM q a JOIN q b ON a.vec_id < b.vec_id
       |WHERE ${cosine("a.v", "b.v")} >= 0.2
       |ORDER BY 1, 2""".stripMargin

  val simTopk: String =
    s"""WITH c AS (SELECT vec_id AS corpus_id, $qv AS cq FROM embeddings),
       |q AS (SELECT vec_id AS query_id, $qv AS qq FROM embeddings
       |      WHERE vec_id < 10),
       |scored AS (
       |  SELECT query_id, corpus_id, ${cosine("qq", "cq")} AS cosine
       |  FROM c CROSS JOIN q WHERE corpus_id <> query_id),
       |ranked AS (
       |  SELECT query_id, corpus_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, corpus_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, corpus_id, cosine
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  val simLsh: String = {
    val planes = 6
    def sign(p: Int) =
      s"(CASE WHEN CAST('0x'||substr(md5('p$p-'||CAST(pair[2] AS VARCHAR)),1,1) AS INT)%2 = 0 THEN 1 ELSE -1 END)"
    val bucketBits = (0 until planes).map { p =>
      s"CASE WHEN list_sum(list_transform(list_zip(v, range(length(embedding))), pair -> pair[1] * ${sign(p)})) > 0 THEN (1::BIGINT << $p) ELSE 0 END"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT vec_id, embedding, $qv AS v FROM embeddings WHERE vec_id < 200),
       |wb AS (SELECT vec_id, v, CAST($bucketBits AS BIGINT) AS bucket FROM base),
       |scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS corpus_id,
       |         ${cosine("a.v", "b.v")} AS cosine
       |  FROM wb a JOIN wb b ON a.bucket = b.bucket
       |  WHERE a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT query_id, corpus_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, corpus_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, corpus_id, cosine
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  val dedupNgramCapped: String =
    s"""WITH d AS (SELECT doc_id, 'hotprefix hotprefix '||text AS text
       |           FROM documents WHERE doc_id < 60),
       |sh AS (SELECT doc_id, unnest(${duckShingles("text")}) AS shingle FROM d),
       |sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1),
       |dfc AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
       |kept AS (SELECT sh.doc_id, sh.shingle FROM sh
       |         JOIN dfc ON sh.shingle = dfc.shingle WHERE dfc.df <= 30),
       |pairs AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
       |  FROM kept x JOIN kept y ON x.shingle = y.shingle
       |  WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter, sa.set_size AS size_a,
       |       sb.set_size AS size_b,
       |       CAST(inter AS DOUBLE) /
       |         CAST(sa.set_size + sb.set_size - inter AS DOUBLE) AS jaccard
       |FROM pairs
       |JOIN sizes sa ON pairs.doc_a = sa.doc_id
       |JOIN sizes sb ON pairs.doc_b = sb.doc_id
       |WHERE CAST(inter AS DOUBLE) /
       |      CAST(sa.set_size + sb.set_size - inter AS DOUBLE) >= 0.05
       |ORDER BY 1, 2""".stripMargin

  /** Bucket-bits SQL for table `t`, `planes` hyperplanes (mirrors
    * Similarity.planeSign / lshBucket seeds).
    */
  private def duckBucket(t: Int, planes: Int): String =
    (0 until planes).map { p =>
      val seed = if (t == 0) s"p$p-" else s"t${t}p$p-"
      val sign = s"(CASE WHEN CAST('0x'||substr(md5('$seed'||CAST(pair[2] AS VARCHAR)),1,1) AS INT)%2 = 0 THEN 1 ELSE -1 END)"
      s"CASE WHEN list_sum(list_transform(list_zip(v, range(length(embedding))), pair -> pair[1] * $sign)) > 0 THEN (1::BIGINT << $p) ELSE 0 END"
    }.mkString(" + ")

  val simLshMulti: String = {
    val planes = 4
    val tables = (0 until 3).map { t =>
      s"SELECT vec_id, v, $t AS table_idx, CAST(${duckBucket(t, planes)} AS BIGINT) AS bucket FROM base"
    }.mkString("\n  UNION ALL ")
    s"""WITH base AS (
       |  SELECT vec_id, embedding, $qv AS v FROM embeddings WHERE vec_id < 200),
       |wb AS (
       |  $tables
       |),
       |corpus_capped AS (
       |  SELECT * FROM (
       |    SELECT table_idx, bucket, vec_id AS corpus_id, v AS cv,
       |      row_number() OVER (PARTITION BY table_idx, bucket
       |                         ORDER BY vec_id ASC) AS bpos
       |    FROM wb)
       |  WHERE bpos <= 50),
       |cands AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.corpus_id, q.v AS qv2, c.cv
       |  FROM wb q JOIN corpus_capped c
       |    ON q.table_idx = c.table_idx AND q.bucket = c.bucket
       |  WHERE q.vec_id <> c.corpus_id),
       |scored AS (
       |  SELECT query_id, corpus_id, ${cosine("qv2", "cv")} AS cosine
       |  FROM cands),
       |ranked AS (
       |  SELECT query_id, corpus_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, corpus_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, corpus_id, cosine
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  val simIvf: String = {
    val nlist = 8
    val nprobe = 2
    val cap = 80
    s"""WITH base AS (
       |  SELECT vec_id, $qv AS v FROM embeddings WHERE vec_id < 300),
       |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
       |            AS centroid_id, v AS cv FROM base
       |          ORDER BY vec_id LIMIT $nlist),
       |scored AS (
       |  SELECT b.vec_id, b.v, c.centroid_id,
       |         ${cosine("b.v", "c.cv")} AS ccos
       |  FROM base b CROSS JOIN cents c),
       |ranked AS (
       |  SELECT vec_id, v, centroid_id, ccos,
       |    row_number() OVER (PARTITION BY vec_id
       |                       ORDER BY ccos DESC, centroid_id ASC) AS crank
       |  FROM scored),
       |corpus_capped AS (
       |  SELECT centroid_id, corpus_id, cv2 FROM (
       |    SELECT centroid_id, vec_id AS corpus_id, v AS cv2,
       |      row_number() OVER (PARTITION BY centroid_id
       |                         ORDER BY vec_id ASC) AS bpos
       |    FROM ranked WHERE crank = 1)
       |  WHERE bpos <= $cap),
       |probes AS (
       |  SELECT centroid_id, vec_id AS query_id, v AS qv2
       |  FROM ranked WHERE crank <= $nprobe),
       |cands AS (
       |  SELECT query_id, corpus_id, ${cosine("qv2", "cv2")} AS cosine
       |  FROM probes JOIN corpus_capped USING (centroid_id)
       |  WHERE query_id <> corpus_id),
       |rankedq AS (
       |  SELECT query_id, corpus_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, corpus_id ASC) AS rank
       |  FROM cands)
       |SELECT query_id, CAST(rank AS INT) AS rank, corpus_id, cosine
       |FROM rankedq WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** q44: IVF with 2 seeded Lloyd rounds — mirrors Similarity.ivfCentroids:
    * assignment = argmax cosine (ties by centroid order), update =
    * element-wise floor division sum/count in pure integer arithmetic
    * ((s - ((s%c)+c)%c) / c), empty clusters keep their centroid.
    */
  val simIvfLloyd: String = {
    val nlist = 8
    val nprobe = 2
    val cap = 80
    // one Lloyd round: assign `base` to `cin` centroids, emit `cout`
    def lloyd(cin: String, cout: String): String =
      s"""assigned_$cout AS (
         |  SELECT vec_id, v, centroid_id FROM (
         |    SELECT b.vec_id, b.v, c.centroid_id,
         |      row_number() OVER (PARTITION BY b.vec_id
         |        ORDER BY ${cosine("b.v", "c.cv")} DESC, c.centroid_id ASC)
         |        AS crank
         |    FROM base b CROSS JOIN $cin c)
         |  WHERE crank = 1),
         |exploded_$cout AS (
         |  SELECT centroid_id, generate_subscripts(v, 1) AS pos,
         |         unnest(v) AS x
         |  FROM assigned_$cout),
         |comp_$cout AS (
         |  SELECT centroid_id, pos,
         |    CAST((s - ((s % c) + c) % c) / c AS BIGINT) AS comp
         |  FROM (SELECT centroid_id, pos, sum(x) AS s, count(*) AS c
         |        FROM exploded_$cout GROUP BY 1, 2)),
         |new_$cout AS (
         |  SELECT centroid_id, list(comp ORDER BY pos) AS cv
         |  FROM comp_$cout GROUP BY 1),
         |$cout AS (
         |  SELECT p.centroid_id, COALESCE(n.cv, p.cv) AS cv
         |  FROM $cin p LEFT JOIN new_$cout n USING (centroid_id))""".stripMargin
    s"""WITH base AS (
       |  SELECT vec_id, $qv AS v FROM embeddings WHERE vec_id < 300),
       |cents0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
       |             AS centroid_id, v AS cv FROM base
       |           ORDER BY vec_id LIMIT $nlist),
       |${lloyd("cents0", "cents1")},
       |${lloyd("cents1", "cents2")},
       |scored AS (
       |  SELECT b.vec_id, b.v, c.centroid_id,
       |         ${cosine("b.v", "c.cv")} AS ccos
       |  FROM base b CROSS JOIN cents2 c),
       |ranked AS (
       |  SELECT vec_id, v, centroid_id, ccos,
       |    row_number() OVER (PARTITION BY vec_id
       |                       ORDER BY ccos DESC, centroid_id ASC) AS crank
       |  FROM scored),
       |corpus_capped AS (
       |  SELECT centroid_id, corpus_id, cv2 FROM (
       |    SELECT centroid_id, vec_id AS corpus_id, v AS cv2,
       |      row_number() OVER (PARTITION BY centroid_id
       |                         ORDER BY vec_id ASC) AS bpos
       |    FROM ranked WHERE crank = 1)
       |  WHERE bpos <= $cap),
       |probes AS (
       |  SELECT centroid_id, vec_id AS query_id, v AS qv2
       |  FROM ranked WHERE crank <= $nprobe),
       |cands AS (
       |  SELECT query_id, corpus_id, ${cosine("qv2", "cv2")} AS cosine
       |  FROM probes JOIN corpus_capped USING (centroid_id)
       |  WHERE query_id <> corpus_id),
       |rankedq AS (
       |  SELECT query_id, corpus_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, corpus_id ASC) AS rank
       |  FROM cands)
       |SELECT query_id, CAST(rank AS INT) AS rank, corpus_id, cosine
       |FROM rankedq WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  val dedupEmbeddingLsh: String = {
    val planes = 4
    s"""WITH base AS (
       |  SELECT vec_id, embedding, $qv AS v FROM embeddings WHERE vec_id < 300),
       |wb AS (SELECT vec_id, v,
       |  CAST(${duckBucket(0, planes)} AS BIGINT) AS bucket FROM base)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       ${cosine("a.v", "b.v")} AS cosine
       |FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE ${cosine("a.v", "b.v")} >= 0.2
       |ORDER BY 1, 2""".stripMargin
  }

  val dedupSimhashNear: String = {
    val votes = duckSimhashVotes(32)
    val bandRows = duckSimhashBandRows(32, 4)
    s"""WITH toks AS (
       |  ${duckSimhashToks("documents WHERE doc_id < 200")}),
       |fps AS (SELECT doc_id, CAST($votes AS BIGINT) AS fingerprint FROM toks),
       |banded AS (
       |  $bandRows
       |),
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |         x.fingerprint AS fp_a, y.fingerprint AS fp_b
       |  FROM banded x JOIN banded y
       |    ON x.band_idx = y.band_idx AND x.band_bits = y.band_bits
       |  WHERE x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
       |FROM cands WHERE bit_count(xor(fp_a, fp_b)) <= 3
       |ORDER BY 1, 2""".stripMargin
  }

  /** Flood fixture shared by q38/q39 (mirrors QueryDefs.floodDocs). */
  private val floodDocsSql: String =
    """SELECT CAST(event_id AS BIGINT) AS doc_id,
      |    CASE WHEN event_id%6 <> 0
      |      THEN 'identical flood document body repeated verbatim many times'
      |      ELSE 'unique doc '||event_id END AS text
      |  FROM events WHERE event_id < 1200""".stripMargin

  val dedupMinhashCapped: String = {
    val numHashes = 8
    val bands = 4
    val sig = duckMinhashSig(numHashes)
    val bandRows = duckBandRows(numHashes, bands)
    s"""WITH d AS ($floodDocsSql),
       |sh_t AS (SELECT doc_id, ${duckWordShingles(5)} AS sh
       |         FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS w FROM d)),
       |$duckHsCte,
       |sigs AS (SELECT doc_id, $sig AS sig FROM hs_t),
       |banded AS (
       |  $bandRows
       |),
       |${duckCappedCte("doc_id, band_idx, band_key", "band_key", 10)}
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM capped a JOIN banded b
       |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |WHERE a.doc_id < b.doc_id
       |ORDER BY 1, 2""".stripMargin
  }

  /** Transitive closure via a recursive CTE: cluster_id = min doc_id
    * reachable through the (capped) minhash near-dup pairs.
    */
  val dedupClusters: String = {
    val numHashes = 8
    val bands = 4
    val sig = duckMinhashSig(numHashes)
    val bandRows = duckBandRows(numHashes, bands)
    s"""WITH RECURSIVE d AS ($floodDocsSql),
       |sh_t AS (SELECT doc_id, ${duckWordShingles(5)} AS sh
       |         FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS w FROM d)),
       |$duckHsCte,
       |sigs AS (SELECT doc_id, $sig AS sig FROM hs_t),
       |banded AS (
       |  $bandRows
       |),
       |${duckCappedCte("doc_id, band_idx, band_key", "band_key", 10)},
       |prs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM capped a JOIN banded b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |  WHERE a.doc_id < b.doc_id),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM prs
       |      UNION ALL SELECT doc_b, doc_a FROM prs),
       |reach AS (
       |  SELECT doc_id AS doc, doc_id AS root FROM d
       |  UNION
       |  SELECT e.b, reach.root FROM reach JOIN e ON reach.doc = e.a
       |)
       |SELECT doc AS doc_id, min(root) AS cluster_id,
       |       (doc = min(root)) AS is_canonical
       |FROM reach GROUP BY doc ORDER BY doc""".stripMargin
  }

  val dedupSimhashCapped: String = {
    val votes = duckSimhashVotes(32)
    val bandRows = duckSimhashBandRows(32, 4)
    s"""WITH d AS ($floodDocsSql),
       |toks AS (
       |  ${duckSimhashToks("d")}),
       |fps AS (SELECT doc_id, CAST($votes AS BIGINT) AS fingerprint FROM toks),
       |banded AS (
       |  $bandRows
       |),
       |${duckCappedCte("doc_id, fingerprint, band_idx, band_bits",
          "band_bits", 10)},
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |         x.fingerprint AS fp_a, y.fingerprint AS fp_b
       |  FROM capped x JOIN banded y
       |    ON x.band_idx = y.band_idx AND x.band_bits = y.band_bits
       |  WHERE x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
       |FROM cands WHERE bit_count(xor(fp_a, fp_b)) <= 3
       |ORDER BY 1, 2""".stripMargin
  }

  // q34 closed form: the glob matches every extracted mixed-case domain
  // after lowercase normalization; the literal additionally matches m==3
  val lookupCase: String =
    """SELECT * FROM (
      |  SELECT 'HoSt'||(event_id%10)||'.ExAmple.com' AS value,
      |         'HOST3.ExAmple.COM' AS entry, count(*) AS n
      |  FROM events WHERE event_id%10 = 3 GROUP BY 1,2
      |  UNION ALL
      |  SELECT 'HoSt'||(event_id%10)||'.ExAmple.com', '*.EXAMPLE.com', count(*)
      |  FROM events GROUP BY 1,2
      |) ORDER BY value, entry""".stripMargin

  /** Marker-hit count, mirroring TextStats.occurrences (plain replace —
    * markers contain no regex metachars).
    */
  private def occ(hay: String, needle: String): String =
    s"CAST((length($hay) - length(replace($hay, '$needle', ''))) / ${needle.length} AS INT)"

  val textLang: String = {
    val padded = "(' '||lower(text)||' ')"
    val scores = TextStats.markers.map { case (lang, words) =>
      lang -> words.map(w => occ(padded, w)).mkString(" + ")
    }
    val (sDe, sEn, sEs, sFr) = (scores(0)._2, scores(1)._2, scores(2)._2,
      scores(3)._2)
    s"""WITH s AS (SELECT $sDe AS de, $sEn AS en, $sEs AS es, $sFr AS fr
       |           FROM documents)
       |SELECT CASE
       |    WHEN de IS NULL THEN NULL
       |    WHEN de = 0 AND en = 0 AND es = 0 AND fr = 0 THEN 'und'
       |    WHEN de >= en AND de >= es AND de >= fr THEN 'de'
       |    WHEN en >= es AND en >= fr THEN 'en'
       |    WHEN es >= fr THEN 'es'
       |    ELSE 'fr' END AS lang_detected,
       |  count(*) AS n
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val textQuality: String = {
    val stop = Seq(" the ", " and ", " a ", " of ")
      .map(w => occ("(' '||lower(text)||' ')", w)).mkString(" + ")
    s"""SELECT doc_id,
       |  length(text) AS n_chars_m,
       |  len(list_filter(string_split_regex(text, '\\s+'),
       |      t -> len(t) > 0)) AS n_tokens,
       |  CASE WHEN length(trim(text)) = 0 THEN 0
       |       ELSE CAST(list_sum(list_transform(
       |         string_split_regex(trim(text), '\\s+'),
       |         w -> CAST(ceil(CAST(length(w) AS DOUBLE)/4.0) AS BIGINT))) AS BIGINT)
       |       END AS n_subwords,
       |  CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS DOUBLE)
       |    / CAST(greatest(length(text), 1) AS DOUBLE) AS alnum_ratio,
       |  CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
       |    / CAST(greatest(length(text), 1) AS DOUBLE) AS space_ratio,
       |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
       |    / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
       |  $stop AS stopword_hits,
       |  CAST(length(text) AS DOUBLE) /
       |    CAST(greatest(len(list_filter(string_split_regex(text, '\\s+'),
       |      t -> len(t) > 0)), 1) AS DOUBLE)
       |    AS mean_token_len
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val textQualityFilter: String =
    s"""WITH f AS (
       |  ${duckQualityF("documents")}),
       |v AS (
       |  SELECT doc_id,
       |    ${duckQualityCase(25, 90, 4.8, 6.0, 0.81, 1)} AS fail_reason
       |  FROM f)
       |SELECT doc_id, (fail_reason IS NULL) AS keep, fail_reason
       |FROM v ORDER BY doc_id""".stripMargin

  val textTokens: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split_regex(text, '\s+'),
      |       t -> len(t) > 0)) AS BIGINT)
      |    AS n_ws_tokens,
      |  CAST(length(regexp_extract_all(text,
      |       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT)
      |    AS n_bpeish_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  val textFingerprint: String =
    """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |       count(*) AS n_docs, min(doc_id) AS canonical_doc_id
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  val tpchAgg: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  val joinBroadcast: String =
    """SELECT c_mktsegment, count(*) AS n,
      |       CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT)
      |         AS cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val windowFirstOrder: String =
    """SELECT o_custkey, o_orderkey AS first_orderkey FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  val eventsHourly: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
      |       CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** q43: the CSV feed literal mirrors QueryDefs.qLookupExtras with TYPED
    * values — the per-cell inference (i64->Int32 truncating, f64, bool;
    * match_cmd.rs:83-93) is closed-form, so host4's ttl 6442450944 appears
    * here already truncated to -2147483648. Empty CSV cells (absent
    * extra-map keys on the Spark side) coalesce to ''/-1/-1.0/false.
    */
  val lookupExtras: String =
    """SELECT c.value AS value, i.category AS category,
      |       i.campaign AS campaign, i.actor AS actor,
      |       CAST(coalesce(i.ttl, -1) AS BIGINT) AS ttl,
      |       CAST(coalesce(i.score, -1.0) AS DOUBLE) AS score,
      |       coalesce(i.verified, false) AS verified,
      |       count(*) AS n
      |FROM (SELECT 'host'||(event_id%50)||'.example.com' AS value
      |      FROM events) c
      |JOIN (VALUES
      |        ('host0.example.com','c2','alpha','APT-0',3600,0.5,true),
      |        ('host1.example.com','c2','beta','APT-1',7200,1.25,false),
      |        ('host2.example.com','phish','gamma','APT-2',NULL,NULL,true),
      |        ('host3.example.com','c2','delta','',900,2.5,NULL),
      |        ('host4.example.com','c2','epsilon','APT-4',
      |         -2147483648,0.125,true))
      |     i(entry, category, campaign, actor, ttl, score, verified)
      |  ON c.value = i.entry
      |GROUP BY 1,2,3,4,5,6,7 ORDER BY 1""".stripMargin

  /** q56: the JSON-feed typed-metadata mirror — all rendered values as
    * closed-form string literals: host0's ttl is "3600" (Int32 per VALUE;
    * a per-column inference would have widened it to host1's double and
    * rendered "3600.0"), host2's big is u64::MAX verbatim, host3's 2^64
    * takes the as_f64 fallback (JDK shortest-roundtrip form). Empty
    * strings mirror the Spark side's coalesce of absent keys.
    */
  val lookupExtrasJson: String =
    """SELECT c.value AS value, i.category AS category, i.ttl AS ttl,
      |       i.verified AS verified, i.port AS port, i.big AS big,
      |       count(*) AS n
      |FROM (SELECT 'host'||(event_id%50)||'.example.com' AS value
      |      FROM events) c
      |JOIN (VALUES
      |        ('host0.example.com','c2','3600','true','',''),
      |        ('host1.example.com','c2','7200.5','','0443',''),
      |        ('host2.example.com','phish','','','',
      |         '18446744073709551615'),
      |        ('host3.example.com','c2','','','',
      |         '1.8446744073709552E19'))
      |     i(entry, category, ttl, verified, port, big)
      |  ON c.value = i.entry
      |GROUP BY 1,2,3,4,5,6 ORDER BY 1""".stripMargin

  /** q45: closed-form prediction of the redacted text — the four planted
    * families collapse to typed placeholders, the strict-grammar rejects
    * (999.1.2.3, 192.168.01.7) and surrounding prose survive verbatim, and
    * the email/email-domain overlap yields ONE [REDACTED:email].
    */
  val redactIocs: String =
    """SELECT 'sess'||(event_id%7)
      |       ||' from [REDACTED:ipv4] to 999.1.2.3 mail [REDACTED:email] hash '
      |       ||'[REDACTED:md5] visit [REDACTED:domain] end 192.168.01.7 port '
      |       ||(event_id%100) AS red,
      |       count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** q46: the defanged plants refang to live indicators whose extraction
    * is already closed-form (q01/q03/q04-proven behaviors: URL-context
    * domain, strict ipv4, email + contained-domain double extraction).
    */
  val extractDefanged: String =
    """SELECT * FROM (
      |  SELECT 'domain' AS indicator_type,
      |         'mal'||(event_id%50)||'.example.com' AS value, count(*) AS n
      |  FROM events GROUP BY 2
      |  UNION ALL
      |  SELECT 'domain', 'mail'||(user_id%5)||'.org', count(*)
      |  FROM events GROUP BY 2
      |  UNION ALL
      |  SELECT 'ipv4',
      |         '10.'||(user_id%200)||'.'||(event_id%250)||'.'||(event_id%9),
      |         count(*)
      |  FROM events GROUP BY 2
      |  UNION ALL
      |  SELECT 'email', 'bob'||(event_id%20)||'@mail'||(user_id%5)||'.org',
      |         count(*)
      |  FROM events GROUP BY 2
      |) ORDER BY indicator_type, value""".stripMargin

  /** The q48/q59 shared derived multi-line corpus CTE pair (`c`,
    * `corpus`) — the SQL mirror of QueryDefs.derivedLineCorpus, single-
    * sourced so the two fixtures cannot drift (review find: this shape
    * previously lived in four places). string_agg ORDER BY (doc_id, text)
    * mirrors the Spark side's array_sort over struct(doc_id, text).
    */
  private def duckDerivedCorpus(idAs: String, textAs: String): String =
    s"""c AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id, text FROM documents WHERE doc_id < 60
       |),
       |corpus AS (
       |  SELECT doc_id % 40 AS $idAs,
       |         string_agg(text, chr(10) ORDER BY doc_id, text) AS $textAs
       |  FROM c GROUP BY 1
       |)""".stripMargin

  /** q47: word-4-gram decontamination counts, closed form in DuckDB (list
    * comprehension over generate_series; normalization mirrors the
    * simhash/tokenizer whitespace split).
    */
  val decontaminate: String =
    """WITH g AS (
      |  SELECT doc_id,
      |         [array_to_string(list_slice(w, i, i+3), ' ')
      |          for i in generate_series(1, greatest(len(w)-3, 0))] AS grams
      |  FROM (SELECT doc_id,
      |               list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS w
      |        FROM documents)
      |),
      |eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id%11=0),
      |tg AS (SELECT doc_id, unnest(list_distinct(grams)) AS gram
      |       FROM g WHERE doc_id%11<>0)
      |SELECT doc_id, count(*) AS shared_ngrams
      |FROM tg JOIN eg USING (gram)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q48 mirror: derived multi-line corpus (40 groups, docs 0..59 appended
    * once more), Gopher duplicate-line fractions via unnest+group, top
    * word-2-gram by multiplicity with the (count DESC, gram ASC) tie-break,
    * and the two-rule keep/drop. All fractions are exact-integer divisions,
    * so the doubles hash-match Spark's.
    */
  val textRepetition: String =
    s"""WITH ${duckDerivedCorpus("g", "txt")},
      |lines AS (
      |  SELECT g, unnest(string_split(txt, chr(10))) AS line FROM corpus
      |),
      |per_line AS (
      |  SELECT g, line, count(*) AS c, length(line) AS len
      |  FROM lines GROUP BY 1, 2
      |),
      |rep AS (
      |  SELECT g,
      |    CAST(sum(c) AS BIGINT) AS n_lines,
      |    CAST(sum(c) - count(*) AS DOUBLE) / CAST(greatest(sum(c), 1) AS DOUBLE)
      |      AS dup_line_frac,
      |    CAST(sum((c - 1) * len) AS DOUBLE) /
      |      CAST(greatest(sum(c * len), 1) AS DOUBLE) AS dup_line_char_frac
      |  FROM per_line GROUP BY 1
      |),
      |tok AS (
      |  SELECT g, length(txt) AS doc_len,
      |         list_filter(string_split_regex(lower(txt), '\\s+'), t -> len(t) > 0) AS w
      |  FROM corpus
      |),
      |grams AS (
      |  SELECT g, doc_len,
      |         unnest([array_to_string(list_slice(w, i, i+1), ' ')
      |                 for i in generate_series(1, greatest(len(w)-1, 0))])
      |           AS gram
      |  FROM tok
      |),
      |gc AS (
      |  SELECT g, doc_len, gram, count(*) AS c FROM grams GROUP BY 1, 2, 3
      |),
      |top AS (
      |  SELECT g, gram AS top_gram, CAST(c AS BIGINT) AS top_gram_n,
      |    CAST(c * length(gram) AS DOUBLE) /
      |      CAST(greatest(doc_len, 1) AS DOUBLE) AS top_gram_char_frac,
      |    row_number() OVER (PARTITION BY g ORDER BY c DESC, gram) AS rn
      |  FROM gc
      |),
      |joined AS (
      |  SELECT rep.g, n_lines, dup_line_frac, dup_line_char_frac,
      |         top_gram, top_gram_n, top_gram_char_frac,
      |    CASE WHEN dup_line_frac > 0.1 THEN 'dup_lines'
      |         WHEN top_gram_char_frac > 0.016 THEN 'top_2gram'
      |         END AS fail_reason
      |  FROM rep JOIN top ON rep.g = top.g AND top.rn = 1
      |)
      |SELECT g, n_lines, dup_line_frac, dup_line_char_frac, top_gram,
      |       top_gram_n, top_gram_char_frac, fail_reason,
      |       (fail_reason IS NULL) AS keep
      |FROM joined ORDER BY g""".stripMargin

  // goldTurns mirror shared by the conversation-rollup oracles (same
  // synthesized text as scanStats/matchGold, plus the transcript columns)
  private val goldTurnsSql: String =
    """SELECT 'conv-'||(user_id%50) AS conv_id,
      |       event_id AS turn_idx,
      |       event_type AS role,
      |       CASE event_id%5
      |         WHEN 0 THEN 'saw 10.'||(event_id%20)||'.2.3 in log'
      |         WHEN 1 THEN 'ping evil'||(event_id%3)||'.example.com now'
      |         WHEN 2 THEN 'hash '||md5((event_id%4)::VARCHAR)||' seen'
      |         WHEN 3 THEN 'visit clean'||(event_id%5)||'.org today'
      |         ELSE 'all quiet here' END AS text,
      |       ts
      |FROM events""".stripMargin

  /** q49 mirror: per-conversation rollup — exact integer arithmetic
    * (epoch_us spans match Spark's unix_micros) and the INJECTIVE
    * fixed-width per-turn-digest fingerprint (md5(role)||md5(text) per
    * turn, concatenated in turn order — mirrors
    * Conversations.digestSerialized).
    */
  val convStats: String =
    s"""WITH t AS ($goldTurnsSql)
       |SELECT conv_id,
       |  count(*) AS n_turns,
       |  CAST(len(list_distinct(list(role))) AS BIGINT) AS n_roles,
       |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
       |  CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS span_us,
       |  md5(string_agg(
       |    coalesce(md5(role), repeat('0', 32)) ||
       |    coalesce(md5(text), repeat('0', 32)), '' ORDER BY turn_idx))
       |    AS fp
       |FROM t GROUP BY 1 ORDER BY conv_id""".stripMargin

  /** q50 mirror: whole-conversation exact dedup with conversations 0..9
    * re-ingested under a "dup-" prefix.
    */
  val convDedup: String =
    s"""WITH t AS ($goldTurnsSql),
       |all_t AS (
       |  SELECT * FROM t
       |  UNION ALL
       |  SELECT 'dup-'||conv_id, turn_idx, role, text, ts FROM t
       |  WHERE conv_id IN (${(0 until 10).map(i => s"'conv-$i'").mkString(", ")})
       |),
       |fp AS (
       |  SELECT conv_id,
       |    md5(string_agg(
       |      coalesce(md5(role), repeat('0', 32)) ||
       |      coalesce(md5(text), repeat('0', 32)), '' ORDER BY turn_idx))
       |      AS fp
       |  FROM all_t GROUP BY 1
       |)
       |SELECT fp, count(*) AS n_convs, min(conv_id) AS canonical_conv_id
       |FROM fp GROUP BY 1 ORDER BY fp""".stripMargin

  /** q51 mirror: SemDeDup — init-only centroid assignment, within-cluster
    * pairs capped at 40 participants per cluster, keep-first drop rule.
    * Centroids are RENUMBERED 0..nlist-1 by vec_id order exactly like
    * Similarity.ivfCentroids (row_number, not the raw vec_id — the raw id
    * only coincides when the fixture's ids happen to start at 0).
    */
  val semDedup: String =
    s"""WITH base AS (
       |  SELECT vec_id, $qv AS v FROM embeddings WHERE vec_id < 300),
       |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
       |            AS centroid_id, v AS cv FROM base
       |          ORDER BY vec_id LIMIT 8),
       |ranked AS (
       |  SELECT vec_id, v, centroid_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY ${cosine("v", "cv")} DESC, centroid_id ASC) AS crank
       |  FROM base CROSS JOIN cents),
       |a AS (SELECT centroid_id, vec_id, v FROM ranked WHERE crank = 1),
       |capped AS (
       |  SELECT centroid_id, vec_id, v FROM (
       |    SELECT *, row_number() OVER (PARTITION BY centroid_id
       |      ORDER BY vec_id ASC) AS bpos FROM a)
       |  WHERE bpos <= 40),
       |dups AS (
       |  SELECT x.vec_id, min(y.vec_id) AS dup_of
       |  FROM capped x JOIN capped y
       |    ON x.centroid_id = y.centroid_id AND x.vec_id > y.vec_id
       |  WHERE ${cosine("x.v", "y.v")} >= 0.35
       |  GROUP BY 1)
       |SELECT a.vec_id, a.centroid_id, dups.dup_of,
       |       (dups.dup_of IS NULL) AS keep
       |FROM a LEFT JOIN dups ON a.vec_id = dups.vec_id
       |ORDER BY a.vec_id""".stripMargin

  /** q52: the composed curation audit — quality CTEs (q42 thresholds),
    * capped-minhash CC (q41's recursive closure) and 4-gram contamination
    * (q47), joined per train doc with the same stage precedence as
    * `Curation.curate`.
    */
  val curate: String = {
    val numHashes = 8
    val bands = 4
    val sig = duckMinhashSig(numHashes)
    val bandRows = duckBandRows(numHashes, bands)
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id%11<>0),
       |f AS (
       |  ${duckQualityF("d")}),
       |v AS (
       |  SELECT doc_id,
       |    ${duckQualityCase(25, 90, 4.8, 6.0, 0.81, 1)} AS quality_fail
       |  FROM f),
       |sh_t AS (SELECT doc_id, ${duckWordShingles(5)} AS sh
       |         FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS w FROM d)),
       |$duckHsCte,
       |sigs AS (SELECT doc_id, $sig AS sig FROM hs_t),
       |banded AS (
       |  $bandRows
       |),
       |${duckCappedCte("doc_id, band_idx, band_key", "band_key", 10)},
       |prs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM capped a JOIN banded b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |  WHERE a.doc_id < b.doc_id),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM prs
       |      UNION ALL SELECT doc_b, doc_a FROM prs),
       |reach AS (
       |  SELECT doc_id AS doc, doc_id AS root FROM d
       |  UNION
       |  SELECT e.b, reach.root FROM reach JOIN e ON reach.doc = e.a
       |),
       |cc AS (SELECT doc AS doc_id, min(root) AS cluster_id
       |       FROM reach GROUP BY doc),
       |g AS (
       |  SELECT doc_id,
       |         [array_to_string(list_slice(w, i, i+3), ' ')
       |          for i in generate_series(1, greatest(len(w)-3, 0))] AS grams
       |  FROM (SELECT doc_id,
       |               list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS w
       |        FROM documents)
       |),
       |eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id%11=0),
       |tg AS (SELECT doc_id, unnest(list_distinct(grams)) AS gram
       |       FROM g WHERE doc_id%11<>0),
       |s AS (SELECT doc_id, count(*) AS shared FROM tg JOIN eg USING (gram)
       |      GROUP BY 1),
       |j AS (
       |  SELECT d.doc_id, v.quality_fail, cc.cluster_id,
       |         CAST(coalesce(s.shared, 0) AS BIGINT) AS shared_ngrams
       |  FROM d JOIN v USING (doc_id) JOIN cc USING (doc_id)
       |  LEFT JOIN s ON s.doc_id = d.doc_id),
       |verdict AS (
       |  SELECT doc_id, cluster_id, shared_ngrams,
       |    CASE WHEN quality_fail IS NOT NULL THEN 'quality:'||quality_fail
       |         WHEN doc_id <> cluster_id THEN 'near_dup'
       |         WHEN shared_ngrams >= 1 THEN 'contaminated'
       |         END AS drop_stage
       |  FROM j)
       |SELECT doc_id, cluster_id, shared_ngrams, drop_stage,
       |       (drop_stage IS NULL) AS keep
       |FROM verdict ORDER BY doc_id""".stripMargin
  }

  /** q53: the split thresholds are the SAME integer literals the Spark op
    * uses (Sampling.splitBounds) — no float re-derivation in SQL.
    */
  val split: String = {
    val bounds = graft.ops.Sampling
      .splitBounds(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val cases = bounds.init
      .map { case (n, b) => s"WHEN h < $b THEN '$n'" }
      .mkString(" ")
    s"""SELECT doc_id,
       |  CASE WHEN doc_id IS NULL THEN NULL
       |       $cases ELSE '${bounds.last._1}' END AS split
       |FROM (SELECT doc_id,
       |        CAST('0x'||substr(md5('v1:'||doc_id),1,15) AS BIGINT) AS h
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** q55: the conversation→curation bridge — transcripts reconstructed
    * from the gold turn table (string_agg ORDER BY turn_idx mirrors
    * `Conversations.transcriptText`'s array_sort on unique turn_idx), then
    * the same composed audit as [[curate]] with q55's parameters
    * (k=7 shingles, maxBandDf=10, 13-gram contamination, minShared=4) and
    * conv-id STRING cluster labels (min over VARCHAR is lexicographic in
    * both engines). Eval split = conv ids whose numeric suffix % 10 = 0.
    * No stopword CTE: minStopwordHits=0 means the rule can never fire.
    */
  val convCurate: String = {
    val numHashes = 8
    val bands = 4
    val sig = duckMinhashSig(numHashes)
    val bandRows = duckBandRows(numHashes, bands)
    s"""WITH RECURSIVE t AS ($goldTurnsSql),
       |tr AS (
       |  SELECT conv_id AS doc_id,
       |         string_agg(coalesce(role,'')||': '||coalesce(text,''),
       |                    chr(10) ORDER BY turn_idx) AS text
       |  FROM t GROUP BY 1),
       |d AS (SELECT doc_id, text FROM tr
       |      WHERE CAST(string_split(doc_id,'-')[2] AS INT)%10<>0),
       |f AS (
       |  ${duckQualityF("d")}),
       |v AS (
       |  SELECT doc_id,
       |    ${duckQualityCase(740, 920, 7.6, 8.3, 0.80, 0)} AS quality_fail
       |  FROM f),
       |sh_t AS (SELECT doc_id, ${duckWordShingles(7)} AS sh
       |         FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS w FROM d)),
       |$duckHsCte,
       |sigs AS (SELECT doc_id, $sig AS sig FROM hs_t),
       |banded AS (
       |  $bandRows
       |),
       |${duckCappedCte("doc_id, band_idx, band_key", "band_key", 10)},
       |prs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM capped a JOIN banded b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |  WHERE a.doc_id < b.doc_id),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM prs
       |      UNION ALL SELECT doc_b, doc_a FROM prs),
       |reach AS (
       |  SELECT doc_id AS doc, doc_id AS root FROM d
       |  UNION
       |  SELECT e.b, reach.root FROM reach JOIN e ON reach.doc = e.a
       |),
       |cc AS (SELECT doc AS doc_id, min(root) AS cluster_id
       |       FROM reach GROUP BY doc),
       |g AS (
       |  SELECT doc_id,
       |         [array_to_string(list_slice(w, i, i+12), ' ')
       |          for i in generate_series(1, greatest(len(w)-12, 0))]
       |           AS grams
       |  FROM (SELECT doc_id,
       |               list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS w
       |        FROM tr)
       |),
       |eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g
       |       WHERE CAST(string_split(doc_id,'-')[2] AS INT)%10=0),
       |tg AS (SELECT doc_id, unnest(list_distinct(grams)) AS gram FROM g
       |       WHERE CAST(string_split(doc_id,'-')[2] AS INT)%10<>0),
       |s AS (SELECT doc_id, count(*) AS shared FROM tg JOIN eg USING (gram)
       |      GROUP BY 1),
       |j AS (
       |  SELECT d.doc_id, v.quality_fail, cc.cluster_id,
       |         CAST(coalesce(s.shared, 0) AS BIGINT) AS shared_ngrams
       |  FROM d JOIN v USING (doc_id) JOIN cc USING (doc_id)
       |  LEFT JOIN s ON s.doc_id = d.doc_id),
       |verdict AS (
       |  SELECT doc_id, cluster_id, shared_ngrams,
       |    CASE WHEN quality_fail IS NOT NULL THEN 'quality:'||quality_fail
       |         WHEN doc_id <> cluster_id THEN 'near_dup'
       |         WHEN shared_ngrams >= 4 THEN 'contaminated'
       |         END AS drop_stage
       |  FROM j)
       |SELECT doc_id, cluster_id, shared_ngrams, drop_stage,
       |       (drop_stage IS NULL) AS keep
       |FROM verdict ORDER BY doc_id""".stripMargin
  }

  /** q57: ExactSubstr duplicate-span statistics — positional word-8-gram
    * windows (one md5 per window, the Spark side's gram hash), cross-doc
    * flag via min(doc_id) <> max(doc_id), and interval-union coverage by
    * the same sorted lag window as Dedup.exactSubstrStats. `dup_frac` is
    * one integer/integer division — bit-identical doubles.
    */
  val dedupSubstr: String = {
    val n = 8
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS w
       |  FROM documents),
       |pg AS (
       |  SELECT doc_id, w,
       |    unnest(generate_series(1, greatest(len(w)-${n - 1}, 0))) AS i
       |  FROM toks),
       |grams AS (
       |  SELECT doc_id, i - 1 AS pos,
       |    md5(array_to_string(list_slice(w, i, i+${n - 1}), ' ')) AS gh
       |  FROM pg),
       |dup AS (
       |  SELECT gh FROM grams GROUP BY gh HAVING min(doc_id) <> max(doc_id)),
       |cov AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS dup_tokens FROM (
       |    SELECT doc_id,
       |      coalesce(least($n, pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)), $n) AS c
       |    FROM grams JOIN dup USING (gh)) GROUP BY doc_id)
       |SELECT t.doc_id,
       |  CAST(coalesce(len(w), 0) AS BIGINT) AS n_tokens,
       |  coalesce(dup_tokens, 0) AS dup_tokens,
       |  CASE WHEN coalesce(len(w), 0) > 0
       |       THEN CAST(coalesce(dup_tokens, 0) AS DOUBLE) / len(w)
       |       ELSE 0.0 END AS dup_frac
       |FROM toks t LEFT JOIN cov USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** q54: deterministic downsample keep set, same integer threshold. */
  val sample: String = {
    val bound = graft.ops.Sampling.rateBound(0.25)
    s"""SELECT doc_id
       |FROM (SELECT doc_id,
       |        CAST('0x'||substr(md5('s1:'||doc_id),1,15) AS BIGINT) AS h
       |      FROM documents)
       |WHERE h < $bound
       |ORDER BY doc_id""".stripMargin
  }

  /** q59: corpus-level line dedup over q48's derived corpus — per-line
    * md5 keys, count(*) >= 2 hot set, anti-join, ordered reassembly. The
    * cleaned text compares byte-exactly.
    */
  val textLineDedup: String =
    s"""WITH ${duckDerivedCorpus("doc_id", "text")},
      |sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus),
      |lx AS (
      |  SELECT doc_id, pos, ls[pos] AS line, md5(ls[pos]) AS lh
      |  FROM (SELECT doc_id, ls,
      |          unnest(generate_series(1, len(ls))) AS pos
      |        FROM sp)
      |),
      |hot AS (SELECT lh FROM lx GROUP BY lh HAVING count(*) >= 2),
      |reb AS (
      |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
      |         count(*) AS n_kept
      |  FROM lx ANTI JOIN hot USING (lh)
      |  GROUP BY 1
      |)
      |SELECT s.doc_id,
      |  coalesce(r.text, '') AS text,
      |  CAST(len(s.ls) AS BIGINT) AS n_lines,
      |  CAST(len(s.ls) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
      |FROM sp s LEFT JOIN reb r USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q60: gap-based sessionization — the same boundary rule (first event
    * or >2h since the previous one) via lag + running sum over integer
    * microseconds, then the per-session rollup.
    */
  val sessionize: String =
    """WITH b AS (
      |  SELECT user_id, ts, value, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 7200000000
      |         THEN 1 ELSE 0 END AS nb
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                  ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM b
      |)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |FROM sess GROUP BY 1, 2
      |ORDER BY user_id, session_idx""".stripMargin

  /** q61: nearest-rank percentiles — the same integer-permille rank
    * ((p*n + 999) // 1000) over the same per-type value sort; selected
    * values are actual parquet doubles, bit-exact in any engine.
    */
  val percentiles: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events WHERE value IS NOT NULL)
      |SELECT event_type,
      |  max(CASE WHEN rk = (500 * n + 999) // 1000 THEN value END) AS p_50,
      |  max(CASE WHEN rk = (900 * n + 999) // 1000 THEN value END) AS p_90,
      |  max(CASE WHEN rk = (990 * n + 999) // 1000 THEN value END) AS p_99
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** q58: per-key quota cap — the same hash-point rank (md5('d1:'||id)
    * 60-bit draw, id tie-break) inside each derived key group, quota 15.
    */
  val sampleCapKey: String =
    """SELECT doc_id, k FROM (
      |  SELECT doc_id, k,
      |    row_number() OVER (PARTITION BY k
      |      ORDER BY CAST('0x'||substr(md5('d1:'||doc_id),1,15) AS BIGINT) ASC,
      |               doc_id ASC) AS r
      |  FROM (SELECT doc_id,
      |          CASE WHEN doc_id < 250 THEN 'hot' ELSE source END AS k
      |        FROM documents))
      |WHERE r <= 15
      |ORDER BY doc_id""".stripMargin

  /** q62: sliding windows — every event covers exactly width/slide = 4
    * epoch-aligned starts (floor(us/slide)*slide - k*slide, k in 0..3);
    * integer-microsecond arithmetic, make_timestamp keeps NTZ naive like
    * Spark's window() on an NTZ column.
    */
  val slidingRates: String =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value*100, 0) AS BIGINT) AS cents,
      |         epoch_us(ts) AS us
      |  FROM events),
      |w AS (
      |  SELECT event_type, cents,
      |    make_timestamp((us // 900000000) * 900000000 - k * 900000000)
      |      AS window_start
      |  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k))
      |SELECT window_start,
      |       window_start + INTERVAL 1 HOUR AS window_end,
      |       event_type, count(*) AS n, sum(cents) AS cents
      |FROM w GROUP BY 1, 2, 3
      |ORDER BY window_start, event_type""".stripMargin

  /** q63: MAD outliers — the same nearest-rank medians (integer permille
    * rank over the same sorts) and the same IEEE ops in the same order
    * (abs(value - med); mad * 3000 / 1000.0), so the flag set and every
    * carried double are bit-exact.
    */
  val anomalyMad: String =
    """WITH v AS (SELECT event_id, event_type, value FROM events
      |           WHERE value IS NOT NULL),
      |r1 AS (SELECT *,
      |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
      |  count(*) OVER (PARTITION BY event_type) AS n FROM v),
      |m1 AS (SELECT event_id, event_type, value,
      |  max(CASE WHEN rk = (500*n + 999) // 1000 THEN value END)
      |    OVER (PARTITION BY event_type) AS group_median FROM r1),
      |d AS (SELECT *, abs(value - group_median) AS abs_dev FROM m1),
      |r2 AS (SELECT *,
      |  row_number() OVER (PARTITION BY event_type ORDER BY abs_dev) AS rk2,
      |  count(*) OVER (PARTITION BY event_type) AS n2 FROM d),
      |m2 AS (SELECT event_id, event_type, value, group_median, abs_dev,
      |  max(CASE WHEN rk2 = (500*n2 + 999) // 1000 THEN abs_dev END)
      |    OVER (PARTITION BY event_type) AS group_mad FROM r2)
      |SELECT event_id, event_type, value, group_median, group_mad, abs_dev
      |FROM m2 WHERE abs_dev > group_mad * 3000 / 1000.0
      |ORDER BY event_id""".stripMargin

  /** q64: TF-IDF distinctive terms — the shared whitespace tokenizer
    * (q47's form), tf per (doc, term), df per term over the tf table
    * (documents, not occurrences), integer rank (tf DESC, df ASC,
    * term ASC), top 5.
    */
  val tfidfTerms: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(text), '\s+'), t -> len(t) > 0)) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
      |       WHERE len(term) >= 2 GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |  row_number() OVER (PARTITION BY tf.doc_id
      |    ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rk
      |  FROM tf JOIN df USING (term))
      |SELECT doc_id, term, tf, df, CAST(rk AS INT) AS rank
      |FROM r WHERE rk <= 5
      |ORDER BY doc_id, rank""".stripMargin

  /** q65: grok-parse rollup in CLOSED FORM — the oracle re-derives each
    * parsed field from the same event columns the Spark side used to
    * BUILD the log line, so any field the grok regex mis-parses (or any
    * garbage line that fails to dead-letter) breaks a count or sum.
    */
  val grokParse: String =
    """SELECT CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END
      |         AS level,
      |       event_type AS type, count(*) AS n,
      |       sum(CAST(round(value*100, 0) AS BIGINT)) AS sum_cents,
      |       CAST(0 AS BIGINT) AS unparsed
      |FROM events GROUP BY 1, 2
      |UNION ALL
      |SELECT NULL, NULL, count(*), NULL, count(*)
      |FROM events WHERE event_id % 250 = 0
      |ORDER BY level, type""".stripMargin

  /** q66: stratified sample — the q54 hash point under salt "mix1" with
    * per-language integer bounds embedded from Sampling.rateBound (no
    * float re-derivation in SQL).
    */
  val stratifiedSample: String = {
    val en = graft.ops.Sampling.rateBound(0.5)
    val de = graft.ops.Sampling.rateBound(1.0)
    val fr = graft.ops.Sampling.rateBound(0.25)
    val dflt = graft.ops.Sampling.rateBound(0.1)
    s"""SELECT doc_id, lang
       |FROM (SELECT doc_id, lang,
       |        CAST('0x'||substr(md5('mix1:'||doc_id),1,15) AS BIGINT) AS h
       |      FROM documents)
       |WHERE h < CASE lang WHEN 'en' THEN $en WHEN 'de' THEN $de
       |                    WHEN 'fr' THEN $fr ELSE $dflt END
       |ORDER BY doc_id""".stripMargin
  }

  /** q67: parse→enrich→route→aggregate in closed form — the level/action
    * fields re-derive from event_type (gating the parse), the LPM pick is
    * q11's most-specific-wins CASE (gating the enrich), and the o2<=24
    * split mirrors the feed's nation-key coverage (gating the route).
    */
  val grokEnrich: String =
    """WITH base AS (
      |  SELECT CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END
      |           AS level,
      |         CASE WHEN event_type = 'click' THEN 'allow' ELSE 'deny' END
      |           AS action,
      |         user_id%200 AS o2, event_id%250 AS o3
      |  FROM events)
      |SELECT 'matched' AS sink, level, action,
      |       CASE WHEN o3 = o2*3 THEN '10.'||o2||'.'||o2*3||'.0/24'
      |            ELSE '10.'||o2||'.0.0/16' END AS entry,
      |       count(*) AS n
      |FROM base WHERE o2 <= 24 GROUP BY 1,2,3,4
      |UNION ALL
      |SELECT 'clean', level, action, CAST(NULL AS VARCHAR), count(*)
      |FROM base WHERE o2 > 24 GROUP BY 1,2,3,4
      |ORDER BY sink, level, action, entry""".stripMargin

  /** q68: greedy funnel — the same (ts, event_id)-ordered per-user type
    * list and the same earliest-match-after-previous position arithmetic
    * (list_position over a 1-based slice, 0 = absent).
    */
  val funnel: String =
    """WITH u AS (
      |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
      |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
      |s1 AS (SELECT types, list_position(types, 'view') AS p1 FROM u),
      |s2 AS (SELECT types, p1,
      |  CASE WHEN p1 > 0 AND list_position(types[p1+1:], 'click') > 0
      |       THEN p1 + list_position(types[p1+1:], 'click')
      |       ELSE -1 END AS p2 FROM s1),
      |s3 AS (SELECT p1, p2,
      |  CASE WHEN p2 > 0 AND list_position(types[p2+1:], 'purchase') > 0
      |       THEN p2 + list_position(types[p2+1:], 'purchase')
      |       ELSE -1 END AS p3 FROM s2)
      |SELECT * FROM (
      |  SELECT CAST(1 AS INT) AS step_idx, 'view' AS step,
      |         CAST(sum(CASE WHEN p1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS users FROM s3
      |  UNION ALL
      |  SELECT 2, 'click',
      |         CAST(sum(CASE WHEN p2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         FROM s3
      |  UNION ALL
      |  SELECT 3, 'purchase',
      |         CAST(sum(CASE WHEN p3 > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         FROM s3)
      |ORDER BY step_idx""".stripMargin

  /** q69: cohort retention — the same integer week (epoch-µs div one
    * week), per-user weekly dedup, min-week cohort, offset counts.
    */
  val retention: String =
    """WITH a AS (
      |  SELECT DISTINCT
      |         CAST('0x'||substr(md5('r:'||event_id),1,15) AS BIGINT)
      |           % 2203 AS u,
      |         epoch_us(ts) // 604800000000 AS week
      |  FROM events),
      |c AS (SELECT u, week,
      |        min(week) OVER (PARTITION BY u) AS cohort_week FROM a)
      |SELECT cohort_week, week - cohort_week AS week_offset,
      |       count(*) AS users
      |FROM c GROUP BY 1, 2
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** q70: weighted sample — the identical IEEE bound expression
    * (floor(least(1, w·rate) × 2^60), 2^60 exact as a double) over the
    * q54 hash point under salt "w1".
    */
  val weightedSample: String =
    """SELECT doc_id, n_chars
      |FROM (SELECT doc_id, n_chars,
      |        CAST('0x'||substr(md5('w1:'||doc_id),1,15) AS BIGINT) AS h,
      |        CAST(floor(least(1.0, (n_chars/100.0) * 0.5) *
      |                   1152921504606846976.0) AS BIGINT) AS bound
      |      FROM documents)
      |WHERE h < bound
      |ORDER BY doc_id""".stripMargin

  /** q71: as-of join — the oracle re-derives each click's state with an
    * INDEPENDENT mechanism (a per-row LATERAL probe, not a carry-forward
    * window): most recent error at or before the click's ts, equal ts
    * visible, equal-ts ties to the largest event_id, no match -> NULLs.
    */
  val asofJoin: String =
    """SELECT e.event_id AS event_id, e.user_id AS user_id,
      |       s.state_event AS state_event, s.tier AS tier
      |FROM events e
      |LEFT JOIN LATERAL (
      |  SELECT u.event_id AS state_event, u.event_id % 5 AS tier
      |  FROM events u
      |  WHERE u.event_type = 'error' AND u.user_id = e.user_id
      |    AND u.ts <= e.ts
      |  ORDER BY u.ts DESC, u.event_id DESC LIMIT 1
      |) s ON true
      |WHERE e.event_type = 'click'
      |ORDER BY e.event_id""".stripMargin

  /** q72: transition bigrams — lag window per user over the (ts,
    * event_id) total order; p is one IEEE division of two exact longs.
    */
  val transitions: String =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts, event_id) AS prev
      |  FROM events WHERE user_id IS NOT NULL
      |    AND ts IS NOT NULL AND event_id IS NOT NULL),
      |c AS (SELECT prev AS prev_type, event_type AS next_type,
      |             count(*) AS n
      |      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |       CAST(n AS DOUBLE) /
      |         CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
      |FROM c ORDER BY prev_type, next_type""".stripMargin

  /** q73: distinct rollup — flat aggregates via COUNT(DISTINCT), the
    * per-user distribution stat via an independent subquery join; same
    * integer day (epoch-µs div one day) and integer-cents sum as
    * q30/q69.
    */
  val distinctRollup: String =
    """WITH flat AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS epoch_day,
      |         count(DISTINCT user_id) AS n_users, count(*) AS n_rows,
      |         CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT)
      |           AS cents
      |  FROM events GROUP BY 1, 2),
      |per_user AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS epoch_day,
      |         user_id,
      |         CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT)
      |           AS ucents
      |  FROM events GROUP BY 1, 2, 3),
      |dist AS (
      |  SELECT event_type, epoch_day, max(ucents) AS max_user_cents
      |  FROM per_user GROUP BY 1, 2)
      |SELECT f.event_type AS event_type, f.epoch_day AS epoch_day,
      |       f.n_users AS n_users, f.n_rows AS n_rows,
      |       f.cents AS cents, d.max_user_cents AS max_user_cents
      |FROM flat f JOIN dist d
      |  ON f.event_type IS NOT DISTINCT FROM d.event_type
      | AND f.epoch_day IS NOT DISTINCT FROM d.epoch_day
      |ORDER BY event_type, epoch_day""".stripMargin

  /** q74: top-3 users by integer cents per event_type — aggregate first,
    * then rank with the (cents DESC, user_id ASC) tie-break.
    */
  val topkPerGroup: String =
    """WITH a AS (
      |  SELECT event_type, user_id,
      |         CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT)
      |           AS cents
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, user_id, cents,
      |        CAST(row_number() OVER (PARTITION BY event_type
      |          ORDER BY cents DESC, user_id ASC) AS INT) AS rank
      |      FROM a)
      |SELECT event_type, user_id, cents, rank
      |FROM r WHERE rank <= 3
      |ORDER BY event_type, rank""".stripMargin

  /** q75: interval join — the oracle is the PLAIN theta join the Spark
    * side deliberately avoids (fine at sf0.01); any bucket-explode bug
    * (missed bucket, double-counted pair, closed end) shifts n_clicks.
    */
  val intervalJoin: String =
    """WITH i AS (
      |  SELECT event_id AS interval_id, user_id, ts AS s,
      |         ts + INTERVAL 2 HOUR AS e
      |  FROM events WHERE event_type = 'purchase'),
      |p AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
      |SELECT i.interval_id AS interval_id, i.user_id AS user_id,
      |       count(*) AS n_clicks
      |FROM i JOIN p
      |  ON p.user_id = i.user_id AND p.ts >= i.s AND p.ts < i.e
      |GROUP BY 1, 2
      |ORDER BY interval_id""".stripMargin

  /** q76: growth accounting — new/returning re-derived via an
    * independent min-join (the op uses a shared-exchange window).
    */
  val growth: String =
    """WITH a AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS period
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |f AS (SELECT user_id, min(period) AS first FROM a GROUP BY 1),
      |p AS (
      |  SELECT a.period AS period, count(*) AS active,
      |         CAST(sum(CASE WHEN a.period = f.first THEN 1 ELSE 0 END)
      |              AS BIGINT) AS new_entities
      |  FROM a JOIN f ON a.user_id = f.user_id GROUP BY 1)
      |SELECT period, active, new_entities,
      |       active - new_entities AS returning,
      |       CAST(sum(new_entities) OVER (ORDER BY period
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS cumulative_entities
      |FROM p ORDER BY period""".stripMargin

  /** q77: incident-impact bridge — three independent mechanisms: a
    * LATERAL probe for the tier in effect, a plain theta join for the
    * incident window, GROUP BY for the rollup.
    */
  val incidentImpact: String =
    """WITH inc AS (
      |  SELECT event_id AS incident_id, ts AS s,
      |         ts + INTERVAL 1 HOUR AS e
      |  FROM events WHERE event_type = 'error' AND event_id % 7 = 0),
      |pur AS (
      |  SELECT p.event_id,
      |         CAST(round(p.value*100, 0) AS BIGINT) AS cents,
      |         p.ts, t.tier
      |  FROM events p
      |  LEFT JOIN LATERAL (
      |    SELECT u.event_id % 3 AS tier
      |    FROM events u
      |    WHERE u.event_type = 'signup' AND u.user_id = p.user_id
      |      AND u.ts <= p.ts
      |    ORDER BY u.ts DESC, u.event_id DESC LIMIT 1
      |  ) t ON true
      |  WHERE p.event_type = 'purchase')
      |SELECT i.incident_id AS incident_id, pur.tier AS tier,
      |       count(*) AS n_purchases,
      |       CAST(sum(pur.cents) AS BIGINT) AS cents
      |FROM inc i JOIN pur
      |  ON pur.ts >= i.s AND pur.ts < i.e
      |GROUP BY 1, 2
      |ORDER BY incident_id, tier""".stripMargin

  /** q78: fuzzy watchlist join — the oracle is the plain levenshtein
    * cross product over distinct values (the quadratic form the Spark
    * side's deletion-neighborhood join deliberately avoids); same CASE
    * synthesis, same NULL drops.
    */
  val fuzzyDomains: String =
    """WITH p AS (
      |  SELECT DISTINCT CASE
      |    WHEN event_id % 997 = 0 THEN NULL
      |    WHEN event_id % 7 = 0
      |      THEN 'brand' || CAST(user_id % 10 AS VARCHAR) || '.com'
      |    WHEN event_id % 7 = 1
      |      THEN 'brend' || CAST(user_id % 10 AS VARCHAR) || '.com'
      |    WHEN event_id % 7 = 2
      |      THEN 'brnd' || CAST(user_id % 10 AS VARCHAR) || '.com'
      |    WHEN event_id % 7 = 3
      |      THEN 'brannd' || CAST(user_id % 10 AS VARCHAR) || '.com'
      |    WHEN event_id % 7 = 4
      |      THEN 'brend' || CAST(user_id % 10 AS VARCHAR) || '.net'
      |    ELSE 'svc-' || CAST(user_id AS VARCHAR) || '.internal'
      |  END AS probe
      |  FROM events),
      |w AS (SELECT 'brand' || CAST(i AS VARCHAR) || '.com' AS watch
      |      FROM range(10) t(i))
      |SELECT p.probe AS probe, w.watch AS watch,
      |       CAST(levenshtein(p.probe, w.watch) AS INT) AS dist
      |FROM p, w
      |WHERE p.probe IS NOT NULL AND levenshtein(p.probe, w.watch) <= 1
      |ORDER BY probe, watch""".stripMargin

  /** q79: co-occurrence lift — pairs via a distinct SELF-JOIN (the
    * quadratic mechanism the Spark side's per-entity array expansion
    * avoids); marginals and N via independent aggregates; lift is the
    * same single IEEE division of exact longs.
    */
  val cooccurrence: String =
    """WITH d AS (
      |  SELECT DISTINCT
      |    user_id * 100000 + epoch_us(ts) // 86400000000 AS entity,
      |    CASE WHEN event_id % 499 = 0 THEN NULL
      |         ELSE event_type END AS item
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND (CASE WHEN event_id % 499 = 0 THEN NULL
      |              ELSE event_type END) IS NOT NULL),
      |n AS (SELECT count(DISTINCT entity) AS n_entities FROM d),
      |c AS (SELECT item, count(*) AS c FROM d GROUP BY 1),
      |p AS (SELECT a.item AS item_a, b.item AS item_b,
      |             count(*) AS n_pair
      |      FROM d a JOIN d b
      |        ON a.entity = b.entity AND a.item < b.item
      |      GROUP BY 1, 2)
      |SELECT p.item_a AS item_a, p.item_b AS item_b,
      |       p.n_pair AS n_pair, ca.c AS n_a, cb.c AS n_b,
      |       CAST(p.n_pair * n.n_entities AS DOUBLE) /
      |         CAST(ca.c * cb.c AS DOUBLE) AS lift
      |FROM p, n
      |JOIN c ca ON ca.item = p.item_a
      |JOIN c cb ON cb.item = p.item_b
      |ORDER BY item_a, item_b""".stripMargin

  /** q80: template mining — zipped UNNEST for (token, 0-based position),
    * min=max for the literal test, ordered string_agg to reassemble;
    * message counts from the position-0 rows.
    */
  val logTemplates: String =
    """WITH m AS (
      |  SELECT CASE WHEN event_id % 2 = 0 THEN
      |      (CASE event_id % 3 WHEN 0 THEN 'api' WHEN 1 THEN 'svc'
      |            ELSE 'db' END)
      |      || ' request user=' || CAST(user_id AS VARCHAR)
      |      || ' type=' || event_type || ' status=200'
      |    ELSE
      |      (CASE event_id % 3 WHEN 0 THEN 'api' WHEN 1 THEN 'svc'
      |            ELSE 'db' END) || ' heartbeat ok'
      |    END AS msg
      |  FROM events),
      |l AS (SELECT string_split(msg, ' ') AS l
      |      FROM m WHERE msg IS NOT NULL),
      |t AS (SELECT CAST(len(l) AS INT) AS n_tokens, l[1] AS first_token,
      |             unnest(l) AS tok,
      |             CAST(unnest(range(len(l))) AS INT) AS pos
      |      FROM l),
      |g AS (SELECT n_tokens, first_token, pos,
      |             CASE WHEN min(tok) = max(tok) THEN min(tok)
      |                  ELSE '<*>' END AS tok_out,
      |             count(*) AS n_rows
      |      FROM t GROUP BY 1, 2, 3)
      |SELECT n_tokens, first_token,
      |       string_agg(tok_out, ' ' ORDER BY pos) AS template,
      |       CAST(sum(CASE WHEN pos = 0 THEN n_rows END) AS BIGINT)
      |         AS n_msgs
      |FROM g GROUP BY 1, 2
      |ORDER BY n_tokens, first_token""".stripMargin

  /** q82: beaconing — the fixture's seq/plant CASE mirrored verbatim,
    * then lag-gaps and the q63 nearest-rank median/MAD mechanism, with
    * the PURE-INTEGER regularity compare (mad*1000 <= med*200).
    */
  val beaconing: String =
    """WITH s AS (
      |  SELECT user_id, event_id, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id)
      |      AS sq
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |p AS (SELECT user_id, event_id,
      |  CASE WHEN user_id % 7 = 0
      |         THEN 1704067200000000 + sq * 60000000
      |       WHEN user_id % 7 = 1
      |         THEN 1704067200000000 + sq * 60000000
      |              + (event_id % 5 - 2) * 2000000
      |       ELSE epoch_us(ts) END AS tus FROM s),
      |g AS (SELECT user_id,
      |  tus - lag(tus) OVER (PARTITION BY user_id
      |                       ORDER BY tus, event_id) AS gap FROM p),
      |gg AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL),
      |r1 AS (SELECT *,
      |  row_number() OVER (PARTITION BY user_id ORDER BY gap) AS rk,
      |  count(*) OVER (PARTITION BY user_id) AS n FROM gg),
      |m1 AS (SELECT user_id, gap,
      |  max(CASE WHEN rk = (500*n + 999) // 1000 THEN gap END)
      |    OVER (PARTITION BY user_id) AS med FROM r1),
      |d AS (SELECT user_id, gap, med, abs(gap - med) AS dev FROM m1),
      |r2 AS (SELECT *,
      |  row_number() OVER (PARTITION BY user_id ORDER BY dev) AS rk2,
      |  count(*) OVER (PARTITION BY user_id) AS n2 FROM d),
      |m2 AS (SELECT user_id, med,
      |  max(CASE WHEN rk2 = (500*n2 + 999) // 1000 THEN dev END)
      |    OVER (PARTITION BY user_id) AS mad FROM r2)
      |SELECT user_id, count(*) AS n_gaps, max(med) AS median_gap_us,
      |       max(mad) AS mad_gap_us,
      |       (count(*) >= 3 AND max(med) > 0
      |        AND max(mad) * 1000 <= max(med) * 200) AS is_beacon
      |FROM m2 GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q83: indicator timeline — every matched (type, value) re-derived
    * closed-form from the goldTurns plants (the q14 mechanism: ipv4
    * stride e%20, domain stride e%3 with the double-entry evil0 weight,
    * the planted md5), aggregated with events timestamps, ranked
    * per-type by (n_convs, n_matches, value).
    */
  val indicatorTimeline: String =
    """WITH m AS (
      |  SELECT 'ipv4' AS indicator_type,
      |         '10.' || (event_id % 20) || '.2.3' AS value,
      |         1 AS w, 'conv-' || (user_id % 50) AS cv,
      |         epoch_us(ts) AS tus
      |  FROM events WHERE event_id % 5 = 0
      |  UNION ALL
      |  SELECT 'domain', 'evil' || (event_id % 3) || '.example.com',
      |         CASE WHEN event_id % 3 = 0 THEN 2 ELSE 1 END,
      |         'conv-' || (user_id % 50), epoch_us(ts)
      |  FROM events WHERE event_id % 5 = 1
      |  UNION ALL
      |  SELECT 'md5', md5('1'), 1, 'conv-' || (user_id % 50),
      |         epoch_us(ts)
      |  FROM events WHERE event_id % 5 = 2 AND event_id % 4 = 1),
      |a AS (
      |  SELECT indicator_type, value, CAST(sum(w) AS BIGINT) AS n_matches,
      |         count(DISTINCT cv) AS n_convs,
      |         min(tus) AS first_seen_us, max(tus) AS last_seen_us
      |  FROM m GROUP BY 1, 2)
      |SELECT 'threats' AS database_id, indicator_type, value, n_matches,
      |       n_convs, first_seen_us, last_seen_us,
      |       CAST(row_number() OVER (PARTITION BY indicator_type
      |         ORDER BY n_convs, n_matches, value) AS INT) AS rarity_rank
      |FROM a ORDER BY indicator_type, value""".stripMargin

  /** q84: allowlist suppression — the q14 gold-count branches minus the
    * vetoed strides: the 10.15.0.0/16 allow entry kills the e%20 = 15
    * ipv4 stride (CIDR LPM), the evil2 literal kills the e%3 = 2 domain
    * stride; the exact-entry double count and the md5 family survive.
    */
  val suppressedCounts: String =
    """SELECT 'threats' AS database_id, indicator_type, role,
      |       CAST(SUM(c) AS BIGINT) AS match_count
      |FROM (
      |  SELECT 'ipv4' AS indicator_type, event_type AS role,
      |         count(*) AS c
      |  FROM events WHERE event_id%5 = 0 AND event_id%20 != 15 GROUP BY 2
      |  UNION ALL
      |  SELECT 'domain', event_type, count(*)
      |  FROM events WHERE event_id%5 = 1 AND event_id%3 != 2 GROUP BY 2
      |  UNION ALL
      |  SELECT 'domain', event_type, count(*)
      |  FROM events WHERE event_id%5 = 1 AND event_id%3 = 0 GROUP BY 2
      |  UNION ALL
      |  SELECT 'md5', event_type, count(*)
      |  FROM events WHERE event_id%5 = 2 AND event_id%4 = 1 GROUP BY 2
      |)
      |GROUP BY 1,2,3 ORDER BY indicator_type, role""".stripMargin

  /** q85: reconciliation — both derived sink tables rebuilt, each folded
    * to (count, sum of per-row 60-bit digests) per sink with the
    * INJECTIVE per-column md5 serialization (NULL → 32-zero filler, the
    * Reconcile/Conversations rule), verdict by null-safe full join.
    */
  val reconcile: String = {
    val filler = "0" * 32
    def dig(cols: Seq[String]) = {
      val ser = cols.map(c =>
        s"coalesce(md5(CAST($c AS VARCHAR)), '$filler')")
        .mkString(" || ")
      s"CAST('0x' || substr(md5($ser), 1, 15) AS BIGINT)"
    }
    val d = dig(Seq("event_id", "event_type", "user_id"))
    s"""WITH base AS (
       |  SELECT event_id % 4 AS sink, event_id, event_type, user_id
       |  FROM events),
       |l AS (SELECT * FROM base
       |      UNION ALL
       |      SELECT 8, event_id, event_type, user_id FROM events
       |      WHERE event_id % 1009 = 0),
       |r AS (SELECT sink, event_id,
       |        CASE WHEN sink = 1 AND event_id % 499 = 0
       |             THEN 'corrupted' ELSE event_type END AS event_type,
       |        user_id
       |      FROM base WHERE NOT (sink = 0 AND event_id % 997 = 0)
       |      UNION ALL
       |      SELECT 9, event_id, event_type, user_id FROM events
       |      WHERE event_id % 1003 = 0),
       |ld AS (SELECT sink, count(*) AS n_left, sum($d) AS s_left
       |       FROM l GROUP BY 1),
       |rd AS (SELECT sink, count(*) AS n_right, sum($d) AS s_right
       |       FROM r GROUP BY 1)
       |SELECT coalesce(ld.sink, rd.sink) AS sink,
       |       coalesce(n_left, 0) AS n_left,
       |       coalesce(n_right, 0) AS n_right,
       |       CASE WHEN n_left IS NULL THEN 'only_right'
       |            WHEN n_right IS NULL THEN 'only_left'
       |            WHEN n_left != n_right THEN 'count_mismatch'
       |            WHEN s_left != s_right THEN 'content_mismatch'
       |            ELSE 'equal' END AS status
       |FROM ld FULL OUTER JOIN rd
       |  ON ld.sink IS NOT DISTINCT FROM rd.sink
       |ORDER BY sink""".stripMargin
  }

  /** q86: DGA scoring — the fixture's domain CASE mirrored, then the
    * same regex feature algebra: global regexp_replace for counts,
    * regexp_split for the consonant-run max, integer rule sums. Lengths
    * CAST to INT (Spark's length type).
    */
  val dgaScore: String = {
    val words = "['checkout','login','mailserver','blogpost'," +
      "'dashboard','support','weather']"
    """WITH probe AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 3 = 0
      |           THEN (WORDS)[CAST(event_id % 7 AS INT) + 1]
      |                || '.example.com'
      |         WHEN event_id % 3 = 1
      |           THEN substr(md5(CAST(event_id AS VARCHAR)), 1, 14)
      |                || '.biz'
      |         ELSE 'cdn-' || substr(md5(CAST(event_id AS VARCHAR)), 1, 6)
      |              || '.net' END AS domain
      |  FROM events),
      |f AS (
      |  SELECT event_id, domain,
      |         lower(split_part(domain, '.', 1)) AS label FROM probe),
      |g AS (
      |  SELECT event_id, domain, label,
      |    CAST(length(label) AS INT) AS label_len,
      |    CAST(length(label) -
      |      length(regexp_replace(label, '[0-9]', '', 'g')) AS INT)
      |      AS n_digits,
      |    CAST(length(label) -
      |      length(regexp_replace(label, '[aeiou]', '', 'g')) AS INT)
      |      AS n_vowels,
      |    CAST(list_max(list_transform(
      |      regexp_split_to_array(label, '[aeiou0-9]'),
      |      x -> length(x))) AS INT) AS max_run
      |  FROM f),
      |r AS (
      |  SELECT *,
      |    (CASE WHEN label_len >= 12 THEN 1 ELSE 0 END +
      |     CASE WHEN n_digits * 5 >= label_len THEN 1 ELSE 0 END +
      |     CASE WHEN n_vowels * 4 <= label_len THEN 1 ELSE 0 END +
      |     CASE WHEN max_run >= 5 THEN 1 ELSE 0 END) AS dga_rules
      |  FROM g)
      |SELECT event_id, domain, label, label_len, n_digits, n_vowels,
      |       max_run, dga_rules, dga_rules >= 2 AS dga_suspect
      |FROM r ORDER BY event_id""".stripMargin
      .replace("(WORDS)", s"($words)")
  }

  /** q87: indicator growth — the q83 plant re-derivation feeding the q76
    * growth mechanism (DISTINCT (value, day) + independent min-join).
    */
  val indicatorGrowth: String =
    """WITH m AS (
      |  SELECT '10.' || (event_id % 20) || '.2.3' AS value,
      |         epoch_us(ts) // 86400000000 AS period
      |  FROM events WHERE event_id % 5 = 0
      |  UNION ALL
      |  SELECT 'evil' || (event_id % 3) || '.example.com',
      |         epoch_us(ts) // 86400000000
      |  FROM events WHERE event_id % 5 = 1
      |  UNION ALL
      |  SELECT md5('1'), epoch_us(ts) // 86400000000
      |  FROM events WHERE event_id % 5 = 2 AND event_id % 4 = 1),
      |a AS (SELECT DISTINCT value, period FROM m),
      |f AS (SELECT value, min(period) AS first FROM a GROUP BY 1),
      |p AS (
      |  SELECT a.period AS period, count(*) AS active,
      |         CAST(sum(CASE WHEN a.period = f.first THEN 1 ELSE 0 END)
      |              AS BIGINT) AS new_entities
      |  FROM a JOIN f ON a.value = f.value GROUP BY 1)
      |SELECT period, active, new_entities,
      |       active - new_entities AS returning,
      |       CAST(sum(new_entities) OVER (ORDER BY period
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS cumulative_entities
      |FROM p ORDER BY period""".stripMargin

  /** q88: conversation risk — plant-derived hit rows (glob row per
    * domain turn, EXTRA exact row for evil0 — n_matches counts rows),
    * LPM most-specific weights (the /16 stride is critical), integer
    * weight sums, default tier thresholds.
    */
  val conversationRisk: String =
    """WITH k AS (
      |  SELECT * FROM events
      |  WHERE event_id % (user_id % 50 + 2) = 0),
      |m AS (
      |  SELECT 'conv-' || (user_id % 50) AS conv_id,
      |         '10.' || (event_id % 20) || '.2.3' AS value,
      |         CASE WHEN event_id % 20 = 5 THEN 100 ELSE 50 END AS w
      |  FROM k WHERE event_id % 5 = 0
      |  UNION ALL
      |  SELECT 'conv-' || (user_id % 50),
      |         'evil' || (event_id % 3) || '.example.com', 5
      |  FROM k WHERE event_id % 5 = 1
      |  UNION ALL
      |  SELECT 'conv-' || (user_id % 50), 'evil0.example.com', 50
      |  FROM k WHERE event_id % 5 = 1 AND event_id % 3 = 0
      |  UNION ALL
      |  SELECT 'conv-' || (user_id % 50), md5('1'), 20
      |  FROM k WHERE event_id % 5 = 2 AND event_id % 4 = 1)
      |SELECT conv_id, count(*) AS n_matches,
      |       count(DISTINCT value) AS n_indicators,
      |       CAST(sum(w) AS BIGINT) AS risk_score,
      |       CASE WHEN sum(w) >= 1000 THEN 'escalate'
      |            WHEN sum(w) >= 200 THEN 'review'
      |            ELSE 'routine' END AS tier
      |FROM m GROUP BY 1 ORDER BY conv_id""".stripMargin

  /** q81: campaign clustering — q79's co-occurrence CTEs, an IEEE-exact
    * lift threshold, then transitive closure via a recursive CTE (the
    * q41 mechanism) with min-label roots over STRING ids.
    */
  val campaignClusters: String =
    """WITH RECURSIVE d AS (
      |  SELECT DISTINCT
      |    user_id * 100000 + epoch_us(ts) // 86400000000 AS entity,
      |    CASE WHEN event_id % 499 = 0 THEN NULL
      |         ELSE event_type END AS item
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND (CASE WHEN event_id % 499 = 0 THEN NULL
      |              ELSE event_type END) IS NOT NULL),
      |n AS (SELECT count(DISTINCT entity) AS n_entities FROM d),
      |c AS (SELECT item, count(*) AS c FROM d GROUP BY 1),
      |p AS (SELECT a.item AS item_a, b.item AS item_b,
      |             count(*) AS n_pair
      |      FROM d a JOIN d b
      |        ON a.entity = b.entity AND a.item < b.item
      |      GROUP BY 1, 2),
      |lifted AS (
      |  SELECT p.item_a, p.item_b
      |  FROM p, n
      |  JOIN c ca ON ca.item = p.item_a
      |  JOIN c cb ON cb.item = p.item_b
      |  WHERE CAST(p.n_pair * n.n_entities AS DOUBLE) /
      |          CAST(ca.c * cb.c AS DOUBLE) > 0.92),
      |nodes AS (SELECT item_a AS item FROM p
      |          UNION SELECT item_b FROM p),
      |e AS (SELECT item_a AS a, item_b AS b FROM lifted
      |      UNION ALL SELECT item_b, item_a FROM lifted),
      |reach AS (
      |  SELECT item AS doc, item AS root FROM nodes
      |  UNION
      |  SELECT e.b, reach.root FROM reach JOIN e ON reach.doc = e.a
      |)
      |SELECT doc AS item, min(root) AS campaign,
      |       (doc = min(root)) AS is_canonical
      |FROM reach GROUP BY doc ORDER BY item""".stripMargin

  /** q89: conversation audit — the same defect planting (text NULLed on
    * the ORIGINAL index, then the index shift), the canonical
    * (turn_idx, role NULLS FIRST) window order (DuckDB defaults ASC to
    * NULLS LAST — must be explicit), NULL-safe role adjacency via
    * IS NOT DISTINCT FROM with a lag(1) first-row marker, and the same
    * zero-token emptiness rule as the Spark tokenizer. Sums CAST to
    * BIGINT (DuckDB sums INTs into HUGEINT).
    */
  val convAudit: String =
    s"""WITH t AS (
       |  SELECT conv_id,
       |    CASE WHEN orig % 11 = 0 THEN orig - 5 ELSE orig END
       |      AS turn_idx,
       |    role,
       |    CASE WHEN orig % 13 = 0 THEN NULL ELSE text END AS text
       |  FROM (SELECT conv_id, turn_idx AS orig, role, text
       |        FROM ($goldTurnsSql))),
       |f AS (
       |  SELECT conv_id, turn_idx, role,
       |    CASE WHEN text IS NULL OR len(list_filter(
       |      string_split_regex(text, '\\s+'), x -> len(x) > 0)) = 0
       |      THEN 1 ELSE 0 END AS is_empty,
       |    CASE WHEN lag(1) OVER w IS NOT NULL
       |           AND role IS NOT DISTINCT FROM lag(role) OVER w
       |      THEN 1 ELSE 0 END AS is_repeat,
       |    row_number() OVER w AS rn
       |  FROM t
       |  WINDOW w AS (PARTITION BY conv_id
       |               ORDER BY turn_idx, role ASC NULLS FIRST))
       |SELECT conv_id,
       |  count(*) AS n_turns,
       |  count(*) - count(DISTINCT turn_idx) AS n_dup_idx,
       |  CAST(sum(is_repeat) AS BIGINT) AS n_role_repeats,
       |  CAST(sum(is_empty) AS BIGINT) AS n_empty,
       |  max(CASE WHEN rn = 1 THEN coalesce(role, '') END) AS first_role,
       |  max_by(coalesce(role, ''), rn) AS last_role,
       |  (count(*) - count(DISTINCT turn_idx) = 0
       |   AND sum(is_repeat) = 0 AND sum(is_empty) = 0) AS wellformed
       |FROM f GROUP BY conv_id ORDER BY conv_id""".stripMargin

  /** q90: sequence packing — the md5-derived 60-bit shard (the q53 hex
    * idiom, always non-negative so % is pmod), ids in STRING order, and
    * the first-fit scan replayed as a per-shard recursive CTE carrying
    * (bin, fill, pos) — the exact rule in Packing.packSequences.
    */
  val packDocs: String =
    """WITH RECURSIVE s AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS id,
      |    CAST(coalesce(len(list_filter(
      |      string_split_regex(text, '\s+'), x -> len(x) > 0)), 0)
      |      AS BIGINT) AS n_tokens
      |  FROM documents WHERE doc_id IS NOT NULL),
      |h AS (
      |  SELECT id, n_tokens,
      |    CAST(CAST('0x'||substr(md5('pack-v1:'||id), 1, 15) AS BIGINT)
      |         % 8 AS INT) AS shard
      |  FROM s),
      |r AS (
      |  SELECT id, n_tokens, shard,
      |    row_number() OVER (PARTITION BY shard ORDER BY id) AS rn
      |  FROM h),
      |scan AS (
      |  SELECT shard, rn, id, n_tokens,
      |         0 AS bin, n_tokens AS fill, 0 AS pos
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.shard, r.rn, r.id, r.n_tokens,
      |    CASE WHEN scan.fill > 0 AND scan.fill + r.n_tokens > 200
      |         THEN scan.bin + 1 ELSE scan.bin END,
      |    CASE WHEN scan.fill > 0 AND scan.fill + r.n_tokens > 200
      |         THEN r.n_tokens ELSE scan.fill + r.n_tokens END,
      |    CASE WHEN scan.fill > 0 AND scan.fill + r.n_tokens > 200
      |         THEN 0 ELSE scan.pos + 1 END
      |  FROM scan JOIN r ON r.shard = scan.shard AND r.rn = scan.rn + 1)
      |SELECT id, n_tokens, shard,
      |       CAST(bin AS INT) AS bin, CAST(pos AS INT) AS pos
      |FROM scan ORDER BY shard, bin, pos""".stripMargin

  /** q91: context-window truncation — reverse running token sum per
    * conversation (turn_idx DESC; gold indices are unique so no
    * tie-break is needed), strict `<= 12` keep rule, HUGEINT sum CAST
    * back to BIGINT.
    */
  val convTruncate: String =
    s"""WITH t AS ($goldTurnsSql),
       |c AS (
       |  SELECT conv_id, turn_idx, role,
       |    CAST(coalesce(len(list_filter(
       |      string_split_regex(text, '\\s+'), x -> len(x) > 0)), 0)
       |      AS BIGINT) AS n_tokens
       |  FROM t),
       |w AS (
       |  SELECT *, sum(n_tokens) OVER (
       |    PARTITION BY conv_id ORDER BY turn_idx DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS cum_from_end
       |  FROM c)
       |SELECT conv_id, turn_idx, role, n_tokens,
       |       CAST(cum_from_end AS BIGINT) AS cum_from_end
       |FROM w WHERE cum_from_end <= 12
       |ORDER BY conv_id, turn_idx""".stripMargin

  /** q92: confusables — DuckDB's translate has the same PG semantics as
    * Spark's (extra from-chars delete), so the skeleton is the same
    * expression; watch entries skeletonize and dedupe, exact
    * (case-insensitive) hits are excluded.
    */
  val confusables: String =
    """WITH probes AS (
      |  SELECT event_id,
      |    CASE event_id % 7
      |      WHEN 0 THEN 'paypa1.com'
      |      WHEN 1 THEN 'g00gle.com'
      |      WHEN 2 THEN 'pay-pal.c0m'
      |      WHEN 3 THEN 'paypal.com'
      |      WHEN 4 THEN 'evilo.example.com'
      |      ELSE 'site' || (event_id % 100) || '.net' END AS domain
      |  FROM events),
      |w AS (
      |  SELECT DISTINCT domain AS watch_domain,
      |    translate(lower(domain), '013578$@!|-', 'olestbsail')
      |      AS skeleton
      |  FROM (VALUES ('paypal.com'), ('google.com'),
      |        ('evil0.example.com')) AS v(domain))
      |SELECT p.event_id, p.domain, w.watch_domain, w.skeleton
      |FROM (SELECT *,
      |        translate(lower(domain), '013578$@!|-', 'olestbsail')
      |          AS skeleton
      |      FROM probes) p
      |JOIN w ON p.skeleton = w.skeleton
      |WHERE lower(p.domain) != lower(w.watch_domain)
      |ORDER BY p.event_id, w.watch_domain""".stripMargin

  /** q93: CUSUM — the daily rollup then Page's recursion replayed as a
    * per-key recursive CTE carrying the floored statistic.
    */
  val driftCusum: String =
    """WITH RECURSIVE d AS (
      |  SELECT event_type AS key,
      |         epoch_us(ts) // 86400000000 AS period,
      |         count(*) AS value
      |  FROM events
      |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT key, period, value,
      |    row_number() OVER (PARTITION BY key ORDER BY period, value)
      |      AS rn
      |  FROM d),
      |scan AS (
      |  SELECT key, rn, period, value,
      |         greatest(0, value - 66) AS cusum
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.key, r.rn, r.period, r.value,
      |         greatest(0, scan.cusum + r.value - 66)
      |  FROM scan JOIN r ON r.key = scan.key AND r.rn = scan.rn + 1)
      |SELECT key, period, CAST(value AS BIGINT) AS value,
      |       CAST(cusum AS BIGINT) AS cusum, cusum >= 40 AS alarm
      |FROM scan ORDER BY key, period""".stripMargin

  /** q94: inverted index — per-doc distinct terms, full df, the
    * 390-smallest-doc_ids posting prefix (string_agg skips the NULLed
    * over-cap rows, keeping doc_id order).
    */
  val invertedIndex: String =
    """WITH terms AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_filter(
      |      string_split_regex(lower(text), '\s+'),
      |      x -> len(x) > 0))) AS term
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      |r AS (
      |  SELECT term, doc_id,
      |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      |  FROM terms)
      |SELECT term, count(*) AS df,
      |  coalesce(string_agg(
      |    CASE WHEN rn <= 390 THEN CAST(doc_id AS VARCHAR) END, ','
      |    ORDER BY doc_id), '') AS postings,
      |  (count(CASE WHEN rn <= 390 THEN 1 END) < count(*)) AS truncated
      |FROM r GROUP BY term ORDER BY term""".stripMargin

  /** q95: heavy hitters — the exact threshold semantics the bounded-state
    * path must reproduce: GROUP BY with HAVING count·k ≥ n over non-null
    * items (the Misra–Gries candidate stage is unobservable here — that
    * is the point).
    */
  val heavyHitters: String =
    """WITH it AS (
      |  SELECT CASE
      |    WHEN event_id % 997 = 0 THEN NULL
      |    WHEN event_id % 2 = 0 THEN 'hot' || CAST(event_id % 3 AS VARCHAR)
      |    WHEN event_id % 40 = 1 THEN 'mid'
      |    ELSE 'tail-' || CAST(event_id AS VARCHAR) END AS item
      |  FROM events)
      |SELECT item, count(*) AS n_item FROM it WHERE item IS NOT NULL
      |GROUP BY item
      |HAVING count(*) * 8 >=
      |  (SELECT count(*) FROM it WHERE item IS NOT NULL)
      |ORDER BY item""".stripMargin

  /** q96: sliding chunks — the same start grid (0, 12, 24, … < n), tail
    * clamp least(24, n−s), and lowercased-token slice rejoin.
    */
  val chunkDocs: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |           x -> len(x) > 0) AS tk
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      |sized AS (SELECT doc_id, tk, len(tk) AS n FROM toks
      |          WHERE len(tk) > 0),
      |st AS (SELECT doc_id, tk, n,
      |         unnest(generate_series(0, CAST(n - 1 AS BIGINT), 12)) AS s
      |       FROM sized)
      |SELECT doc_id, CAST(s // 12 AS INT) AS chunk_idx, s AS start_tok,
      |       least(24, n - s) AS chunk_len,
      |       array_to_string(
      |         tk[CAST(s + 1 AS INT) : CAST(s + least(24, n - s) AS INT)],
      |         ' ') AS chunk_text
      |FROM st ORDER BY doc_id, chunk_idx""".stripMargin

  /** q97: per-source token budget — the q58 hash-point order (salt 'k1')
    * with an inclusive running token sum kept while ≤ 700.
    */
  val budgetPerSource: String =
    """SELECT doc_id, source, n_tokens, cum_tokens FROM (
      |  SELECT doc_id, source, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY source
      |      ORDER BY CAST('0x'||substr(md5('k1:'||doc_id),1,15) AS BIGINT)
      |        ASC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS cum_tokens
      |  FROM (SELECT doc_id, source,
      |          len(list_filter(string_split_regex(text, '\s+'),
      |            x -> len(x) > 0)) AS n_tokens
      |        FROM documents))
      |WHERE cum_tokens <= 700
      |ORDER BY doc_id""".stripMargin

  /** q98: set-similarity join — the NAIVE all-pairs Jaccard join the
    * prefix-filter candidate stage must reproduce losslessly (the
    * mechanism is unobservable, which is the claim); integer-permille
    * keep test, one IEEE division for the reported jaccard.
    */
  val setJoin: String =
    """WITH base AS (
      |  SELECT doc_id, list_distinct(list_filter(
      |    string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0)) AS tk
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      |tok AS (SELECT doc_id, unnest(tk) AS token FROM base
      |        WHERE len(tk) > 0),
      |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      |p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |        count(*) AS inter
      |      FROM tok x JOIN tok y USING (token)
      |      WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
      |SELECT doc_a, doc_b, inter, sa.n AS size_a, sb.n AS size_b,
      |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
      |FROM p JOIN sz sa ON sa.doc_id = doc_a
      |       JOIN sz sb ON sb.doc_id = doc_b
      |WHERE inter * 1000 >= 950 * (sa.n + sb.n - inter)
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q99: BPE merge-pair counts — word frequencies, then the in-word
    * substr(i, 2) sweep weighted by freq, fully tie-broken rank.
    */
  val bpeMerges: String =
    """WITH w AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0)) AS word
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      |wc AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
      |pr AS (
      |  SELECT substr(word, CAST(i AS INT), 2) AS pair,
      |         CAST(sum(freq) AS BIGINT) AS total
      |  FROM (SELECT word, freq,
      |          unnest(generate_series(1, CAST(len(word) - 1 AS BIGINT)))
      |            AS i
      |        FROM wc WHERE len(word) >= 2)
      |  GROUP BY 1)
      |SELECT pair, total, rank FROM (
      |  SELECT pair, total,
      |    CAST(row_number() OVER (ORDER BY total DESC, pair ASC) AS INT)
      |      AS rank
      |  FROM pr)
      |WHERE rank <= 25 ORDER BY rank""".stripMargin

  /** q100: text normalization — the same deterministic dirtying concat,
    * then the same two explicit character-class regexes (never `\s`:
    * Java and RE2 disagree on \x0B membership).
    */
  val textClean: String =
    """WITH dirty AS (
      |  SELECT doc_id,
      |    chr(7) || '  ' || replace(text, 'a', 'a' || chr(1))
      |      || chr(127) || ' ' AS text
      |  FROM documents WHERE doc_id IS NOT NULL),
      |s AS (
      |  SELECT doc_id, text,
      |    regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '',
      |      'g') AS stripped
      |  FROM dirty)
      |SELECT doc_id,
      |  trim(regexp_replace(stripped, '[ \t\r\n]+', ' ', 'g'))
      |    AS clean_text,
      |  CAST(len(text) AS INT) AS n_chars_raw,
      |  CAST(len(trim(regexp_replace(stripped, '[ \t\r\n]+', ' ', 'g')))
      |    AS INT) AS n_chars_clean,
      |  CAST(len(text) - len(stripped) AS INT) AS n_controls
      |FROM s ORDER BY doc_id""".stripMargin

  /** q101: bounded-state exact quantiles — the oracle is the DIRECT
    * full-sort nearest-rank form (the q61 mechanism, same
    * integer-permille rank), so the bucket-refinement mechanism must be
    * unobservable.
    */
  val quantiles: String =
    """WITH r AS (
      |  SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars)
      |      AS rk,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM documents WHERE n_chars IS NOT NULL)
      |SELECT source,
      |  max(CASE WHEN rk = (500 * n + 999) // 1000 THEN n_chars END)
      |    AS p_50,
      |  max(CASE WHEN rk = (900 * n + 999) // 1000 THEN n_chars END)
      |    AS p_90,
      |  max(CASE WHEN rk = (990 * n + 999) // 1000 THEN n_chars END)
      |    AS p_99
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** q102: triangle count — the oracle is the NAIVE three-way
    * self-join with u < v < w over the same canonical edge set; the
    * degree-ordered orientation must count the identical set.
    */
  val triangles: String =
    """WITH raw AS (
      |  SELECT event_id % 350 AS x, (event_id // 7) % 350 AS y
      |  FROM events WHERE event_id IS NOT NULL),
      |e AS (
      |  SELECT DISTINCT least(x, y) AS src, greatest(x, y) AS dst
      |  FROM raw WHERE x <> y),
      |nn AS (SELECT count(*) AS n_nodes FROM (
      |  SELECT DISTINCT n FROM (
      |    SELECT src AS n FROM e UNION ALL SELECT dst FROM e))),
      |ne AS (SELECT count(*) AS n_edges FROM e),
      |nt AS (SELECT count(*) AS n_triangles
      |  FROM e a
      |  JOIN e b ON b.src = a.src AND b.dst > a.dst
      |  JOIN e c ON c.src = a.dst AND c.dst = b.dst)
      |SELECT n_nodes, n_edges, n_triangles FROM nn, ne, nt""".stripMargin

  /** q103: salted skew join — the oracle is the PLAIN inner join +
    * rollup; the salt replication must be result-invariant.
    */
  val skewJoin: String =
    """WITH dim AS (
      |  SELECT event_type, count(*) AS type_total FROM events
      |  WHERE event_type IS NOT NULL GROUP BY 1)
      |SELECT e.user_id % 20 AS user_bucket,
      |  count(*) AS n_rows,
      |  CAST(sum(d.type_total) AS BIGINT) AS sum_weight
      |FROM events e JOIN dim d USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q104: URL canonicalization — the same synthesis concat, the same
    * explicit grammar regexes (Java ∩ RE2 subset), the same canonical
    * rules: lowercase scheme/host, default-port strip, fragment drop,
    * tracking-param drop + lexicographic param sort, empty path → '/'.
    */
  val urlNormalize: String =
    """WITH u AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 97 = 0 THEN 'not a url' ELSE
      |      'HTTP://Example' || (event_id % 5) || '.COM' ||
      |      CASE WHEN event_id % 3 = 0 THEN ':80'
      |           WHEN event_id % 3 = 1 THEN ':8080' ELSE '' END ||
      |      CASE WHEN event_id % 7 = 0 THEN ''
      |           ELSE '/Path/' || event_type END ||
      |      CASE WHEN event_id % 4 = 0 THEN '?utm_source=news&b=2&a=1'
      |           WHEN event_id % 4 = 1 THEN '?gclid=xyz'
      |           WHEN event_id % 4 = 2 THEN '?z=9&a=1&utm_campaign=c&&'
      |           ELSE '' END ||
      |      CASE WHEN event_id % 2 = 0 THEN '#frag?notquery'
      |           ELSE '' END
      |    END AS url
      |  FROM events),
      |p AS (
      |  SELECT event_id, url,
      |    lower(regexp_extract(url,
      |      '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
      |    regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1) AS hostport,
      |    regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path,
      |    regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS query
      |  FROM u),
      |q AS (
      |  SELECT *,
      |    lower(regexp_extract(hostport, '^([^:]*)', 1)) AS host0,
      |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
      |    list_filter(string_split(query, '&'), x -> x <> '') AS rawp
      |  FROM p),
      |r AS (
      |  SELECT *, list_sort(list_filter(rawp, x -> NOT
      |    regexp_matches(x,
      |      '^(utm_[a-z0-9_]*|fbclid|gclid|msclkid)='))) AS kept,
      |    (scheme = '' OR host0 = '') AS mal
      |  FROM q)
      |SELECT event_id,
      |  CASE WHEN mal THEN NULL ELSE
      |    scheme || '://' || host0 ||
      |    CASE WHEN port <> '' AND
      |         NOT (scheme = 'http' AND port = '80') AND
      |         NOT (scheme = 'https' AND port = '443')
      |      THEN ':' || port ELSE '' END ||
      |    CASE WHEN path = '' THEN '/' ELSE path END ||
      |    CASE WHEN len(kept) > 0
      |      THEN '?' || array_to_string(kept, '&') ELSE '' END
      |  END AS url_norm,
      |  CASE WHEN mal THEN NULL ELSE host0 END AS host,
      |  CASE WHEN mal THEN NULL
      |    ELSE CAST(len(kept) AS INT) END AS n_params_kept,
      |  CASE WHEN mal THEN NULL
      |    ELSE CAST(len(rawp) - len(kept) AS INT) END AS n_params_dropped,
      |  mal AS malformed
      |FROM r ORDER BY event_id""".stripMargin

  /** q105: Z-order keys — the identical 4-step magic-shift spread per
    * dimension, odd/even bit merge, in plain `& | <<` bit operators.
    */
  val zorder: String =
    """WITH b AS (
      |  SELECT event_id, user_id % 256 AS x, event_id % 256 AS y
      |  FROM events),
      |s1 AS (SELECT *, (x | (x << 8)) & 16711935 AS xa,
      |               (y | (y << 8)) & 16711935 AS ya FROM b),
      |s2 AS (SELECT *, (xa | (xa << 4)) & 252645135 AS xb,
      |               (ya | (ya << 4)) & 252645135 AS yb FROM s1),
      |s3 AS (SELECT *, (xb | (xb << 2)) & 858993459 AS xc,
      |               (yb | (yb << 2)) & 858993459 AS yc FROM s2),
      |s4 AS (SELECT *, (xc | (xc << 1)) & 1431655765 AS xd,
      |               (yc | (yc << 1)) & 1431655765 AS yd FROM s3)
      |SELECT event_id, x, y, (xd | (yd << 1)) AS zkey
      |FROM s4 ORDER BY event_id""".stripMargin

  /** q106: hierarchical rollup — ANSI GROUP BY ROLLUP with
    * GROUPING(a, b) as the same bit vector Spark's grouping_id emits;
    * integer-exact aggregates only.
    */
  val rollupHierarchy: String =
    """WITH b AS (
      |  SELECT event_type, user_id % 7 AS ubucket, user_id, event_id
      |  FROM events)
      |SELECT event_type, ubucket,
      |  count(*) AS n_rows,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(event_id) AS BIGINT) AS sum_ids,
      |  CAST(GROUPING(event_type, ubucket) AS INT) AS gid
      |FROM b GROUP BY ROLLUP(event_type, ubucket)
      |ORDER BY gid, event_type, ubucket""".stripMargin

  /** q107: co-bucketed join — the plain join + rollup; the bucketed
    * catalog layout must be result-invariant.
    */
  val bucketedJoin: String =
    """WITH dim AS (
      |  SELECT user_id, count(*) AS n_user_events
      |  FROM events GROUP BY 1)
      |SELECT e.event_type, count(*) AS n_rows,
      |  CAST(sum(d.n_user_events) AS BIGINT) AS sum_user_events
      |FROM events e JOIN dim d USING (user_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q108: incremental rollup maintenance — the from-scratch aggregate
    * the three merged increments must equal.
    */
  val mergePartials: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(event_id) AS BIGINT) AS sum_ids,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** q109: table profile — five independent per-column aggregates the
    * single-pass profiler must equal.
    */
  val profile: String =
    """SELECT * FROM (
      |  SELECT 'event_id' AS "column", count(*) AS n_rows,
      |    count(*) FILTER (WHERE event_id IS NULL) AS n_nulls,
      |    count(DISTINCT event_id) AS n_distinct FROM events
      |  UNION ALL
      |  SELECT 'user_id', count(*),
      |    count(*) FILTER (WHERE user_id IS NULL),
      |    count(DISTINCT user_id) FROM events
      |  UNION ALL
      |  SELECT 'event_type', count(*),
      |    count(*) FILTER (WHERE event_type IS NULL),
      |    count(DISTINCT event_type) FROM events
      |  UNION ALL
      |  SELECT 'value', count(*),
      |    count(*) FILTER (WHERE value IS NULL),
      |    count(DISTINCT value) FROM events
      |  UNION ALL
      |  SELECT 'props', count(*),
      |    count(*) FILTER (WHERE props IS NULL),
      |    count(DISTINCT props) FROM events)
      |ORDER BY "column"""".stripMargin

  /** q110: interval merging — the same running-max sweep replayed as
    * window SQL in exact integer microseconds.
    */
  val mergeIntervals: String =
    """WITH iv AS (
      |  SELECT user_id % 50 AS k, epoch_us(ts) AS s,
      |    epoch_us(ts) + (1 + event_id % 5) * 3600000000 AS e
      |  FROM events),
      |m AS (
      |  SELECT k, s, e,
      |    max(e) OVER (PARTITION BY k ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM iv),
      |g AS (
      |  SELECT k, s, e,
      |    CASE WHEN pmax IS NULL OR pmax < s THEN 1 ELSE 0 END AS isnew
      |  FROM m),
      |r AS (
      |  SELECT k, s, e,
      |    sum(isnew) OVER (PARTITION BY k ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM g)
      |SELECT k, min(s) AS s, CAST(max(e) AS BIGINT) AS e,
      |  count(*) AS n_merged
      |FROM r GROUP BY k, grp ORDER BY k, s""".stripMargin

  /** q111: exact proportional allocation — Hamilton base/remainder
    * seats + the shared md5 hash-order prefix (the q58 ranking).
    */
  val allocateProportional: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id < 250 THEN 'hot' ELSE source END AS stratum
      |  FROM documents WHERE doc_id IS NOT NULL),
      |sz AS (SELECT stratum, count(*) AS n FROM d GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM sz),
      |q0 AS (SELECT stratum, n, (97 * n) // ntot AS base,
      |         (97 * n) % ntot AS rem FROM sz, tot),
      |lo AS (SELECT CAST(97 - sum(base) AS BIGINT) AS leftover FROM q0),
      |q1 AS (SELECT stratum, base, rem,
      |         row_number() OVER (ORDER BY rem DESC, stratum ASC) AS rr
      |       FROM q0),
      |qt AS (SELECT stratum,
      |         base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
      |           AS quota
      |       FROM q1, lo),
      |r AS (SELECT doc_id, stratum,
      |        row_number() OVER (PARTITION BY stratum
      |          ORDER BY CAST('0x' || substr(md5('p1:' || doc_id), 1, 15)
      |            AS BIGINT) ASC, doc_id ASC) AS rk
      |      FROM d)
      |SELECT r.doc_id, r.stratum FROM r JOIN qt USING (stratum)
      |WHERE rk <= quota ORDER BY doc_id""".stripMargin

  /** q112: keyed snapshot diff — full outer join + null-safe
    * per-column compares, concat_ws change lists.
    */
  val snapshotDiff: String =
    """WITH ev AS (SELECT event_id, event_type, value FROM events),
      |o AS (SELECT * FROM ev WHERE event_id % 10 <> 0),
      |n AS (SELECT event_id,
      |        CASE WHEN event_id % 11 = 0 THEN event_type || 'x'
      |             ELSE event_type END AS event_type,
      |        CASE WHEN event_id % 5 = 0 THEN value + 1
      |             ELSE value END AS value
      |      FROM ev WHERE event_id % 7 <> 0),
      |j AS (SELECT coalesce(o.event_id, n.event_id) AS event_id,
      |        o.event_id IS NOT NULL AS op,
      |        n.event_id IS NOT NULL AS np,
      |        o.event_type AS ot, n.event_type AS nt,
      |        o.value AS ov, n.value AS nv
      |      FROM o FULL OUTER JOIN n ON o.event_id = n.event_id),
      |v AS (SELECT *,
      |        CASE WHEN op AND np THEN concat_ws(',',
      |          CASE WHEN ot IS DISTINCT FROM nt
      |            THEN 'event_type' END,
      |          CASE WHEN ov IS DISTINCT FROM nv THEN 'value' END)
      |        ELSE '' END AS changed_cols
      |      FROM j)
      |SELECT event_id,
      |  CASE WHEN NOT op THEN 'added' WHEN NOT np THEN 'removed'
      |       WHEN changed_cols <> '' THEN 'changed'
      |       ELSE 'unchanged' END AS verdict,
      |  changed_cols, ot AS old_event_type, ov AS old_value,
      |  nt AS new_event_type, nv AS new_value
      |FROM v WHERE NOT (op AND np AND changed_cols = '')
      |ORDER BY event_id""".stripMargin

  /** q113: pseudonymization — the same md5-prefix construction replayed
    * per row; distinct counts gate injectivity, min(pseudo) the bytes.
    */
  val anonymize: String =
    """SELECT event_type, count(*) AS n_rows,
      |  count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT substr(md5('s1:' || user_id), 1, 16))
      |    AS n_pseudos,
      |  min(substr(md5('s1:' || user_id), 1, 16)) AS first_pseudo
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** q114: equi-depth range boundaries — the direct nearest-rank form
    * at the same floor(i*1000/8) permilles.
    */
  val rangeBoundaries: String =
    """WITH r AS (
      |  SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rk,
      |    count(*) OVER () AS n
      |  FROM documents WHERE n_chars IS NOT NULL),
      |b(boundary_idx, permille) AS (VALUES
      |  (1, 125), (2, 250), (3, 375), (4, 500),
      |  (5, 625), (6, 750), (7, 875))
      |SELECT b.boundary_idx, b.permille,
      |  max(CASE WHEN rk = (b.permille * n + 999) // 1000
      |    THEN n_chars END) AS value
      |FROM r, b GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** q115: trailing 7-day distinct actors — the same dedup-before-expand
    * route: distinct (user, day), each pair covers the 7 epoch-aligned
    * day starts d-6..d (q62's integer-microsecond window arithmetic),
    * n_active dedups ids per window, n_id_days counts pairs.
    */
  val rollingActive: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |    (epoch_us(ts) // 86400000000) * 86400000000 AS dus
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |w AS (
      |  SELECT user_id, make_timestamp(dus - k * 86400000000)
      |    AS window_start
      |  FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k))
      |SELECT window_start,
      |       window_start + INTERVAL 7 DAY AS window_end,
      |       count(DISTINCT user_id) AS n_active,
      |       count(*) AS n_id_days
      |FROM w GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** q116: zone-map pruning audit — per-bucket min/max replayed
    * literally (the coalesce(...) TRUE arm is the all-NULL-bucket
    * prunability rule), matched counts from the fact rows directly.
    */
  val zoneMapAudit: String =
    """WITH preds(pred_idx, lo, hi) AS (VALUES
      |  (0, 48, 100), (1, 250, 300), (2, 500, 600)),
      |layouts AS (
      |  SELECT 'insertion' AS layout, doc_id // 50 AS b, n_chars
      |  FROM documents
      |  UNION ALL
      |  SELECT 'clustered', n_chars // 50, n_chars FROM documents),
      |zm AS (
      |  SELECT layout, b, min(n_chars) AS mn, max(n_chars) AS mx,
      |         count(*) AS cnt
      |  FROM layouts GROUP BY 1, 2),
      |matched AS (
      |  SELECT layout, pred_idx,
      |         count(*) FILTER (n_chars BETWEEN lo AND hi) AS m
      |  FROM layouts CROSS JOIN preds GROUP BY 1, 2),
      |aud AS (
      |  SELECT zm.layout, p.pred_idx, p.lo, p.hi,
      |    count(*) AS n_buckets,
      |    sum(CASE WHEN coalesce(mx < lo OR mn > hi, TRUE)
      |        THEN 1 ELSE 0 END) AS n_pruned,
      |    sum(cnt) AS rows_total,
      |    sum(CASE WHEN coalesce(mx < lo OR mn > hi, TRUE)
      |        THEN 0 ELSE cnt END) AS rows_scanned
      |  FROM zm CROSS JOIN preds p GROUP BY 1, 2, 3, 4)
      |SELECT aud.*, matched.m AS rows_matched
      |FROM aud JOIN matched USING (layout, pred_idx)
      |ORDER BY layout, pred_idx""".stripMargin

  /** q117: range assignment — q114's nearest-rank boundaries, then each
    * row's range_idx = count of boundaries strictly below its value
    * (the assignRanges rule) via a correlated count.
    */
  val rangeAssign: String =
    """WITH r AS (
      |  SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rk,
      |    count(*) OVER () AS n
      |  FROM documents WHERE n_chars IS NOT NULL),
      |b(p) AS (VALUES (125), (250), (375), (500), (625), (750), (875)),
      |bv AS (
      |  SELECT max(CASE WHEN rk = (p * n + 999) // 1000
      |    THEN n_chars END) AS bval
      |  FROM r, b GROUP BY p),
      |a AS (
      |  SELECT n_chars,
      |    (SELECT count(*) FROM bv WHERE bval < n_chars) AS range_idx
      |  FROM documents WHERE n_chars IS NOT NULL)
      |SELECT range_idx, count(*) AS n, min(n_chars) AS mn_chars,
      |       max(n_chars) AS mx_chars
      |FROM a GROUP BY 1 ORDER BY 1""".stripMargin

  /** q118: FK audit — left join against the distinct dim key set, null
    * FKs counted apart (MATCH SIMPLE), orphan extents via CASE min/max.
    */
  val fkAudit: String =
    """WITH a1 AS (
      |  SELECT 'orders.o_custkey->customer' AS fk_name,
      |    count(*) AS n_rows,
      |    count(*) FILTER (o_custkey IS NULL) AS n_null_rows,
      |    count(*) FILTER (o_custkey IS NOT NULL
      |      AND d.c_custkey IS NULL) AS n_orphan_rows,
      |    count(DISTINCT CASE WHEN d.c_custkey IS NULL
      |      THEN o_custkey END) AS n_orphan_keys,
      |    min(CASE WHEN d.c_custkey IS NULL THEN o_custkey END)
      |      AS min_orphan_key,
      |    max(CASE WHEN d.c_custkey IS NULL THEN o_custkey END)
      |      AS max_orphan_key
      |  FROM orders o LEFT JOIN
      |    (SELECT DISTINCT c_custkey FROM customer) d
      |    ON o.o_custkey = d.c_custkey),
      |a2 AS (
      |  SELECT 'events.user_id->customer_ge50' AS fk_name,
      |    count(*) AS n_rows,
      |    count(*) FILTER (user_id IS NULL) AS n_null_rows,
      |    count(*) FILTER (user_id IS NOT NULL
      |      AND d.c_custkey IS NULL) AS n_orphan_rows,
      |    count(DISTINCT CASE WHEN d.c_custkey IS NULL
      |      THEN user_id END) AS n_orphan_keys,
      |    min(CASE WHEN d.c_custkey IS NULL THEN user_id END)
      |      AS min_orphan_key,
      |    max(CASE WHEN d.c_custkey IS NULL THEN user_id END)
      |      AS max_orphan_key
      |  FROM events e LEFT JOIN
      |    (SELECT DISTINCT c_custkey FROM customer
      |     WHERE c_custkey >= 50) d
      |    ON e.user_id = d.c_custkey)
      |SELECT * FROM a1 UNION ALL SELECT * FROM a2
      |ORDER BY fk_name""".stripMargin

  /** q119: skew diagnosis — per-key counts, top-3 by (n DESC, key ASC
    * NULLS FIRST) matching Spark's asc_nulls_first, and the same
    * integer hot-key rule (2x average gate, ceil split factor).
    */
  val skewDiagnose: String = {
    def one(diag: String, table: String, keyCol: String) =
      s"""SELECT '$diag' AS diag, key_rank, key_value, n,
         |    n * 1000 // n_rows AS share_permille, n_rows, n_keys,
         |    CASE WHEN max_n * n_keys >= 2 * n_rows
         |      THEN (max_n * n_keys + n_rows - 1) // n_rows
         |      ELSE 1 END AS rec_salts
         |  FROM (
         |    SELECT row_number() OVER (ORDER BY n DESC,
         |        key_value ASC NULLS FIRST) AS key_rank, key_value, n
         |    FROM (SELECT CAST($keyCol AS VARCHAR) AS key_value,
         |          count(*) AS n FROM $table GROUP BY 1)
         |    QUALIFY key_rank <= 3) CROSS JOIN (
         |    SELECT sum(n) AS n_rows, count(*) AS n_keys,
         |           max(n) AS max_n
         |    FROM (SELECT count(*) AS n FROM $table
         |          GROUP BY CAST($keyCol AS VARCHAR)))""".stripMargin
    s"""${one("documents.lang", "documents", "lang")}
       |UNION ALL
       |${one("events.event_type", "events", "event_type")}
       |ORDER BY diag, key_rank""".stripMargin
  }

  /** q120: max-gap audit — the NAIVE route (full per-key sort + lag),
    * which the bucketed two-pass must match exactly; single-event keys
    * have NULL max_gap (max over an empty gap set).
    */
  val feedFreshness: String =
    """WITH e AS (
      |  SELECT event_type, ts, epoch_us(ts) AS us
      |  FROM events WHERE ts IS NOT NULL),
      |g AS (
      |  SELECT event_type, ts, us,
      |    us - lag(us) OVER (PARTITION BY event_type ORDER BY us)
      |      AS gap
      |  FROM e)
      |SELECT event_type, count(*) AS n, min(ts) AS first_ts,
      |  max(ts) AS last_ts, max(us) - min(us) AS span_us,
      |  max(gap) AS max_gap_us
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** q121: FD audit — per-lhs distinct-rhs counts with the NULL-adds-
    * one rule, folded to one verdict row per FD.
    */
  val fdAudit2: String = {
    def one(fd: String, table: String, l: String, r: String) =
      s"""SELECT '$fd' AS fd_name,
         |  coalesce(sum(n), 0) AS n_rows, count(*) AS n_lhs,
         |  coalesce(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0)
         |    AS n_violating_lhs,
         |  coalesce(sum(CASE WHEN k > 1 THEN n ELSE 0 END), 0)
         |    AS n_rows_in_violations,
         |  coalesce(max(k), 0) AS max_rhs_per_lhs
         |FROM (
         |  SELECT $l AS l, count(*) AS n,
         |    count(DISTINCT $r) +
         |      max(CASE WHEN $r IS NULL THEN 1 ELSE 0 END) AS k
         |  FROM $table GROUP BY 1)""".stripMargin
    s"""${one("nation.n_nationkey->n_regionkey", "nation",
        "n_nationkey", "n_regionkey")}
       |UNION ALL
       |${one("customer.c_nationkey->c_mktsegment", "customer",
        "c_nationkey", "c_mktsegment")}
       |ORDER BY fd_name""".stripMargin
  }

  /** q122: keep-best — the window-replay form of the (score DESC,
    * id ASC) argmax the aggregate computes sort-free.
    */
  val keepBest: String =
    """WITH m AS (
      |  SELECT md5(substr(text, 1, 40)) AS cluster_fp, doc_id, n_chars
      |  FROM documents WHERE n_chars IS NOT NULL),
      |r AS (
      |  SELECT cluster_fp, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY cluster_fp
      |      ORDER BY n_chars DESC, doc_id ASC) AS rk,
      |    count(*) OVER (PARTITION BY cluster_fp) AS n_members
      |  FROM m)
      |SELECT cluster_fp, n_members, doc_id AS kept_id,
      |       n_chars AS kept_score
      |FROM r WHERE rk = 1 AND n_members >= 2
      |ORDER BY cluster_fp NULLS FIRST""".stripMargin

  /** q123: SCD-2 build — the naive single-window replay: null-safe
    * change detection over (key ORDER BY ts, value NULLS FIRST —
    * Spark's asc default), cumulative run ids, lead to close each
    * interval; last interval per key stays open (NULL valid_to).
    */
  val stateIntervals: String =
    """WITH e AS (
      |  SELECT user_id, event_type AS v, ts, event_id FROM events
      |  WHERE ts IS NOT NULL),
      |f AS (
      |  SELECT user_id, v, ts, event_id,
      |    CASE WHEN v IS DISTINCT FROM lag(v) OVER w
      |      THEN 1 ELSE 0 END AS chg
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id
      |    ORDER BY ts ASC, v ASC NULLS FIRST, event_id ASC)),
      |g AS (
      |  SELECT user_id, v, ts,
      |    sum(chg) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, v ASC NULLS FIRST, event_id ASC
      |      ROWS UNBOUNDED PRECEDING) AS gid
      |  FROM f),
      |runs AS (
      |  SELECT user_id, v AS event_type, min(ts) AS valid_from,
      |    count(*) AS n_events
      |  FROM g GROUP BY user_id, gid, v)
      |SELECT user_id, event_type, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id
      |    ORDER BY valid_from ASC, event_type ASC NULLS FIRST)
      |    AS valid_to,
      |  n_events
      |FROM runs
      |ORDER BY user_id, valid_from, event_type NULLS FIRST""".stripMargin

  /** q124: top session paths — the q60 session-boundary rule at a
    * 30-minute gap, row_number order (ts, event_id), string_agg path
    * over the rn<=5 prefix, top-10 by (n DESC, path ASC).
    */
  val topPaths: String =
    """WITH b AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
      |              > 1800000000
      |         THEN 1 ELSE 0 END AS nb
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM b),
      |r AS (
      |  SELECT user_id, session_idx,
      |    coalesce(CAST(event_type AS VARCHAR), '(null)') AS t,
      |    row_number() OVER (PARTITION BY user_id, session_idx
      |      ORDER BY ts, event_id) AS rn
      |  FROM s),
      |p AS (
      |  SELECT user_id, session_idx,
      |    string_agg(t, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 5 GROUP BY 1, 2),
      |c AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY 1)
      |SELECT row_number() OVER (ORDER BY n_sessions DESC, path ASC)
      |    AS path_rank, path, n_sessions
      |FROM c QUALIFY path_rank <= 10 ORDER BY path_rank""".stripMargin

  /** q125: TTL plan — per-bucket expiry accounting replayed literally;
    * NULL ts is live (expiry unprovable), counted apart.
    */
  val ttlPlan: String =
    """WITH layouts AS (
      |  SELECT 'insertion' AS layout, event_id // 500 AS b, ts
      |  FROM events
      |  UNION ALL
      |  SELECT 'time', epoch_us(ts) // 86400000000, ts FROM events),
      |pb AS (
      |  SELECT layout, b, count(*) AS n,
      |    count(*) FILTER (ts IS NOT NULL AND
      |      ts < TIMESTAMP '2024-01-15 00:00:00') AS e,
      |    count(*) FILTER (ts IS NULL) AS nul
      |  FROM layouts GROUP BY 1, 2)
      |SELECT layout,
      |  CASE WHEN e = n THEN 'drop' WHEN e = 0 THEN 'keep'
      |       ELSE 'rewrite' END AS verdict,
      |  count(*) AS n_buckets, sum(n) AS rows_total,
      |  sum(e) AS rows_expired, sum(n - e) AS rows_live,
      |  sum(nul) AS n_null_ts
      |FROM pb GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q126: join-size forecast — histogram join, exact per-key products
    * and totals, top-5 by (pair_rows DESC, key ASC).
    */
  val joinForecast: String =
    """WITH ha AS (
      |  SELECT user_id, count(*) AS n_left FROM events GROUP BY 1),
      |hb AS (
      |  SELECT o_custkey AS user_id, count(*) AS n_right FROM orders
      |  GROUP BY 1),
      |j AS (
      |  SELECT ha.user_id, n_left, n_right, n_left * n_right
      |    AS pair_rows
      |  FROM ha JOIN hb USING (user_id)),
      |t AS (
      |  SELECT sum(pair_rows) AS total_pair_rows,
      |         count(*) AS n_matched_keys FROM j)
      |SELECT row_number() OVER (ORDER BY pair_rows DESC,
      |    user_id ASC NULLS FIRST) AS key_rank,
      |  user_id, n_left, n_right, pair_rows, total_pair_rows,
      |  n_matched_keys
      |FROM j CROSS JOIN t
      |QUALIFY key_rank <= 5 ORDER BY key_rank""".stripMargin

  /** q127: throttle replay — first-5-per-hour per user; the same
    * row_number admission rule over (ts, event_id).
    */
  val throttleAudit: String =
    """WITH r AS (
      |  SELECT user_id,
      |    (epoch_us(ts) // 3600000000) AS w,
      |    row_number() OVER (PARTITION BY user_id,
      |      epoch_us(ts) // 3600000000
      |      ORDER BY ts, event_id) AS rn
      |  FROM events WHERE ts IS NOT NULL)
      |SELECT user_id, count(*) AS n_events,
      |  count(*) FILTER (rn <= 5) AS n_admitted,
      |  count(*) FILTER (rn > 5) AS n_dropped,
      |  count(DISTINCT w) AS n_windows,
      |  count(*) FILTER (rn = 6) AS n_capped_windows
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** q128: diversified top-k — rank within source, keep <=2, then the
    * global top-10; both orders (n_chars DESC, doc_id ASC).
    */
  val diversifiedTopK: String =
    """WITH g AS (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id ASC) AS gr
      |  FROM documents WHERE n_chars IS NOT NULL),
      |q AS (SELECT * FROM g WHERE gr <= 2)
      |SELECT row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)
      |    AS rank, doc_id, source, n_chars
      |FROM q QUALIFY rank <= 10 ORDER BY rank""".stripMargin

  /** q129: weighted quantiles — the direct crossing-row replay: value-
    * sorted cumulative weights, the unique row with cw−w < r ≤ cw at
    * the same integer ceil-rank r.
    */
  val weightedQuantiles: String =
    """WITH t AS (
      |  SELECT lang, n_chars AS v, n_chars AS w FROM documents
      |  WHERE n_chars IS NOT NULL),
      |r AS (
      |  SELECT lang, v, w,
      |    sum(w) OVER (PARTITION BY lang ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS cw,
      |    sum(w) OVER (PARTITION BY lang) AS tot
      |  FROM t),
      |p(label, pm) AS (VALUES ('50', 500), ('90', 900), ('99', 990)),
      |x AS (
      |  SELECT lang, label, v
      |  FROM r CROSS JOIN p
      |  WHERE cw >= (pm * tot + 999) // 1000
      |    AND cw - w < (pm * tot + 999) // 1000)
      |SELECT lang,
      |  max(CASE WHEN label = '50' THEN v END) AS p_50,
      |  max(CASE WHEN label = '90' THEN v END) AS p_90,
      |  max(CASE WHEN label = '99' THEN v END) AS p_99
      |FROM x GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin

  /** q130: as-of snapshot — the q123 interval build wrapped as a
    * subquery, then the same half-open predicate at the literal T.
    */
  val scdSnapshot: String =
    s"""WITH iv AS ($stateIntervals)
       |SELECT user_id, event_type AS state, valid_from AS since,
       |       n_events
       |FROM iv
       |WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
       |  AND (valid_to IS NULL
       |       OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
       |ORDER BY user_id""".stripMargin

  /** q131: categorical TVD — counts per lang in each half, full outer
    * (0 for absence), cross-multiplied integer arithmetic; permille by
    * integral division, all in DuckDB's exact HUGEINT.
    */
  val distCompare: String =
    """WITH ca AS (
      |  SELECT lang AS k, count(*) AS na FROM documents
      |  WHERE doc_id % 2 = 0 GROUP BY 1),
      |cb AS (
      |  SELECT lang AS k, count(*) AS nb FROM documents
      |  WHERE doc_id % 2 = 1 GROUP BY 1),
      |j AS (
      |  SELECT coalesce(ca.na, 0) AS na, coalesce(cb.nb, 0) AS nb
      |  FROM ca FULL OUTER JOIN cb ON ca.k IS NOT DISTINCT FROM cb.k),
      |t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM j)
      |SELECT min(ta) AS n_a, min(tb) AS n_b, count(*) AS n_keys,
      |  sum(CASE WHEN nb = 0 THEN 1 ELSE 0 END) AS n_keys_only_a,
      |  sum(CASE WHEN na = 0 THEN 1 ELSE 0 END) AS n_keys_only_b,
      |  sum(abs(na * tb - nb * ta)) AS tvd_num,
      |  min(ta) * min(tb) * 2 AS tvd_den,
      |  (sum(abs(na * tb - nb * ta)) * 1000) // (min(ta) * min(tb) * 2)
      |    AS tvd_permille
      |FROM j CROSS JOIN t""".stripMargin

  /** q132: OOV rate — the shared \s+ tokenizer, global top-500 vocab
    * by (freq DESC, word ASC), left join, per-lang fold.
    */
  val oovRate: String =
    """WITH w AS (
      |  SELECT lang, unnest(list_filter(
      |    string_split_regex(lower(text), '\s+'),
      |    t -> len(t) > 0)) AS word
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      |vc AS (SELECT word, count(*) AS freq FROM w GROUP BY 1),
      |v AS (
      |  SELECT word FROM vc
      |  QUALIFY row_number() OVER (ORDER BY freq DESC, word ASC)
      |    <= 500),
      |j AS (
      |  SELECT w.lang, w.word, v.word AS vw
      |  FROM w LEFT JOIN v ON w.word = v.word)
      |SELECT lang, count(*) AS n_tokens,
      |  count(*) FILTER (vw IS NULL) AS n_oov,
      |  count(DISTINCT CASE WHEN vw IS NULL THEN word END)
      |    AS n_oov_types,
      |  (count(*) FILTER (vw IS NULL)) * 1000 // count(*)
      |    AS oov_permille
      |FROM j GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin

  /** q133: streaks — the same day − row_number island constant over
    * the dedup'd (id, day) set; longest tie = earliest start; last =
    * max end (unique per id).
    */
  val streaks: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      |r AS (
      |  SELECT user_id, d,
      |    d - row_number() OVER (PARTITION BY user_id ORDER BY d)
      |      AS isl
      |  FROM ud),
      |i AS (
      |  SELECT user_id, isl, count(*) AS len, min(d) AS s, max(d) AS e
      |  FROM r GROUP BY 1, 2),
      |agg AS (
      |  SELECT user_id, sum(len) AS n_active_days,
      |    count(*) AS n_streaks, max(len) AS longest_streak
      |  FROM i GROUP BY 1),
      |lg AS (
      |  SELECT i.user_id, min(s) AS longest_start_day
      |  FROM i JOIN agg USING (user_id)
      |  WHERE len = longest_streak GROUP BY 1),
      |la AS (
      |  SELECT user_id, len AS last_streak, e AS last_active_day
      |  FROM i
      |  QUALIFY row_number() OVER (PARTITION BY user_id
      |    ORDER BY e DESC) = 1)
      |SELECT agg.user_id, n_active_days, n_streaks, longest_streak,
      |       longest_start_day, last_streak, last_active_day
      |FROM agg JOIN lg USING (user_id) JOIN la USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** q134: dow deviation — per-date counts, isodow (1=Mon..7=Sun,
    * matching the op's shifted dayofweek), baseline PAIRS, integer
    * permille via products-before-division.
    */
  val dowDeviation: String =
    """WITH pd AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events
      |  WHERE ts IS NOT NULL GROUP BY 1),
      |pdw AS (SELECT day, n, isodow(day) AS dow_iso FROM pd),
      |b AS (
      |  SELECT dow_iso, sum(n) AS dow_total, count(*) AS n_days
      |  FROM pdw GROUP BY 1)
      |SELECT day, dow_iso, n, dow_total, n_days,
      |  n * n_days * 1000 // dow_total AS deviation_permille
      |FROM pdw JOIN b USING (dow_iso) ORDER BY day""".stripMargin

  /** q135: containment join — the naive all-ordered-pairs replay over
    * the same doc subset; containment = one IEEE division of exact
    * ints.
    */
  val containment: String =
    """WITH t AS (
      |  SELECT doc_id, list_distinct(list_filter(
      |    string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0)) AS s
      |  FROM documents
      |  WHERE doc_id % 5 = 0 AND doc_id IS NOT NULL
      |    AND text IS NOT NULL),
      |t2 AS (SELECT * FROM t WHERE len(s) > 0)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  len(list_intersect(a.s, b.s)) AS inter,
      |  len(a.s) AS size_a, len(b.s) AS size_b,
      |  len(list_intersect(a.s, b.s)) / len(a.s) AS containment
      |FROM t2 a, t2 b
      |WHERE a.doc_id != b.doc_id
      |  AND len(list_intersect(a.s, b.s)) * 1000 >= 950 * len(a.s)
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q136: actor concentration — the same sorted-cumulative Gini
    * identity over per-(type, user) counts; tie-order-invariant, so
    * any rank order agrees.
    */
  val concentration: String =
    """WITH c AS (
      |  SELECT event_type, user_id, count(*) AS x FROM events
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, x,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY x ASC, user_id ASC NULLS FIRST) AS i
      |  FROM c)
      |SELECT event_type, count(*) AS n_actors, sum(x) AS n_events,
      |  (2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1000
      |    // (count(*) * sum(x)) AS gini_permille,
      |  max(x) * 1000 // sum(x) AS top1_permille
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
}
