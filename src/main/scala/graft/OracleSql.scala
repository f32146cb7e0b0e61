package graft

import graft.config.GoldenConfig._

/** DuckDB oracle SQL for every SQL-expressible query in [[Queries]].
  *
  * The oracles recompute each operator from first principles in ANSI-ish
  * DuckDB SQL over the same parquet tables — including the full MinHash/
  * LSH/verify/connected-components pipeline — using the identical mod-P
  * integer arithmetic pinned in [[graft.config.GoldenConfig]], so results
  * hash-match the Spark outputs bit-for-bit.
  *
  * DuckDB-vs-Spark parity notes baked in here:
  *  - `xor(a,b)` (DuckDB `^` is power), `//` integer division (`div` in Spark)
  *  - every aggregate cast `::BIGINT` (DuckDB sum(BIGINT) is HUGEINT)
  *  - DuckDB `range(a,b)` end-exclusive == Spark `sequence(a,b-1)` inclusive
  *  - list slicing `l[a:b]` 1-based inclusive == Spark `slice(l, a, b-a+1)`
  *  - double folds are left-folds in identical order on both sides
  */
object OracleSql {

  private val B = StrBase   // 31
  private val M = LcgMul    // 1103515245
  private val K = ShingleK
  private val L = SubstringL

  /** Polynomial string hash of SQL expression `g` into [0, P).
    * The `IF c <> ''` guard matters: DuckDB string_split_regex('','') yields
    * [''] and unicode('') = -1, so an EMPTY string (empty doc, or an empty
    * token from consecutive spaces) would hash to -1 and propagate a
    * negative value through the mod — while Spark's kernel and builtin both
    * return 0. With the guard all three agree (empty string → fold over no
    * chars → 0). */
  private def strHash(g: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), [unicode(c)::BIGINT FOR c IN string_split_regex($g,'') IF c <> '']), (h,c) -> (h*$B+c) % $P)"

  private val toks =
    "toks AS (SELECT doc_id, string_split(lower(text),' ') AS t FROM documents)"

  private def shinglesCte(k: Int, name: String = "sh") =
    s"$name AS (SELECT doc_id, list_distinct([array_to_string(t[i+1:i+$k],' ') FOR i IN range(0, len(t)-${k - 1})]) AS s FROM toks WHERE len(t) >= $k)"

  private val shh =
    s"shh AS (SELECT doc_id, [${strHash("g")} FOR g IN s] AS xs FROM sh)"

  private val sig =
    s"sig AS (SELECT doc_id, [list_min([((($M*i + $LcgAddA) % $P) * x + (($M*(i+$BSeedOffset) + $LcgAddB) % $P)) % $P FOR x IN xs]) FOR i IN range(0,$NumHashes)] AS mh FROM shh)"

  private val bandsCte =
    s"bands AS (SELECT doc_id, j AS band_idx, list_reduce(list_prepend(CAST(0 AS BIGINT), mh[$RowsPerBand*j+1:$RowsPerBand*j+$RowsPerBand]), (h,m) -> (h*$B+m) % $P) AS band_hash FROM sig, unnest(range(0,$Bands)) AS u(j))"

  private val cand =
    "cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x JOIN bands y ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id)"

  private val ver =
    s"ver AS (SELECT c.a, c.b, len(list_intersect(sa.s, sb.s))::BIGINT AS inter, len(sa.s)::BIGINT AS na, len(sb.s)::BIGINT AS nb FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b WHERE len(list_intersect(sa.s, sb.s))*$TauDen >= $TauNum*(len(sa.s)+len(sb.s)-len(list_intersect(sa.s, sb.s))))"

  /** Cross (master × staging) candidate pairs: staging = doc_id % 4 == 0,
    * a = master id, b = staging id — mirrors Queries.crossDedupPairs. */
  private val candx =
    "candx AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x JOIN bands y ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash WHERE x.doc_id % 4 <> 0 AND y.doc_id % 4 = 0)"

  private val verx =
    s"verx AS (SELECT c.a, c.b, len(list_intersect(sa.s, sb.s))::BIGINT AS inter, len(sa.s)::BIGINT AS na, len(sb.s)::BIGINT AS nb FROM candx c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b WHERE len(list_intersect(sa.s, sb.s))*$TauDen >= $TauNum*(len(sa.s)+len(sb.s)-len(list_intersect(sa.s, sb.s))))"

  private val textPipeline =
    Seq(toks, shinglesCte(K), shh, sig, bandsCte, cand, ver).mkString(",\n ")

  /** Candidate pipeline up to (unfiltered) pair stats — shared by the
    * evaluation oracles (q28/q29). */
  private val scoredCand =
    Seq(toks, shinglesCte(K), shh, sig, bandsCte, cand,
      "sc AS (SELECT c.a, c.b, len(list_intersect(sa.s, sb.s))::BIGINT AS inter, len(sa.s)::BIGINT AS na, len(sb.s)::BIGINT AS nb FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b)")
      .mkString(",\n ")

  /** Left-fold double dot product of two DuckDB list expressions —
    * order-pinned, mirrors Spark's aggregate(zip_with(...)). */
  private def dotSql(x: String, y: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [$x[i+1]::DOUBLE * $y[i+1]::DOUBLE FOR i IN range(0, len($x))]), (a,v) -> a+v)"

  /** Random-hyperplane LSH bucket of a DuckDB list expression (mirrors
    * AnnSearch.lshBuckets; also used verbatim by q18). */
  private def bucketSql(v: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), [
 (CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    [$v[i+1]::DOUBLE * ((($M*(h*1024+i) + $LcgAddA) % $P) % 2 * 2 - 1)::DOUBLE FOR i IN range(0, len($v))]),
    (a,v) -> a+v) > 0 THEN 1 ELSE 0 END)::BIGINT
 FOR h IN range(${AnnHyperplanes - 1},-1,-1)]), (acc,b) -> acc*2+b)"""

  /** The [[graft.config.GoldenConfig.mix31]] avalanche as a lateral-alias
    * column chain (each step eval-once): emits aliases a1..b4 and the
    * final mixed value as `hm`. `in` may be any integer expression in
    * [0, 2^31); it is referenced twice (cheap scalar). */
  private def mix31Sql(in: String): String =
    s"""xor($in, ($in) >> 16) AS a1, (a1 * $Mix31C1) & $Mix31Mask AS a2,
   xor(a2, a2 >> 13) AS a3, (a3 * $Mix31C2) & $Mix31Mask AS a4,
   xor(a4, a4 >> 11) AS a5,
   xor(a5, a5 >> 16) AS b1, (b1 * $Mix31C1) & $Mix31Mask AS b2,
   xor(b2, b2 >> 13) AS b3, (b3 * $Mix31C2) & $Mix31Mask AS b4,
   xor(b4, b4 >> 11) AS hm"""

  /** SQ8 code CTE chain `c(vec_id, code)`: per-dim corpus min/max ranges,
    * codes = floor(((x-mn)·255.0)/(mx-mn)) clamped to [0,255] — same
    * double op order as AnnSearch.sq8Encode, so codes are bit-identical.
    * Shared by q65, q66/q67 (via [[phashSigsCte]]) and q72. */
  private def sq8Cte: String =
    s"""d AS (SELECT unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i FROM embeddings),
 mm AS (SELECT i, min(x) AS mn, max(x) AS mx FROM d GROUP BY i),
 ar AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM mm),
 c AS (SELECT vec_id, [CASE WHEN mxs[i] > mns[i]
     THEN least(255, floor(((embedding[i]::DOUBLE - mns[i]::DOUBLE) * 255.0) / (mxs[i]::DOUBLE - mns[i]::DOUBLE))::BIGINT)
     ELSE 0 END FOR i IN range(1, len(embedding)+1)] AS code
  FROM embeddings, ar)"""

  /** Brute-force cosine top-k (q17's oracle; also the first fusion leg
    * of q75 — CTE bodies may carry their own WITH). */
  private def q17Sql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
 s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
   list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [qv[i+1]::DOUBLE * embedding[i+1]::DOUBLE FOR i IN range(0, len(qv))]), (a,v) -> a+v)
   / sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [qv[i+1]::DOUBLE * qv[i+1]::DOUBLE FOR i IN range(0, len(qv))]), (a,v) -> a+v))
   / sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [embedding[i+1]::DOUBLE * embedding[i+1]::DOUBLE FOR i IN range(0, len(embedding))]), (a,v) -> a+v)) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
 rk AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)::BIGINT AS rank FROM s)
SELECT query_id, rank, neighbor_id FROM rk WHERE rank <= $AnnTopK ORDER BY query_id, rank"""

  /** SQ8 quantized top-k (q65's oracle; second fusion leg of q75). */
  private def q65Sql: String =
    s"""WITH $sq8Cte,
 q AS (SELECT vec_id AS query_id, code AS qc FROM c WHERE vec_id < 10),
 s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
   list_reduce(list_prepend(CAST(0 AS BIGINT), [qc[i+1]*code[i+1] FOR i IN range(0, len(qc))]), (a,v) -> a+v) AS qdot
  FROM q JOIN c ON c.vec_id <> q.query_id),
 rk AS (SELECT query_id, neighbor_id, qdot, row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id)::BIGINT AS rank FROM s)
SELECT query_id, rank, neighbor_id, qdot FROM rk WHERE rank <= $AnnTopK ORDER BY query_id, rank"""

  /** PQ assignment step: nearest codebook entry per (id, m) by exact
    * integer squared L2, ties to lowest k. Expects `sv(id, m, sub)`. */
  private def pqAssignSql(cents: String): String =
    s"""(SELECT id, m, k FROM (
   SELECT sv.id, sv.m, c.k,
    row_number() OVER (PARTITION BY sv.id, sv.m ORDER BY
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        [(sv.sub[i+1]-c.cent[i+1])*(sv.sub[i+1]-c.cent[i+1]) FOR i IN range(0,$PqSubLen)]),
        (a,v) -> a+v), c.k) AS rk
   FROM sv JOIN $cents c ON sv.m = c.m) WHERE rk = 1)"""

  /** PQ centroid update: round-half-up integer mean (2s+n)//(2n) per dim
    * (non-negative — // matches Spark's div); empty entries keep the
    * previous centroid. */
  private def pqUpdateSql(assign: String, prev: String): String =
    s"""(SELECT p.m, p.k, coalesce(u.cent, p.cent) AS cent
  FROM $prev p LEFT JOIN (
    SELECT m, k, list((2*s + n) // (2*n) ORDER BY pos) AS cent
    FROM (SELECT m, k, pos, sum(cv) AS s, count(*) AS n
          FROM (SELECT a.m AS m, a.k AS k, generate_subscripts(sv.sub,1) AS pos, unnest(sv.sub) AS cv
                FROM sv JOIN $assign a ON a.id = sv.id AND a.m = sv.m)
          GROUP BY m, k, pos)
    GROUP BY m, k) u ON u.m = p.m AND u.k = p.k)"""

  /** Shared CTE chain computing the DCT pHash signature table
    * `sg(vec_id, phash_hi, phash_lo)` from the embeddings table: SQ8 codes
    * (same double op order as Spark → bit-identical), separable fixed-point
    * DCT interpolated from the exact GoldenConfig.DctCoef integer literals,
    * 63 AC bits thresholded against their lower median, folded MSB-first
    * into (hi: 31 bits, lo: 32 bits). Used by q66 and q67. */
  private def phashSigsCte: String =
    s"""coef AS (SELECT ${graft.config.GoldenConfig.DctCoef.flatten.mkString("[", ", ", "]")} AS cf),
 $sq8Cte,
 g AS (SELECT vec_id, [list_reduce(list_prepend(CAST(0 AS BIGINT),
     [cf[(j//8)*8+x+1]*code[x*8+(j%8)+1] FOR x IN range(0,8)]), (a,v) -> a+v)
   FOR j IN range(0,64)] AS g FROM c, coef),
 f AS (SELECT vec_id, [list_reduce(list_prepend(CAST(0 AS BIGINT),
     [cf[(j%8)*8+y+1]*g[(j//8)*8+y+1] FOR y IN range(0,8)]), (a,v) -> a+v)
   FOR j IN range(0,64)] AS f FROM g, coef),
 m AS (SELECT vec_id, f, list_sort(f[2:64])[32] AS med FROM f),
 sg AS (SELECT vec_id,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
    [CASE WHEN f[i] > med THEN 1 ELSE 0 END FOR i IN range(2,33)]), (a,v) -> a*2+v) AS phash_hi,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
    [CASE WHEN f[i] > med THEN 1 ELSE 0 END FOR i IN range(33,65)]), (a,v) -> a*2+v) AS phash_lo
  FROM m)"""

  /** Banded variant of [[bucketSql]]: the bucket of table `t` (a SQL
    * expression) folds planes [t*r, (t+1)*r) high-to-low, r =
    * AnnBandPlanes — mirrors HashKernels.hyperplaneBucket(v, r, t*r). */
  private def bucketBandSql(v: String, t: String): String = {
    val r = AnnBandPlanes
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), [
 (CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    [$v[i+1]::DOUBLE * ((($M*(h*1024+i) + $LcgAddA) % $P) % 2 * 2 - 1)::DOUBLE FOR i IN range(0, len($v))]),
    (a,v) -> a+v) > 0 THEN 1 ELSE 0 END)::BIGINT
 FOR h IN range(($t+1)*$r - 1, $t*$r - 1, -1)]), (acc,b) -> acc*2+b)"""
  }

  /** Order-pinned cosine of two DuckDB list expressions (dot/√/√ in the
    * same division order as AnnSearch.cosine / rankTopK). */
  private def cosSql(x: String, y: String): String =
    s"${dotSql(x, y)} / sqrt(${dotSql(x, x)}) / sqrt(${dotSql(y, y)})"

  /** IVF oracle building blocks (q40) — mirror AnnSearch.{ivfCentroids,
    * assignToCentroids} with the fixed-point integer-sum centroid rule.
    * `e` = (id, vec float list), `qz` = (id, qvec milli-unit bigint list). */
  private def ivfAssign(cents: String): String =
    s"""(SELECT id, cid FROM (
 SELECT e.id, c.cid, row_number() OVER (PARTITION BY e.id ORDER BY ${cosSql("e.vec", "c.cvec")} DESC, c.cid) AS rk
 FROM e, $cents c) WHERE rk = 1)"""

  private def ivfUpdate(assign: String): String =
    s"""(SELECT cid, [CAST(x AS FLOAT4) FOR x IN sv] AS cvec FROM (
 SELECT cid, list(s ORDER BY i) AS sv FROM (
  SELECT a.cid, u.i, sum(qz.qvec[u.i+1])::BIGINT AS s
  FROM $assign a JOIN qz ON qz.id = a.id, unnest(range(0, len(qz.qvec))) AS u(i)
  GROUP BY a.cid, u.i) GROUP BY cid))"""

  private val simhashCtes = {
    val bits = SimHashBits
    s"""tok AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS token FROM documents),
 freq AS (SELECT doc_id, token, count(*)::BIGINT AS cnt FROM tok GROUP BY doc_id, token),
 th AS (SELECT doc_id, cnt, ${strHash("token")} AS h FROM freq),
 bits AS (SELECT doc_id, b, sum(cnt * (((h >> b) & 1)*2 - 1)) AS s FROM th, unnest(range(0,$bits)) AS u(b) GROUP BY doc_id, b),
 sim AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)::BIGINT AS simhash FROM bits GROUP BY doc_id)"""
  }

  val sql: Map[String, String] = Map(

    "q01_token_count" ->
      "SELECT doc_id, len(string_split(lower(text),' '))::BIGINT AS n_tokens FROM documents ORDER BY doc_id",

    "q02_wordcount" ->
      """SELECT token, count(*)::BIGINT AS cnt, count(DISTINCT doc_id)::BIGINT AS doc_cnt
FROM (SELECT doc_id, unnest(string_split(lower(text),' ')) AS token FROM documents)
GROUP BY token ORDER BY token""",

    "q03_shingle_stats" ->
      s"""WITH $toks
SELECT doc_id, (CASE WHEN len(t) >= $K THEN len(list_distinct([array_to_string(t[i+1:i+$K],' ') FOR i IN range(0, len(t)-${K - 1})])) ELSE 0 END)::BIGINT AS n_shingles
FROM toks ORDER BY doc_id""",

    "q04_minhash_sig" ->
      s"""WITH $toks, ${shinglesCte(K)}, $shh, $sig
SELECT doc_id, mh[1] AS mh_first, mh[${NumHashes / 2}] AS mh_mid, mh[$NumHashes] AS mh_last,
 list_reduce(list_prepend(CAST(0 AS BIGINT), mh), (a,x) -> (a+x) % $P) AS mh_sum
FROM sig ORDER BY doc_id""",

    "q05_lsh_bands" ->
      s"""WITH $toks, ${shinglesCte(K)}, $shh, $sig, $bandsCte
SELECT doc_id, band_idx, band_hash FROM bands ORDER BY doc_id, band_idx""",

    "q06_lsh_pairs" ->
      s"""WITH $toks, ${shinglesCte(K)}, $shh, $sig, $bandsCte, $cand
SELECT a, b FROM cand ORDER BY a, b""",

    "q07_verify_pairs" ->
      s"""WITH $toks, ${shinglesCte(K)}, $shh, $sig, $bandsCte, $cand, $ver
SELECT a, b, inter, na, nb FROM ver ORDER BY a, b""",

    "q08_dedup_clusters" ->
      s"""WITH RECURSIVE $textPipeline,
 reps AS (SELECT lower(text) AS lt, min(doc_id) AS rep FROM documents GROUP BY 1),
 exd AS (SELECT r.rep AS a, d.doc_id AS b FROM reps r JOIN (SELECT doc_id, lower(text) AS lt FROM documents) d USING (lt) WHERE d.doc_id <> r.rep),
 edges AS (SELECT a, b FROM ver UNION SELECT a, b FROM exd),
 ed AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
 reach(id, lbl) AS (SELECT a, a FROM ed UNION SELECT ed.b, reach.lbl FROM reach JOIN ed ON ed.a = reach.id),
 comp AS (SELECT id, min(lbl) AS cid FROM reach GROUP BY id)
SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN comp ON comp.id = d.doc_id ORDER BY d.doc_id""",

    "q09_exact_dedup" ->
      "SELECT doc_id, min(doc_id) OVER (PARTITION BY lower(text)) AS keeper FROM documents ORDER BY doc_id",

    "q10_simhash" ->
      s"""WITH $simhashCtes
SELECT doc_id, simhash FROM sim ORDER BY doc_id""",

    "q11_simhash_pairs" -> {
      val chunkBits = SimHashBits / HammingChunks
      val mask = (1L << chunkBits) - 1L
      s"""WITH $simhashCtes,
 bk AS (SELECT doc_id, c AS chunk_idx, (simhash >> (c*$chunkBits)) & $mask AS chunk_val FROM sim, unnest(range(0,$HammingChunks)) AS u(c)),
 cd AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bk x JOIN bk y ON x.chunk_idx = y.chunk_idx AND x.chunk_val = y.chunk_val AND x.doc_id < y.doc_id)
SELECT cd.a, cd.b, bit_count(xor(sa.simhash, sb.simhash))::BIGINT AS dist
FROM cd JOIN sim sa ON sa.doc_id = cd.a JOIN sim sb ON sb.doc_id = cd.b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= $HammingMax ORDER BY cd.a, cd.b"""
    },

    "q12_substring_pairs" ->
      s"""WITH $toks,
 th AS (SELECT doc_id, [${strHash("tok")} FOR tok IN t] AS hs FROM toks WHERE len(t) >= $L),
 gh AS (SELECT DISTINCT doc_id,
   unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i+1:i+$L]), (h,x) -> (h*$B+x) % $P) FOR i IN range(0, len(hs)-${L - 1})]) AS gram_hash
   FROM th),
 p AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM gh x JOIN gh y ON x.gram_hash = y.gram_hash AND x.doc_id < y.doc_id)
SELECT a, b FROM p ORDER BY a, b""",

    "q13_fingerprint" ->
      s"SELECT doc_id, ${strHash("lower(text)")} AS fp FROM documents ORDER BY doc_id",

    "q14_langid" -> {
      val counts = graft.operators.TextAnalysis.LangMarkers.map { case (lang, pat) =>
        s"(length(t)-length(replace(t,'$pat','')))//${pat.length} AS c_$lang"
      }.mkString(", ")
      val best = graft.operators.TextAnalysis.LangMarkers
        .map { case (l, _) => s"c_$l" }.mkString("greatest(", ", ", ")")
      val cases = graft.operators.TextAnalysis.LangMarkers
        .map { case (l, _) => s"WHEN c_$l = m AND m > 0 THEN '$l'" }.mkString(" ")
      s"""WITH base AS (SELECT doc_id, lower(text) AS t FROM documents),
 c AS (SELECT doc_id, $counts FROM base),
 g AS (SELECT *, $best AS m FROM c)
SELECT doc_id, c_en, c_de, c_es, c_fr, c_zh, (CASE $cases ELSE 'und' END) AS lang_guess
FROM g ORDER BY doc_id"""
    },

    "q15_quality" -> {
      val sw = graft.operators.TextAnalysis.Stopwords.map(s => s"'$s'").mkString("[", ",", "]")
      s"""WITH $toks, d AS (SELECT doc_id, length(text)::BIGINT AS n_chars FROM documents)
SELECT toks.doc_id,
 len(t)::BIGINT AS n_tokens,
 len(list_distinct(t))::BIGINT AS n_distinct,
 d.n_chars,
 len(list_intersect(t, $sw))::BIGINT AS distinct_stopwords,
 len([x FOR x IN t IF list_contains($sw, x)])::BIGINT AS stopword_cnt,
 (len(t) >= 10 AND len(t) <= 1000 AND len(list_distinct(t))*10 >= len(t)*2
  AND len([x FOR x IN t IF list_contains($sw, x)])*2 <= len(t)) AS quality_ok
FROM toks JOIN d ON d.doc_id = toks.doc_id ORDER BY toks.doc_id"""
    },

    "q16_sim_measures" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split(lower(text),' ')) AS ts FROM documents WHERE doc_id < 40)
SELECT x.doc_id AS a, y.doc_id AS b,
 len(list_intersect(x.ts, y.ts))::BIGINT AS inter,
 len(x.ts)::BIGINT AS na, len(y.ts)::BIGINT AS nb,
 (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts)))::BIGINT AS uni,
 (2*len(list_intersect(x.ts, y.ts)))::BIGINT AS dice_num,
 least(len(x.ts), len(y.ts))::BIGINT AS overlap_den,
 (least(len(x.ts), len(y.ts))*1000) // greatest(len(x.ts), len(y.ts)) AS relnum_millis
FROM t x JOIN t y ON x.doc_id < y.doc_id ORDER BY a, b""",

    "q17_ann_topk" -> q17Sql,

    // SQ8 scalar-quantized ANN: codes = floor(((x-mn)*255.0)/(mx-mn))
    // clamped to [0,255] over per-dim corpus min/max (same double op order
    // as Spark → bit-identical codes); scores are integer quantized dot
    // products — float-free output
    "q65_sq8_ann_topk" -> q65Sql,

    // Reciprocal-rank fusion (hybrid retrieval): the brute-force cosine
    // list and the SQ8 quantized list fuse by integer RRF scores
    // floor(1e9 / (60 + rank)) — engine-identical floor division on
    // positives, so the fused ranking hashes exactly
    "q75_rrf_fusion" ->
      s"""WITH bf AS ($q17Sql),
 sq AS ($q65Sql),
 u AS (SELECT query_id, neighbor_id, rank FROM bf
   UNION ALL SELECT query_id, neighbor_id, rank FROM sq),
 sc AS (SELECT query_id, neighbor_id, sum(1000000000 // (60 + rank))::BIGINT AS rrf
  FROM u GROUP BY 1, 2),
 rk AS (SELECT query_id, neighbor_id, rrf,
   row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id)::BIGINT AS rank FROM sc)
SELECT query_id, rank, neighbor_id, rrf FROM rk WHERE rank <= $AnnTopK ORDER BY query_id, rank""",

    // DCT perceptual hash over SQ8 8x8 blocks: the fixed-point DCT basis
    // is interpolated from GoldenConfig.DctCoef (integers pinned at build
    // time — no cross-engine cos()); bits threshold AC coefficients
    // against their lower median (sorted[32] of 63); 63 bits fold into
    // (hi: 31 bits, lo: 32 bits) MSB-first
    "q66_phash_dct" ->
      s"""WITH $phashSigsCte
SELECT vec_id, phash_hi, phash_lo FROM sg ORDER BY vec_id""",

    // pHash near-dup pairs: the oracle is BRUTE FORCE over all id<id
    // pairs (xor + bit_count over both signature halves), so a hash
    // match proves the Spark side's pigeonhole band join loses nothing
    // within the radius. Planted variants flip exactly one AC bit.
    "q67_phash_pairs" ->
      s"""WITH $phashSigsCte,
 u AS (SELECT vec_id AS id, phash_hi AS h, phash_lo AS l FROM sg
   UNION ALL SELECT vec_id + 1000000,
     CASE WHEN vec_id % 63 < 31 THEN xor(phash_hi, CAST(1 AS BIGINT) << CAST(30 - vec_id % 63 AS INT)) ELSE phash_hi END,
     CASE WHEN vec_id % 63 >= 31 THEN xor(phash_lo, CAST(1 AS BIGINT) << CAST(62 - vec_id % 63 AS INT)) ELSE phash_lo END
   FROM sg)
SELECT x.id AS a, y.id AS b,
 (bit_count(xor(x.h, y.h)) + bit_count(xor(x.l, y.l)))::BIGINT AS dist
FROM u x JOIN u y ON x.id < y.id
WHERE bit_count(xor(x.h, y.h)) + bit_count(xor(x.l, y.l)) <= 3
ORDER BY a, b""",

    // PQ-ADC ANN: per-subspace Lloyd's unrolled (3 iterations over all 8
    // subspaces at once — m is a grouping column), round-half-up integer
    // centroid means, exact integer L2 everywhere; adist = sum of the M
    // per-subspace table entries of each neighbor's code
    "q72_pq_ann_topk" ->
      s"""WITH $sq8Cte,
 sv AS (SELECT vec_id AS id, m, code[m*$PqSubLen+1:(m+1)*$PqSubLen] AS sub FROM c, (SELECT unnest(range($PqM)) AS m)),
 k0 AS (SELECT code, (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS k FROM (SELECT vec_id, code FROM c ORDER BY vec_id LIMIT $PqK)),
 c0 AS (SELECT m, k, code[m*$PqSubLen+1:(m+1)*$PqSubLen] AS cent FROM k0, (SELECT unnest(range($PqM)) AS m)),
 a1 AS ${pqAssignSql("c0")},
 c1 AS ${pqUpdateSql("a1", "c0")},
 a2 AS ${pqAssignSql("c1")},
 c2 AS ${pqUpdateSql("a2", "c1")},
 a3 AS ${pqAssignSql("c2")},
 c3 AS ${pqUpdateSql("a3", "c2")},
 enc AS ${pqAssignSql("c3")},
 qt AS (SELECT sv.id AS query_id, sv.m, c.k,
   list_reduce(list_prepend(CAST(0 AS BIGINT),
     [(sv.sub[i+1]-c.cent[i+1])*(sv.sub[i+1]-c.cent[i+1]) FOR i IN range(0,$PqSubLen)]),
     (a,v) -> a+v) AS pd
  FROM sv JOIN c3 c ON sv.m = c.m WHERE sv.id < 10),
 s AS (SELECT qt.query_id, e.id AS neighbor_id, sum(qt.pd)::BIGINT AS adist
   FROM enc e JOIN qt ON qt.m = e.m AND qt.k = e.k AND e.id <> qt.query_id
   GROUP BY qt.query_id, e.id),
 rk AS (SELECT query_id, neighbor_id, adist, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id)::BIGINT AS rank FROM s)
SELECT query_id, rank, neighbor_id, adist FROM rk WHERE rank <= $AnnTopK ORDER BY query_id, rank""",

    // Range join oracle = the RAW inequality join (quadratic is fine at
    // oracle scale); a hash match proves the Spark side's chunked
    // equi-join form is lossless. Half-open [ts, ts+1h).
    "q73_range_join" ->
      """SELECT p.event_id, a.event_id AS anchor_id
FROM events p JOIN (SELECT user_id, event_id, epoch_us(ts) AS st
                    FROM events WHERE event_type = 'purchase') a
 ON p.user_id = a.user_id
 AND epoch_us(p.ts) >= a.st AND epoch_us(p.ts) < a.st + 3600000000
ORDER BY 1, 2""",

    // Exact lower-rank percentiles over the (source, value) histogram:
    // smallest value whose cumulative count reaches ceil(p*n/100)
    "q74_percentiles" ->
      """WITH h AS (SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2),
 nn AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
 cum AS (SELECT h.source, h.n_chars,
   sum(c) OVER (PARTITION BY h.source ORDER BY h.n_chars) AS cum, nn.n
  FROM h JOIN nn USING (source))
SELECT source,
 min(CASE WHEN cum >= (50*n + 99)//100 THEN n_chars END)::BIGINT AS p50,
 min(CASE WHEN cum >= (90*n + 99)//100 THEN n_chars END)::BIGINT AS p90,
 min(CASE WHEN cum >= (99*n + 99)//100 THEN n_chars END)::BIGINT AS p99
FROM cum GROUP BY source ORDER BY source""",

    // As-of join via the union-merge window (identical algebra to the
    // Spark side; validated against DuckDB's correlated-subquery
    // formulation — greatest o_orderdate <= ts, ties by max o_orderkey)
    "q68_asof_join" ->
      """WITH u AS (
 SELECT user_id AS k, ts AS t, 1 AS side, event_id,
        NULL::BIGINT AS okey, NULL::DOUBLE AS oprice FROM events
 UNION ALL
 SELECT o_custkey, o_orderdate, 0, NULL, o_orderkey, o_totalprice FROM orders),
 w AS (SELECT k, t, side, event_id,
   last_value(CASE WHEN side = 0 THEN {'k2': okey, 'p': oprice} END IGNORE NULLS)
     OVER (PARTITION BY k ORDER BY t, side, okey NULLS LAST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS av
  FROM u)
SELECT event_id, k AS user_id, av.k2 AS asof_orderkey, av.p AS asof_price
FROM w WHERE side = 1 ORDER BY event_id""",

    // HyperLogLog registers: the token hash is first avalanched by the
    // 31-bit xorshift-multiply finalizer (GoldenConfig.mix31 — lateral
    // column aliases keep each step eval-once), then bucket = low p bits,
    // rho = 1 + trailing zeros of the 21-bit suffix (two's-complement
    // isolate-lowest-bit, identical bit algebra to the Spark side), zero
    // suffix -> sentinel MaxRho. Pure-integer register contract.
    "q69_hll_registers" ->
      s"""WITH toks AS (SELECT source, unnest(string_split(lower(text),' ')) AS tok FROM documents),
 hh AS (SELECT source, ${strHash("tok")} AS h FROM toks),
 mx AS (SELECT source, ${mix31Sql("h")}
  FROM hh),
 r AS (SELECT source, hm % ${graft.operators.Sketches.HllRegisters} AS bucket,
   CASE WHEN (hm >> ${graft.operators.Sketches.HllP}) = 0 THEN ${graft.operators.Sketches.HllMaxRho}
        ELSE bit_count(((hm >> ${graft.operators.Sketches.HllP}) & -(hm >> ${graft.operators.Sketches.HllP})) - 1) + 1 END AS rho
  FROM mx)
SELECT source, bucket::BIGINT AS bucket, max(rho)::BIGINT AS register
FROM r GROUP BY source, bucket ORDER BY source, bucket""",

    // Count-min sketch cells: per depth d the base hash is shifted by
    // d*54321 (mod 2^31 via &) then avalanched; cell = (d, hm % width).
    "q70_countmin" ->
      s"""WITH toks AS (SELECT unnest(string_split(lower(text),' ')) AS tok FROM documents),
 hh AS (SELECT ${strHash("tok")} AS h FROM toks),
 dd AS (SELECT h, unnest(range(${graft.operators.Sketches.CmDepth})) AS d FROM hh),
 mx AS (SELECT d, ${mix31Sql(s"(h + d * 54321) & $Mix31Mask")}
  FROM dd)
SELECT d::BIGINT AS d, (hm % ${graft.operators.Sketches.CmWidth})::BIGINT AS bucket, count(*)::BIGINT AS cnt
FROM mx GROUP BY d, hm % ${graft.operators.Sketches.CmWidth} ORDER BY d, bucket""",

    // Morton/Z-order interleave of the low 16 bits of both key columns:
    // base-4 fold from bit 15 down, custkey in even, orderkey in odd bits
    "q71_zorder" ->
      """SELECT o_orderkey,
 list_reduce(list_prepend(CAST(0 AS BIGINT),
   [(((o_orderkey & 65535) >> i) % 2) * 2 + (((o_custkey & 65535) >> i) % 2)
    FOR i IN range(15, -1, -1)]), (acc, v) -> acc * 4 + v) AS z
FROM orders ORDER BY o_orderkey""",

    "q18_ann_lsh_buckets" ->
      s"""SELECT vec_id, ${bucketSql("embedding")} AS bucket
FROM embeddings ORDER BY vec_id""",

    "q19_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
 sum(CAST(round(l_quantity*100) AS BIGINT))::BIGINT AS sum_qty_c,
 sum(CAST(round(l_extendedprice*100) AS BIGINT))::BIGINT AS sum_price_c,
 count(*)::BIGINT AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q20_join_revenue" ->
      """SELECT o_orderpriority,
 sum(CAST(round(l_extendedprice * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT))::BIGINT AS revenue_c,
 count(*)::BIGINT AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q21_semi_anti" ->
      """WITH w AS (SELECT c_nationkey, count(*)::BIGINT AS n_with FROM customer c
   WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) GROUP BY c_nationkey),
 wo AS (SELECT c_nationkey, count(*)::BIGINT AS n_without FROM customer c
   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) GROUP BY c_nationkey)
SELECT COALESCE(w.c_nationkey, wo.c_nationkey)::BIGINT AS nationkey,
 COALESCE(n_with, 0)::BIGINT AS n_with, COALESCE(n_without, 0)::BIGINT AS n_without
FROM w FULL OUTER JOIN wo ON w.c_nationkey = wo.c_nationkey ORDER BY nationkey""",

    "q22_window_topk" ->
      """SELECT o_custkey, rnk, o_orderkey FROM (
 SELECT o_custkey, o_orderkey,
  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rnk
 FROM orders) t WHERE rnk <= 2 ORDER BY o_custkey, rnk""",

    "q23_setops" ->
      """SELECT 'intersect' AS op, nationkey FROM (SELECT DISTINCT c_nationkey::BIGINT AS nationkey FROM customer INTERSECT SELECT DISTINCT s_nationkey::BIGINT FROM supplier) a
UNION ALL
SELECT 'except' AS op, nationkey FROM (SELECT DISTINCT c_nationkey::BIGINT AS nationkey FROM customer EXCEPT SELECT DISTINCT s_nationkey::BIGINT FROM supplier) b
UNION ALL
SELECT 'union' AS op, nationkey FROM (SELECT DISTINCT c_nationkey::BIGINT AS nationkey FROM customer UNION SELECT DISTINCT s_nationkey::BIGINT FROM supplier) c
ORDER BY op, nationkey""",

    "q24_json_events" ->
      """SELECT event_type, sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k, count(*)::BIGINT AS n
FROM events GROUP BY event_type ORDER BY event_type""",

    "q25_blocking_stats" ->
      "SELECT substr(lower(p_name),1,3) AS bkey, count(*)::BIGINT AS block_size FROM part GROUP BY 1 ORDER BY 1",

    // suffix-array pass: EXACT substring semantics — joins on the gram
    // string itself (q12 joins on the 31-bit gram hash and can emit rare
    // collision candidates; those are verified away downstream)
    "q27_suffix_array_pairs" ->
      s"""WITH $toks, ${shinglesCte(L, "g8")},
 gs AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id, unnest(s) AS g FROM g8)),
 p AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM gs x JOIN gs y ON x.g = y.g AND x.doc_id < y.doc_id)
SELECT a, b FROM p ORDER BY a, b""",

    "q26_block_histogram" ->
      """SELECT block_size, count(*)::BIGINT AS n_blocks FROM (
 SELECT substr(lower(p_name),1,3) AS bkey, count(*)::BIGINT AS block_size FROM part GROUP BY 1) t
GROUP BY block_size ORDER BY block_size""",

    // per-threshold precision/recall/F1 over unfiltered candidate scores;
    // gold = exact Jaccard >= tau (the verify criterion)
    "q28_threshold_curve" ->
      s"""WITH $scoredCand,
 sc3 AS (SELECT (inter*1000)//(na+nb-inter) AS score_millis, inter*$TauDen >= $TauNum*(na+nb-inter) AS gold FROM sc),
 th AS (SELECT t*100 AS thresh_millis FROM unnest(range(0,11)) AS u(t)),
 agg AS (SELECT thresh_millis,
   sum(CASE WHEN gold AND score_millis >= thresh_millis THEN 1 ELSE 0 END)::BIGINT AS tp,
   sum(CASE WHEN NOT gold AND score_millis >= thresh_millis THEN 1 ELSE 0 END)::BIGINT AS fp,
   sum(CASE WHEN gold AND score_millis < thresh_millis THEN 1 ELSE 0 END)::BIGINT AS fn
  FROM sc3, th GROUP BY thresh_millis)
SELECT thresh_millis, tp, fp, fn,
 CASE WHEN tp+fp > 0 THEN (tp*1000)//(tp+fp) ELSE 0 END AS precision_millis,
 CASE WHEN tp+fn > 0 THEN (tp*1000)//(tp+fn) ELSE 0 END AS recall_millis,
 CASE WHEN 2*tp+fp+fn > 0 THEN (tp*2000)//(2*tp+fp+fn) ELSE 0 END AS f1_millis
FROM agg ORDER BY thresh_millis""",

    // weighted multi-measure candidate score under the default ScoreConfig
    // (jaccard 500 / dice 300 / overlap 200, milli-units, integer division)
    "q29_weighted_scores" ->
      s"""WITH $scoredCand,
 m AS (SELECT a, b,
   (inter*1000)//(na+nb-inter) AS jaccard_millis,
   (inter*2000)//(na+nb) AS dice_millis,
   (inter*1000)//least(na,nb) AS overlap_millis
  FROM sc)
SELECT a, b, jaccard_millis, dice_millis, overlap_millis,
 (jaccard_millis*500 + dice_millis*300 + overlap_millis*200)//1000 AS score_millis
FROM m ORDER BY a, b""",

    // all five reference blocking schemes as (scheme, bkey, block_size)
    "q30_blocking_schemes" ->
      s"""WITH p AS (SELECT lower(p_name) AS n, p_retailprice, p_partkey FROM part),
 keys AS (
  SELECT 'simple' AS scheme, substr(n, 1, 3) AS bkey FROM p
  UNION ALL SELECT 'last_letters', substr(n, greatest(length(n)-2, 1), 3) FROM p
  UNION ALL SELECT 'list_token', unnest(string_split(n, ' ')) FROM p
  UNION ALL SELECT 'grid', CAST(CAST(floor(p_retailprice/100.0) AS BIGINT) AS VARCHAR) FROM p
  UNION ALL SELECT 'random', CAST(($M*p_partkey + $LcgAddA) % $P % 100 AS VARCHAR) FROM p)
SELECT scheme, bkey, count(*)::BIGINT AS block_size FROM keys
GROUP BY scheme, bkey ORDER BY scheme, bkey""",

    // LSH-bucket ANN: candidates from the bucket equi-join, exact cosine
    // re-rank within buckets (the q18 bucket + q17 cosine, end to end)
    "q31_ann_lsh_topk" ->
      s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
 q AS (SELECT vec_id AS query_id, bucket, embedding AS qv FROM b WHERE vec_id < 10),
 cand AS (SELECT q.query_id, c.vec_id AS neighbor_id, q.qv, c.embedding AS cv
   FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id),
 s AS (SELECT query_id, neighbor_id,
   ${dotSql("qv", "cv")} / sqrt(${dotSql("qv", "qv")}) / sqrt(${dotSql("cv", "cv")}) AS cos
  FROM cand),
 rk AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)::BIGINT AS rank FROM s)
SELECT query_id, rank, neighbor_id FROM rk WHERE rank <= $AnnTopK ORDER BY query_id, rank""",

    // entity version summary: first/last/current values per user in
    // (ts, event_id) order — deterministic surrogate for TimeUUID history
    "q32_version_history" ->
      """WITH v AS (SELECT user_id, event_id, event_type,
   CAST(round(value*100) AS BIGINT) AS value_c,
   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
   count(*) OVER (PARTITION BY user_id) AS nv
  FROM events)
SELECT user_id, max(nv)::BIGINT AS n_versions,
 max(CASE WHEN rn = 1 THEN event_id END)::BIGINT AS first_event_id,
 max(CASE WHEN rn = nv THEN event_id END)::BIGINT AS last_event_id,
 max(CASE WHEN rn = nv THEN event_type END) AS cur_event_type,
 max(CASE WHEN rn = nv THEN value_c END)::BIGINT AS cur_value_c
FROM v GROUP BY user_id ORDER BY user_id""",

    // word count over stopword-filtered + suffix-stemmed tokens (the
    // stemmer is a pinned CASE ladder, identical on both engines)
    "q33_wordcount_stemmed" -> {
      val sw = graft.operators.TextAnalysis.Stopwords.map(s => s"'$s'").mkString("[", ",", "]")
      s"""WITH $toks,
 ct AS (SELECT doc_id, unnest([x FOR x IN t IF NOT list_contains($sw, x) AND x <> '']) AS tok FROM toks),
 sm AS (SELECT doc_id, CASE
    WHEN ends_with(tok,'ing') AND length(tok) > 5 THEN substr(tok, 1, length(tok)-3)
    WHEN ends_with(tok,'ed') AND length(tok) > 4 THEN substr(tok, 1, length(tok)-2)
    WHEN ends_with(tok,'ly') AND length(tok) > 4 THEN substr(tok, 1, length(tok)-2)
    WHEN ends_with(tok,'es') AND length(tok) > 4 THEN substr(tok, 1, length(tok)-2)
    WHEN ends_with(tok,'s') AND length(tok) > 3 AND NOT ends_with(tok,'ss') THEN substr(tok, 1, length(tok)-1)
    ELSE tok END AS token FROM ct)
SELECT token, count(*)::BIGINT AS cnt, count(DISTINCT doc_id)::BIGINT AS doc_cnt
FROM sm GROUP BY token ORDER BY token"""
    },

    // integer tf-idf vectors: idf_milli = (1000*(N+1)) div (df+1)
    "q34_tfidf" ->
      """WITH tf AS (SELECT doc_id, tok AS token, count(*)::BIGINT AS tf
   FROM (SELECT doc_id, unnest(string_split(lower(text),' ')) AS tok FROM documents)
   GROUP BY doc_id, tok),
 dfreq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
 n AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
 (tf.tf * ((1000*(n.n+1))//(dfreq.df+1)))::BIGINT AS tfidf_milli
FROM tf JOIN dfreq USING (token) CROSS JOIN n
ORDER BY doc_id, token""",

    // exact integer cosine components between tf-idf vectors of doc pairs
    "q35_tfidf_cosine" ->
      """WITH tf AS (SELECT doc_id, tok AS token, count(*)::BIGINT AS tf
   FROM (SELECT doc_id, unnest(string_split(lower(text),' ')) AS tok FROM documents)
   GROUP BY doc_id, tok),
 dfreq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
 n AS (SELECT count(*)::BIGINT AS n FROM documents),
 v AS (SELECT doc_id, token, (tf * ((1000*(n.n+1))//(dfreq.df+1)))::BIGINT AS w
   FROM tf JOIN dfreq USING (token) CROSS JOIN n WHERE doc_id < 30),
 norms AS (SELECT doc_id, sum(w*w)::BIGINT AS n2 FROM v GROUP BY doc_id),
 dots AS (SELECT x.doc_id AS a, y.doc_id AS b, sum(x.w*y.w)::BIGINT AS dot
   FROM v x JOIN v y ON x.token = y.token AND x.doc_id < y.doc_id
   GROUP BY x.doc_id, y.doc_id)
SELECT a, b, dot, na.n2 AS na2, nb.n2 AS nb2
FROM dots JOIN norms na ON na.doc_id = a JOIN norms nb ON nb.doc_id = b
ORDER BY a, b""",

    // embedding near-dup: LSH bucket candidates + exact cosine >= tau
    // (tau = 0.4: the synthetic embeddings' max pairwise cosine is 0.47)
    "q36_embedding_near_dup" ->
      s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
 p AS (SELECT x.vec_id AS a, y.vec_id AS b, x.embedding AS xe, y.embedding AS ye
   FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
 s AS (SELECT a, b,
   ${dotSql("xe", "ye")} / sqrt(${dotSql("xe", "xe")}) / sqrt(${dotSql("ye", "ye")}) AS cos
  FROM p)
SELECT a AS vec_a, b AS vec_b FROM s WHERE cos >= 0.4 ORDER BY vec_a, vec_b""",

    // banded multi-table hyperplane ANN: table t folds the sign bits of
    // planes [t*r, (t+1)*r); candidates collide in ANY table, dedup'd,
    // exact-cosine re-ranked (mirrors AnnSearch.lshTopKBanded)
    "q37_ann_banded_topk" ->
      s"""WITH tb AS (SELECT vec_id, embedding, t, ${bucketBandSql("embedding", "t")} AS bucket
   FROM embeddings, unnest(range(0, $AnnBandTables)) AS u(t)),
 q AS (SELECT vec_id AS query_id, t, bucket, embedding AS qv FROM tb WHERE vec_id < 10),
 cand AS (SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
   FROM q JOIN tb c ON c.t = q.t AND c.bucket = q.bucket AND c.vec_id <> q.query_id),
 s AS (SELECT query_id, neighbor_id,
   ${dotSql("qv", "cv")} / sqrt(${dotSql("qv", "qv")}) / sqrt(${dotSql("cv", "cv")}) AS cos
  FROM (SELECT cand.query_id, cand.neighbor_id, q2.embedding AS qv, c2.embedding AS cv
    FROM cand JOIN embeddings q2 ON q2.vec_id = cand.query_id
    JOIN embeddings c2 ON c2.vec_id = cand.neighbor_id)),
 rk AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)::BIGINT AS rank FROM s)
SELECT query_id, rank, neighbor_id FROM rk WHERE rank <= $AnnTopK ORDER BY query_id, rank""",

    // production tokenizer: full stopword set + Porter-style longest-suffix
    // stemmer (mirrors TextAnalysis.StopwordsFull / stemTokenFull ladder)
    "q38_wordcount_rich" -> {
      val sw = graft.operators.TextAnalysis.StopwordsFull
        .map(s => s"'$s'").mkString("[", ",", "]")
      s"""WITH $toks,
 ct AS (SELECT doc_id, unnest([x FOR x IN t IF NOT list_contains($sw, x) AND x <> '']) AS tok FROM toks),
 sm AS (SELECT doc_id, CASE
    WHEN ends_with(tok,'ization') AND length(tok) > 8 THEN substr(tok, 1, length(tok)-7)||'ize'
    WHEN ends_with(tok,'ational') AND length(tok) > 8 THEN substr(tok, 1, length(tok)-7)||'ate'
    WHEN ends_with(tok,'fulness') AND length(tok) > 8 THEN substr(tok, 1, length(tok)-7)||'ful'
    WHEN ends_with(tok,'ousness') AND length(tok) > 8 THEN substr(tok, 1, length(tok)-7)||'ous'
    WHEN ends_with(tok,'iveness') AND length(tok) > 8 THEN substr(tok, 1, length(tok)-7)||'ive'
    WHEN ends_with(tok,'tional') AND length(tok) > 7 THEN substr(tok, 1, length(tok)-6)||'tion'
    WHEN ends_with(tok,'ments') AND length(tok) > 7 THEN substr(tok, 1, length(tok)-5)
    WHEN ends_with(tok,'ment') AND length(tok) > 6 THEN substr(tok, 1, length(tok)-4)
    WHEN ends_with(tok,'ness') AND length(tok) > 5 THEN substr(tok, 1, length(tok)-4)
    WHEN ends_with(tok,'ing') AND length(tok) > 5 THEN substr(tok, 1, length(tok)-3)
    WHEN ends_with(tok,'ies') AND length(tok) > 4 THEN substr(tok, 1, length(tok)-3)||'y'
    WHEN ends_with(tok,'ed') AND length(tok) > 4 THEN substr(tok, 1, length(tok)-2)
    WHEN ends_with(tok,'ly') AND length(tok) > 4 THEN substr(tok, 1, length(tok)-2)
    WHEN ends_with(tok,'es') AND length(tok) > 4 THEN substr(tok, 1, length(tok)-2)
    WHEN ends_with(tok,'s') AND length(tok) > 3 AND NOT ends_with(tok,'ss') THEN substr(tok, 1, length(tok)-1)
    ELSE tok END AS token FROM ct)
SELECT token, count(*)::BIGINT AS cnt, count(DISTINCT doc_id)::BIGINT AS doc_cnt
FROM sm GROUP BY token ORDER BY token"""
    },

    // Audio fingerprints: exact HUGEINT-mod-2^64 emulation of the JVM's
    // wrapping 64-bit arithmetic (AudioOps.decodePcmStub seed fold +
    // splitmix LCG + windowFeatures hash fold) — every step mirrored:
    // byte-slice windows, 256 LCG states per window (s>>>40 → −8388608 →
    // >>8 becomes s // 2^48 − 32768, exact because 2^23 | 2^48), the
    // window-hash fold, and the per-bit majority fingerprint (bit 63 via
    // HUGEINT → signed cast). Energy/zero-crossings are computed by
    // featureTable but never read by fingerprints, so the oracle skips
    // them. Byte values come from unicode(char) — identical to the JVM's
    // signed UTF-8 bytes on ASCII text only; measured on the edge fixture:
    // the 2 non-ASCII docs (accented, emoji) diverge exactly as this byte
    // model predicts while all 13 ASCII docs hash-match. A production
    // deployment feeds real codec bytes here, so the stub-only divergence
    // has no non-stub analog.
    "q39_audio_fingerprints" -> {
      val W = "18446744073709551616::HUGEINT"
      val pows = (0 until 64).map(BigInt(1) << _).mkString(",")
      s"""WITH d AS (SELECT doc_id AS audio_id, length(text)::BIGINT*20 + 1000 AS dur,
   [unicode(c)::HUGEINT FOR c IN string_split_regex(text,'') IF c <> ''] AS bs
  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
 win AS (SELECT audio_id, bs, dur, u.off FROM d,
   unnest(range(0, dur - least(1000, dur) + 1, 1000)) AS u(off)),
 sl AS (SELECT audio_id, off,
   bs[(len(bs)*off//dur)+1 : least(len(bs), greatest(len(bs)*off//dur + 1, len(bs)*(off+least(1000,dur))//dur))] AS sb
  FROM win),
 sd AS (SELECT audio_id, off,
   list_reduce(list_prepend(1125899906842597::HUGEINT, sb), (s, b) -> (s*31 + b) % $W) AS seed
  FROM sl),
 st AS (SELECT audio_id, off,
   list_reduce(list_prepend([seed], [[0::HUGEINT] FOR j IN range(0, 256)]),
     (acc, x) -> list_append(acc, (acc[-1]*6364136223846793005::HUGEINT + 1442695040888963407) % $W)) AS states
  FROM sd),
 wh AS (SELECT audio_id,
   list_reduce(list_prepend(0::HUGEINT,
     [s // 281474976710656::HUGEINT - 32768 FOR s IN states[2:257]]),
     (h, p) -> (h*$M + p + $LcgAddA + $W) % $W) AS u
  FROM st),
 agg AS (SELECT audio_id, b, sum(((u // ([$pows])[b+1]) % 2)*2 - 1) AS s
  FROM wh, unnest(range(0,64)) AS v(b) GROUP BY audio_id, b),
 fp AS (SELECT audio_id, sum(CASE WHEN s > 0 THEN ([$pows])[b+1] ELSE 0::HUGEINT END) AS f
  FROM agg GROUP BY audio_id)
SELECT audio_id, CAST(CASE WHEN f >= 9223372036854775808::HUGEINT THEN f - $W ELSE f END AS BIGINT) AS fingerprint
FROM fp ORDER BY audio_id"""
    },

    // IVF ANN, Lloyd's unrolled (3 fixed iterations, nlist=8, nprobe=4):
    // init = first nlist vectors (id order) milli-quantized; each round
    // assigns by cosine (ties → lowest cid) and re-centers on the
    // per-dimension BIGINT SUM of milli-quantized members (order-independent
    // ⇒ bit-reproducible; cosine is scale-invariant so the un-normalized
    // sum has the mean's direction) — mirrors AnnSearch.ivfCentroids/ivfTopK
    "q40_ann_ivf_topk" -> {
      val sc = IvfQuantScale
      s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
 qz AS (SELECT id, [CAST(round(vec[i+1]::DOUBLE * $sc) AS BIGINT) FOR i IN range(0, len(vec))] AS qvec FROM e),
 c0 AS (SELECT (row_number() OVER (ORDER BY id) - 1)::BIGINT AS cid,
   [CAST(x AS FLOAT4) FOR x IN qvec] AS cvec
  FROM (SELECT id, qvec FROM qz ORDER BY id LIMIT 8)),
 a1 AS ${ivfAssign("c0")},
 c1 AS ${ivfUpdate("a1")},
 a2 AS ${ivfAssign("c1")},
 c2 AS ${ivfUpdate("a2")},
 a3 AS ${ivfAssign("c2")},
 c3 AS ${ivfUpdate("a3")},
 lists AS ${ivfAssign("c3")},
 probes AS (SELECT query_id, cid FROM (
   SELECT q.id AS query_id, c.cid,
    row_number() OVER (PARTITION BY q.id ORDER BY ${cosSql("q.vec", "c.cvec")} DESC, c.cid) AS rk
   FROM e q, c3 c WHERE q.id < 10) WHERE rk <= 4),
 cand AS (SELECT p.query_id, l.id AS neighbor_id FROM probes p JOIN lists l USING (cid) WHERE l.id <> p.query_id),
 s AS (SELECT cand.query_id, cand.neighbor_id, ${cosSql("qe.vec", "ce.vec")} AS cos
  FROM cand JOIN e qe ON qe.id = cand.query_id JOIN e ce ON ce.id = cand.neighbor_id),
 rk AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)::BIGINT AS rank FROM s)
SELECT query_id, rank, neighbor_id FROM rk WHERE rank <= $AnnTopK ORDER BY query_id, rank"""
    },

    // SemDeDup semantic dedup: q40's unrolled fixed-point Lloyd's chain →
    // intra-cluster pairs with cosine >= 0.4 → recursive-CTE components →
    // keeper = member farthest from its own cluster centroid (min ccos,
    // ties by id). Same cosine division order as the Spark side throughout.
    "q60_semantic_dedup" -> {
      val sc = IvfQuantScale
      s"""WITH RECURSIVE e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
 qz AS (SELECT id, [CAST(round(vec[i+1]::DOUBLE * $sc) AS BIGINT) FOR i IN range(0, len(vec))] AS qvec FROM e),
 c0 AS (SELECT (row_number() OVER (ORDER BY id) - 1)::BIGINT AS cid,
   [CAST(x AS FLOAT4) FOR x IN qvec] AS cvec
  FROM (SELECT id, qvec FROM qz ORDER BY id LIMIT 8)),
 a1 AS ${ivfAssign("c0")},
 c1 AS ${ivfUpdate("a1")},
 a2 AS ${ivfAssign("c1")},
 c2 AS ${ivfUpdate("a2")},
 a3 AS ${ivfAssign("c2")},
 c3 AS ${ivfUpdate("a3")},
 lists AS ${ivfAssign("c3")},
 pr AS (SELECT l1.id AS a, l2.id AS b FROM lists l1 JOIN lists l2 ON l1.cid = l2.cid AND l1.id < l2.id),
 edges AS (SELECT pr.a, pr.b FROM pr JOIN e ea ON ea.id = pr.a JOIN e eb ON eb.id = pr.b
  WHERE ${cosSql("ea.vec", "eb.vec")} >= 0.4),
 ed AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
 reach(id, lbl) AS (SELECT a, a FROM ed UNION SELECT ed.b, reach.lbl FROM reach JOIN ed ON ed.a = reach.id),
 comp AS (SELECT id, min(lbl) AS grp FROM reach GROUP BY id),
 cc AS (SELECT e.id, COALESCE(comp.grp, e.id) AS group_id, ${cosSql("e.vec", "c.cvec")} AS ccos
  FROM e LEFT JOIN comp ON comp.id = e.id JOIN lists l ON l.id = e.id JOIN c3 c ON c.cid = l.cid),
 kp AS (SELECT group_id, id AS keeper FROM (
   SELECT group_id, id, row_number() OVER (PARTITION BY group_id ORDER BY ccos ASC, id ASC) AS rk FROM cc) WHERE rk = 1)
SELECT cc.id AS vec_id, cc.group_id, (cc.id = kp.keeper) AS keep
FROM cc JOIN kp USING (group_id) ORDER BY vec_id"""
    },

    // incremental (master × staging) dedup: verified cross pairs only —
    // a = master (doc_id % 4 <> 0), b = staging (doc_id % 4 = 0)
    "q41_cross_dedup_pairs" ->
      s"""WITH $toks, ${shinglesCte(K)}, $shh, $sig, $bandsCte, $candx, $verx
SELECT a, b, inter, na, nb FROM verx ORDER BY a, b""",

    // incremental clustering end-to-end: components over master-internal
    // verified pairs ∪ cross verified pairs ∪ per-side exact-dup stars ∪
    // exact cross edges. The Spark side emits rep-level edges; components
    // (and min-id labels) are identical to this all-pairs formulation.
    "q42_cross_dedup_clusters" ->
      s"""WITH RECURSIVE $toks, ${shinglesCte(K)}, $shh, $sig, $bandsCte, $cand, $ver, $candx, $verx,
 verm AS (SELECT a, b FROM ver WHERE a % 4 <> 0 AND b % 4 <> 0),
 repm AS (SELECT lower(text) AS lt, min(doc_id) AS rep FROM documents WHERE doc_id % 4 <> 0 GROUP BY 1),
 reps_ AS (SELECT lower(text) AS lt, min(doc_id) AS rep FROM documents WHERE doc_id % 4 = 0 GROUP BY 1),
 exdm AS (SELECT r.rep AS a, d.doc_id AS b FROM repm r JOIN (SELECT doc_id, lower(text) AS lt FROM documents WHERE doc_id % 4 <> 0) d USING (lt) WHERE d.doc_id <> r.rep),
 exds AS (SELECT r.rep AS a, d.doc_id AS b FROM reps_ r JOIN (SELECT doc_id, lower(text) AS lt FROM documents WHERE doc_id % 4 = 0) d USING (lt) WHERE d.doc_id <> r.rep),
 excr AS (SELECT m.rep AS a, s.rep AS b FROM repm m JOIN reps_ s USING (lt)),
 edges AS (SELECT a, b FROM verm UNION SELECT a, b FROM verx UNION SELECT a, b FROM exdm UNION SELECT a, b FROM exds UNION SELECT a, b FROM excr),
 ed AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
 reach(id, lbl) AS (SELECT a, a FROM ed UNION SELECT ed.b, reach.lbl FROM reach JOIN ed ON ed.a = reach.id),
 comp AS (SELECT id, min(lbl) AS cid FROM reach GROUP BY id)
SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN comp ON comp.id = d.doc_id ORDER BY d.doc_id""",

    // curation chain: quality filter → language filter → dedup clustering
    // of the survivors. Pipeline CTEs run over all documents; pairs are
    // filtered to kept ids — identical to running the pipeline on the
    // filtered subset (per-doc derivations are independent).
    "q43_corpus_curation" -> {
      val sw = graft.operators.TextAnalysis.Stopwords.map(s => s"'$s'").mkString("[", ",", "]")
      val counts = graft.operators.TextAnalysis.LangMarkers.map { case (lang, pat) =>
        s"(length(t)-length(replace(t,'$pat','')))//${pat.length} AS c_$lang"
      }.mkString(", ")
      val best = graft.operators.TextAnalysis.LangMarkers
        .map { case (l, _) => s"c_$l" }.mkString("greatest(", ", ", ")")
      val cases = graft.operators.TextAnalysis.LangMarkers
        .map { case (l, _) => s"WHEN c_$l = m AND m > 0 THEN '$l'" }.mkString(" ")
      s"""WITH RECURSIVE $toks, ${shinglesCte(K)}, $shh, $sig, $bandsCte, $cand, $ver,
 qual AS (SELECT doc_id FROM toks WHERE len(t) >= 10 AND len(t) <= 1000
   AND len(list_distinct(t))*10 >= len(t)*2
   AND len([x FOR x IN t IF list_contains($sw, x)])*2 <= len(t)),
 lbase AS (SELECT doc_id, lower(text) AS t FROM documents),
 lc AS (SELECT doc_id, $counts FROM lbase),
 lg AS (SELECT *, $best AS m FROM lc),
 lang AS (SELECT doc_id FROM lg WHERE (CASE $cases ELSE 'und' END) = 'en'),
 keep AS (SELECT q.doc_id FROM qual q JOIN lang l ON l.doc_id = q.doc_id),
 verk AS (SELECT v.a, v.b FROM ver v JOIN keep ka ON ka.doc_id = v.a JOIN keep kb ON kb.doc_id = v.b),
 repsk AS (SELECT lower(d.text) AS lt, min(d.doc_id) AS rep FROM documents d JOIN keep USING (doc_id) GROUP BY 1),
 exdk AS (SELECT r.rep AS a, d.doc_id AS b FROM repsk r JOIN (SELECT d2.doc_id, lower(d2.text) AS lt FROM documents d2 JOIN keep USING (doc_id)) d USING (lt) WHERE d.doc_id <> r.rep),
 edges AS (SELECT a, b FROM verk UNION SELECT a, b FROM exdk),
 ed AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
 reach(id, lbl) AS (SELECT a, a FROM ed UNION SELECT ed.b, reach.lbl FROM reach JOIN ed ON ed.a = reach.id),
 comp AS (SELECT id, min(lbl) AS cid FROM reach GROUP BY id)
SELECT k.doc_id, COALESCE(comp.cid, k.doc_id) AS cluster_id
FROM keep k LEFT JOIN comp ON comp.id = k.doc_id ORDER BY k.doc_id"""
    },

    // whitespace vs BPE-ish pretoken counts (letter runs | digit runs |
    // single symbols). Identical under Java regex and RE2 on BMP text;
    // driver testdata is ASCII.
    "q44_token_bpeish" ->
      raw"""SELECT doc_id,
 len(string_split(lower(text),' '))::BIGINT AS n_ws,
 len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS n_bpeish
FROM documents ORDER BY doc_id""",

    // deterministic Bernoulli sample: pinned-LCG key mod 1000 < rate
    "q45_sample_bernoulli" ->
      s"""SELECT doc_id FROM documents
WHERE (($M * (doc_id % $P) + $LcgAddA) % $P) % 1000 < 200 ORDER BY doc_id""",

    // deterministic stratified sample: 5 per token-count decade, ranked by
    // the pinned sampling key (id tiebreak)
    "q46_sample_stratified" ->
      s"""WITH st AS (SELECT doc_id, len(string_split(lower(text),' ')) // 10 AS stratum,
   (($M * (doc_id % $P) + $LcgAddA) % $P) AS sk FROM documents),
 rk AS (SELECT doc_id, stratum,
   row_number() OVER (PARTITION BY stratum ORDER BY sk, doc_id)::BIGINT AS sample_rank FROM st)
SELECT doc_id, stratum::BIGINT AS stratum, sample_rank FROM rk WHERE sample_rank <= 5 ORDER BY doc_id""",

    // leakage-free 90/10 split: per-CLUSTER sampling key, so near-dups
    // never straddle train/eval (q08's clustering + the pinned key)
    "q47_split_leakfree" ->
      s"""WITH RECURSIVE $textPipeline,
 reps AS (SELECT lower(text) AS lt, min(doc_id) AS rep FROM documents GROUP BY 1),
 exd AS (SELECT r.rep AS a, d.doc_id AS b FROM reps r JOIN (SELECT doc_id, lower(text) AS lt FROM documents) d USING (lt) WHERE d.doc_id <> r.rep),
 edges AS (SELECT a, b FROM ver UNION SELECT a, b FROM exd),
 ed AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
 reach(id, lbl) AS (SELECT a, a FROM ed UNION SELECT ed.b, reach.lbl FROM reach JOIN ed ON ed.a = reach.id),
 comp AS (SELECT id, min(lbl) AS cid FROM reach GROUP BY id),
 cl AS (SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_id
   FROM documents d LEFT JOIN comp ON comp.id = d.doc_id)
SELECT doc_id, cluster_id,
 (CASE WHEN (($M * (cluster_id % $P) + $LcgAddA) % $P) % 1000 < 900 THEN 'train' ELSE 'eval' END) AS split
FROM cl ORDER BY doc_id""",

    // PII scrub: same RE2-compatible patterns (TextAnalysis.Pii*), same
    // pinned replace order email → ip → phone, each class counted on the
    // intermediate it redacts from (counts reconcile with tags); DuckDB
    // regexp_replace needs the 'g' flag to match Spark's replace-all
    "q48_pii_scrub" -> {
      val em = graft.operators.TextAnalysis.PiiEmail
      val ip = graft.operators.TextAnalysis.PiiIp
      val ph = graft.operators.TextAnalysis.PiiPhone
      s"""WITH st AS (SELECT doc_id, text,
   regexp_replace(text, '$em', '<EMAIL>', 'g') AS after_email FROM documents),
 st2 AS (SELECT doc_id, text, after_email,
   regexp_replace(after_email, '$ip', '<IP>', 'g') AS after_ip FROM st)
SELECT doc_id,
 len(regexp_extract_all(text, '$em'))::BIGINT AS n_emails,
 len(regexp_extract_all(after_email, '$ip'))::BIGINT AS n_ips,
 len(regexp_extract_all(after_ip, '$ph'))::BIGINT AS n_phones,
 regexp_replace(after_ip, '$ph', '<PHONE>', 'g') AS redacted
FROM st2 ORDER BY doc_id"""
    },

    // eval-benchmark contamination: per eval doc (doc_id % 17 = 0), the
    // share of its distinct 8-gram hashes present in the corpus rest —
    // reuses q12's rolling gram-hash formulation
    "q49_contamination" ->
      s"""WITH $toks,
 th AS (SELECT doc_id, [${strHash("tok")} FOR tok IN t] AS hs FROM toks WHERE len(t) >= $L),
 gh AS (SELECT DISTINCT doc_id,
   unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i+1:i+$L]), (h,x) -> (h*$B+x) % $P) FOR i IN range(0, len(hs)-${L - 1})]) AS gram_hash
   FROM th),
 eg AS (SELECT doc_id, gram_hash FROM gh WHERE doc_id % 17 = 0),
 cg AS (SELECT DISTINCT gram_hash FROM gh WHERE doc_id % 17 <> 0),
 j AS (SELECT eg.doc_id, CASE WHEN cg.gram_hash IS NULL THEN 0 ELSE 1 END AS hit
   FROM eg LEFT JOIN cg ON cg.gram_hash = eg.gram_hash)
SELECT doc_id, count(*)::BIGINT AS n_grams, sum(hit)::BIGINT AS n_shared,
 (sum(hit)::BIGINT * 1000) // count(*)::BIGINT AS contam_millis
FROM j GROUP BY doc_id ORDER BY doc_id""",

    // intra-doc repetition: duplicate-8-gram OCCURRENCE share per doc —
    // q12's rolling gram hashes WITHOUT the distinct (positions counted)
    "q50_repetition" ->
      s"""WITH $toks,
 th AS (SELECT doc_id, [${strHash("tok")} FOR tok IN t] AS hs FROM toks WHERE len(t) >= $L),
 gpos AS (SELECT doc_id,
   unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i+1:i+$L]), (h,x) -> (h*$B+x) % $P) FOR i IN range(0, len(hs)-${L - 1})]) AS gram_hash
   FROM th),
 gcnt AS (SELECT doc_id, gram_hash, count(*)::BIGINT AS cnt FROM gpos GROUP BY doc_id, gram_hash)
SELECT doc_id, sum(cnt)::BIGINT AS n_grams,
 sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END)::BIGINT AS n_dup_grams,
 (sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END)::BIGINT * 1000) // sum(cnt)::BIGINT AS rep_millis
FROM gcnt GROUP BY doc_id ORDER BY doc_id""",

    // quality-aware keeper per near-dup cluster: q08's clustering + per-doc
    // lexical diversity; keeper = max n_distinct, ties to lowest doc_id
    "q51_keep_best" ->
      s"""WITH RECURSIVE $textPipeline,
 reps AS (SELECT lower(text) AS lt, min(doc_id) AS rep FROM documents GROUP BY 1),
 exd AS (SELECT r.rep AS a, d.doc_id AS b FROM reps r JOIN (SELECT doc_id, lower(text) AS lt FROM documents) d USING (lt) WHERE d.doc_id <> r.rep),
 edges AS (SELECT a, b FROM ver UNION SELECT a, b FROM exd),
 ed AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
 reach(id, lbl) AS (SELECT a, a FROM ed UNION SELECT ed.b, reach.lbl FROM reach JOIN ed ON ed.a = reach.id),
 comp AS (SELECT id, min(lbl) AS cid FROM reach GROUP BY id),
 cl AS (SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_id
   FROM documents d LEFT JOIN comp ON comp.id = d.doc_id),
 q AS (SELECT doc_id, len(list_distinct(t))::BIGINT AS nd FROM toks),
 sc AS (SELECT cl.doc_id, cl.cluster_id, q.nd FROM cl JOIN q USING (doc_id)),
 kp AS (SELECT cluster_id, doc_id AS keeper FROM (
   SELECT cluster_id, doc_id, row_number() OVER (PARTITION BY cluster_id ORDER BY nd DESC, doc_id) AS rk
   FROM sc) WHERE rk = 1)
SELECT sc.doc_id, sc.cluster_id, kp.keeper FROM sc JOIN kp USING (cluster_id) ORDER BY sc.doc_id""",

    // incremental embedding near-dup: banded multi-table buckets (q37's
    // bucketBandSql) crossed master×staging (vec_id%4), exact cosine ≥ 0.4
    "q52_embedding_cross_near_dup" ->
      s"""WITH tb AS (SELECT vec_id, embedding, t, ${bucketBandSql("embedding", "t")} AS bucket
   FROM embeddings, unnest(range(0, $AnnBandTables)) AS u(t)),
 p AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
   FROM tb x JOIN tb y ON x.t = y.t AND x.bucket = y.bucket
   WHERE x.vec_id % 4 <> 0 AND y.vec_id % 4 = 0),
 s AS (SELECT a, b, ${cosSql("xe", "ye")} AS cos
  FROM (SELECT p.a, p.b, ea.embedding AS xe, eb.embedding AS ye
    FROM p JOIN embeddings ea ON ea.vec_id = p.a JOIN embeddings eb ON eb.vec_id = p.b))
SELECT a AS vec_a, b AS vec_b FROM s WHERE cos >= 0.4 ORDER BY vec_a, vec_b""",

    // sessionization: per-user event sequences split at >30-min gaps;
    // epoch seconds via integer floor division (mirrors Spark's
    // timestamp→long cast exactly; DuckDB's epoch() is a double)
    "q54_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS tsec FROM events),
 l AS (SELECT user_id, event_id, tsec,
   lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec, event_id) AS prev FROM e),
 s AS (SELECT user_id, event_id, tsec,
   CASE WHEN prev IS NULL OR tsec - prev > 1800 THEN 1 ELSE 0 END AS ns FROM l),
 c AS (SELECT user_id, tsec,
   sum(ns) OVER (PARTITION BY user_id ORDER BY tsec, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq FROM s)
SELECT user_id, session_seq, count(*)::BIGINT AS n_events,
 min(tsec)::BIGINT AS start_s, max(tsec)::BIGINT AS end_s
FROM c GROUP BY user_id, session_seq ORDER BY user_id, session_seq""",

    // balanced source mixture: every source downsampled to the smallest
    // source's size, ranked by the pinned LCG sampling key (seed 0)
    "q53_balanced_mix" ->
      s"""WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
 k AS (SELECT min(cnt) AS kk FROM c),
 r AS (SELECT doc_id, source,
   row_number() OVER (PARTITION BY source
     ORDER BY ($M * (doc_id % $P) + $LcgAddA) % $P, doc_id)::BIGINT AS sample_rank
  FROM documents)
SELECT doc_id, source, sample_rank FROM r, k WHERE sample_rank <= k.kk ORDER BY doc_id""",

    // temperature-flattened source mixing (τ=2): keep-rate √(minCnt/n) in
    // millionths — cast/divide/sqrt/multiply/floor are all correctly-
    // rounded IEEE ops, so the rate is bit-identical to the Spark side
    "q59_temperature_mix" ->
      s"""WITH c AS (SELECT source, count(*)::BIGINT AS cnt FROM documents GROUP BY source),
 m AS (SELECT min(cnt) AS mc FROM c),
 r AS (SELECT source, CAST(floor(sqrt(mc::DOUBLE / cnt::DOUBLE) * 1000000.0) AS BIGINT) AS keep_m FROM c, m)
SELECT doc_id, source FROM documents JOIN r USING (source)
WHERE (($M * (doc_id % $P) + $LcgAddA) % $P) % 1000000 < keep_m
ORDER BY doc_id""",

    // duplicate-line fraction (Gopher's second repetition signal); the
    // literal separator is the vocabulary word " line " because the
    // synthetic documents carry no newline bytes (operator default "\n")
    "q55_dup_lines" ->
      """WITH sp AS (SELECT doc_id, [trim(p) FOR p IN string_split(text, ' line ')] AS ps FROM documents),
 ls AS (SELECT doc_id, [x FOR x IN ps IF len(x) > 0] AS l FROM sp),
 st AS (SELECT doc_id, len(l)::BIGINT AS n_lines,
   (len(l) - len(list_distinct(l)))::BIGINT AS n_dup_lines FROM ls WHERE len(l) > 0)
SELECT doc_id, n_lines, n_dup_lines, (n_dup_lines * 1000) // n_lines AS dup_line_millis
FROM st ORDER BY doc_id""",

    // URL normalization: 3 deterministic variants per doc (scheme, www,
    // host case, trailing slash, #fragment) must collapse to one key;
    // recipe mirrors TextAnalysis.normalizeUrl step for step. DuckDB
    // regexp_replace is first-match (all four patterns match at most once)
    "q56_url_normalize" ->
      """WITH v AS (SELECT doc_id, unnest([
   'https://www.Example' || (doc_id % 7)::VARCHAR || '.COM/docs/' || doc_id::VARCHAR,
   'HTTP://example' || (doc_id % 7)::VARCHAR || '.com/docs/' || doc_id::VARCHAR || '/',
   'www.Example' || (doc_id % 7)::VARCHAR || '.COM/docs/' || doc_id::VARCHAR || '#frag',
   'https://Example' || (doc_id % 7)::VARCHAR || '.COM/docs/' || doc_id::VARCHAR || '/?Ref=X']) AS url
  FROM documents),
 n1 AS (SELECT doc_id, url, regexp_replace(trim(url), '^https?://', '', 'i') AS u FROM v),
 n2 AS (SELECT doc_id, url, regexp_replace(u, '#.*$', '') AS u FROM n1),
 n3 AS (SELECT doc_id, url, regexp_replace(u, '^www\.', '', 'i') AS u FROM n2),
 n3b AS (SELECT doc_id, url, regexp_replace(u, '/+\?', '?', 'g') AS u FROM n3),
 n4 AS (SELECT doc_id, url, strpos(u, '/') AS s, strpos(u, '?') AS q, u FROM n3b),
 n5 AS (SELECT doc_id, url,
   CASE WHEN s > 0 AND (q = 0 OR s < q) THEN s WHEN q > 0 THEN q ELSE 0 END AS cut, u FROM n4),
 n6 AS (SELECT doc_id, url,
   CASE WHEN cut > 0 THEN lower(substr(u, 1, cut - 1)) || substr(u, cut)
        ELSE lower(u) END AS u FROM n5)
SELECT doc_id, url, regexp_replace(u, '/+$', '') AS norm_url
FROM n6 ORDER BY doc_id, url""",

    // corpus-wide exact line dedup: each repeated line keeps only its
    // first (doc_id, pos) occurrence; docs reassembled from survivors.
    // The window here is oracle-side only — the Spark plan uses a
    // map-side-combining groupBy(line).min(struct) instead
    "q57_dedup_lines_corpus" ->
      """WITH sp AS (SELECT doc_id, [x FOR x IN [trim(p) FOR p IN string_split(text, ' line ')] IF len(x) > 0] AS l FROM documents),
 ex0 AS (SELECT doc_id, unnest([{'pos': i, 'line': l[i+1]} FOR i IN range(0, len(l))]) AS e FROM sp),
 ex AS (SELECT doc_id, e.pos AS pos, e.line AS line FROM ex0),
 w AS (SELECT doc_id, pos, line,
   row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rk FROM ex),
 agg AS (SELECT doc_id, count(*)::BIGINT AS n_total,
   sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
   string_agg(CASE WHEN rk = 1 THEN line END, ' line ' ORDER BY pos) AS text
  FROM w GROUP BY doc_id)
SELECT doc_id, text, n_kept, (n_total - n_kept)::BIGINT AS n_dropped
FROM agg WHERE n_kept > 0 ORDER BY doc_id""",

    // C4-style line cleaning: keep lines with >= 3 non-empty whitespace
    // words whose lowercase form contains neither boilerplate substring;
    // reassemble. Every doc emits (empty text when all lines drop).
    "q61_clean_lines" ->
      """WITH sp AS (SELECT doc_id, [x FOR x IN [trim(p) FOR p IN string_split(text, ' line ')] IF len(x) > 0] AS l FROM documents),
 k AS (SELECT doc_id, l, [x FOR x IN l IF len([w FOR w IN string_split(x, ' ') IF len(w) > 0]) >= 3
   AND position('lorem ipsum' IN lower(x)) = 0 AND position('dup' IN lower(x)) = 0] AS kp FROM sp)
SELECT doc_id, COALESCE(array_to_string(kp, ' line '), '') AS text, len(kp)::BIGINT AS n_kept,
 (len(l) - len(kp))::BIGINT AS n_dropped FROM k ORDER BY doc_id""",

    // exact substring-span dedup (ExactSubstr as l-gram cover): tokens
    // covered by a non-first occurrence of their 8-gram drop; winner =
    // (doc_id, pos) order over equal gram STRINGS
    "q63_dedup_spans" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS toks FROM documents),
 g0 AS (SELECT doc_id, unnest([{'pos': i, 'gram': array_to_string(toks[i+1:i+$L],' ')} FOR i IN range(0, len(toks)-${L - 1})]) AS e FROM t WHERE len(toks) >= $L),
 g AS (SELECT doc_id, e.pos AS pos, e.gram AS gram FROM g0),
 w AS (SELECT doc_id, pos, row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk FROM g),
 cov AS (SELECT DISTINCT doc_id, pos + d AS rpos FROM w, unnest(range(0,$L)) AS v(d) WHERE rk > 1),
 ex0 AS (SELECT doc_id, unnest([{'pos': i, 'tok': toks[i+1]} FOR i IN range(0, len(toks))]) AS e FROM t),
 ex AS (SELECT doc_id, e.pos AS pos, e.tok AS tok FROM ex0),
 j AS (SELECT ex.doc_id, ex.pos, ex.tok, cov.rpos FROM ex LEFT JOIN cov ON cov.doc_id = ex.doc_id AND cov.rpos = ex.pos),
 agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
   COALESCE(string_agg(CASE WHEN rpos IS NULL THEN tok END, ' ' ORDER BY pos), '') AS text,
   sum(CASE WHEN rpos IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_removed
  FROM j GROUP BY doc_id)
SELECT doc_id, text, n_tokens, n_removed FROM agg ORDER BY doc_id""",

    // Gopher quality-rule gate: exact-integer ratio thresholds; the CASE
    // variants are shared verbatim with Queries.GopherBullets/Ellipses/
    // Symbols; '//' = integer div (the '...' count is always a multiple
    // of 3 on both engines — left-to-right non-overlapping replace)
    "q64_gopher_rules" ->
      """WITH v AS (SELECT doc_id, CASE doc_id % 4
   WHEN 0 THEN text || ' line - one line - two line - three line - four line - five line - six line - seven line - eight line - nine line - ten'
   WHEN 1 THEN text || ' line so it goes... line wait for it... line more soon... line to be continued... line really... line okay...'
   WHEN 2 THEN text || ' ##### ##### #####'
   ELSE text END AS text FROM documents),
 w AS (SELECT doc_id,
   [x FOR x IN string_split(lower(text),' ') IF x <> ''] AS toks,
   [trim(x) FOR x IN string_split(text,' line ') IF trim(x) <> ''] AS ls,
   (length(text)-length(replace(text,'#','')))::BIGINT
     + ((length(text)-length(replace(text,'...',''))) // 3)::BIGINT AS n_sym
  FROM v),
 m AS (SELECT doc_id,
   len(toks)::BIGINT AS n_words,
   COALESCE(list_sum([length(t) FOR t IN toks]), 0)::BIGINT AS sum_wlen,
   len([t FOR t IN toks IF regexp_matches(t,'[a-z]')])::BIGINT AS n_alpha,
   (CASE WHEN list_contains(toks,'the') THEN 1 ELSE 0 END
    + CASE WHEN list_contains(toks,'a') THEN 1 ELSE 0 END
    + CASE WHEN list_contains(toks,'data') THEN 1 ELSE 0 END
    + CASE WHEN list_contains(toks,'key') THEN 1 ELSE 0 END
    + CASE WHEN list_contains(toks,'table') THEN 1 ELSE 0 END
    + CASE WHEN list_contains(toks,'join') THEN 1 ELSE 0 END)::BIGINT AS n_stop,
   n_sym,
   len(ls)::BIGINT AS n_lines,
   len([l FOR l IN ls IF left(l,2) IN ('- ','* ')])::BIGINT AS n_bullet,
   len([l FOR l IN ls IF right(l,3) = '...'])::BIGINT AS n_ell
  FROM w)
SELECT doc_id, n_words, n_lines,
 (n_words BETWEEN 20 AND 1000) AS wordcount_ok,
 (3*n_words <= sum_wlen AND sum_wlen <= 10*n_words) AS mean_len_ok,
 (10*n_sym <= n_words) AS symbol_ok,
 (10*n_bullet <= 9*n_lines) AS bullet_ok,
 (10*n_ell <= 3*n_lines) AS ellipsis_ok,
 (5*n_alpha >= 4*n_words) AS alpha_ok,
 (n_stop >= 4) AS stopword_ok,
 ((n_words BETWEEN 20 AND 1000) AND (3*n_words <= sum_wlen AND sum_wlen <= 10*n_words)
  AND (10*n_sym <= n_words) AND (10*n_bullet <= 9*n_lines)
  AND (10*n_ell <= 3*n_lines) AND (5*n_alpha >= 4*n_words) AND (n_stop >= 4)) AS keep
FROM m ORDER BY doc_id""",

    // vocabulary coverage: top-20 corpus tokens (count desc, token asc),
    // per-doc OOV share in millionths-free exact integer millis
    "q62_vocab_coverage" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS token FROM documents),
 tc AS (SELECT token, count(*)::BIGINT AS cnt FROM tok GROUP BY token),
 v AS (SELECT token FROM tc ORDER BY cnt DESC, token LIMIT 20),
 per AS (SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
   sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
  FROM tok LEFT JOIN v ON tok.token = v.token GROUP BY tok.doc_id)
SELECT doc_id, n_tokens, n_oov, (n_oov * 1000) // n_tokens AS oov_millis
FROM per ORDER BY doc_id""",

    // sequence packing: running token offsets in doc_id order → first/last
    // 2048-token context chunk per doc. The single global window here is
    // oracle-side only — the Spark plan is the bounded two-level prefix sum
    "q58_sequence_pack" ->
      """WITH t AS (SELECT doc_id, len(string_split(lower(text),' '))::BIGINT AS n_tokens FROM documents),
 o AS (SELECT doc_id, n_tokens,
   COALESCE(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_offset FROM t)
SELECT doc_id, n_tokens, tok_offset, tok_offset // 2048 AS chunk_first,
 greatest(tok_offset, tok_offset + n_tokens - 1) // 2048 AS chunk_last
FROM o ORDER BY doc_id"""
  )
}
