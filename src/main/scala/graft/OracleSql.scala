package graft

/** DuckDB-equivalent SQL for the ITERATIVE operators, generated as unrolled
  * chained CTEs (one per superstep) over the same lineitem-derived edge
  * table the Spark queries read.
  *
  * Why this can be hash-exact: the corresponding Spark queries run in
  * fixed-point verification mode (PprConfig.quantize = 1e12) — every
  * per-superstep aggregation rounds each contribution onto the 1e-12 grid
  * and sums exact 64-bit integers, so the result is independent of addend
  * order. Both engines then perform the identical sequence of IEEE-754
  * products/divisions on identical inputs, making every intermediate state
  * and the final scores bit-identical — no float tolerance needed in the
  * driver's value compare.
  *
  * DuckDB parity notes (hard-won; see .claude/skills/verify/SKILL.md):
  *  - bare decimal literals are DECIMAL in DuckDB but DOUBLE in Spark —
  *    every float literal is emitted as CAST(<shortest-repr> AS DOUBLE),
  *    and constants derived in Scala (e.g. 1.0 - damping) are computed in
  *    Scala first so both engines see the exact same double.
  *  - sum(BIGINT) is HUGEINT in DuckDB — cast back to BIGINT before the
  *    grid division.
  *  - round(x::DOUBLE) is half-away-from-zero in both engines.
  */
object OracleSql {

  /** Shortest-round-trip double literal, forced to DOUBLE type. */
  private def dlit(x: Double): String = s"CAST($x AS DOUBLE)"

  /** Order-independent fixed-point sum — mirrors TopK.sumScore(1e12). */
  private def gridSum(expr: String): String =
    s"CAST(sum(CAST(round(($expr) * 1e12) AS BIGINT)) AS BIGINT) / 1e12"

  /** Shared graph CTEs: deduped edge list, vertex closure, out-degrees,
    * adjacency with the push factor d/outdeg (EdgeSource.fromLineitem +
    * the operators' adj projection). */
  private def graphCtes(damping: Double): String =
    s"""e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
       | od AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       | adj AS MATERIALIZED (SELECT e.src, e.dst, ${dlit(damping)} / od.outdeg AS factor FROM e JOIN od USING (src))""".stripMargin

  /** WEIGHTED variant of [[graphCtes]]: edge weight = summed integer
    * l_quantity per (partkey, suppkey) pair, factor d*w/sum_out w (the
    * engine's shared weight contract). Defines the same CTE names
    * (`v`, `od`, `adj`) as the unweighted prefix so the iterative chains
    * compose with either. */
  private def weightedGraphCtes(damping: Double): String =
    s"""ew AS MATERIALIZED (SELECT l_partkey AS src, l_suppkey AS dst,
       |   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w FROM lineitem GROUP BY 1, 2),
       | v AS MATERIALIZED (SELECT src AS id FROM ew UNION SELECT dst AS id FROM ew),
       | od AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM ew GROUP BY 1),
       | ws AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM ew GROUP BY 1),
       | adj AS MATERIALIZED (SELECT ew.src, ew.dst, ${dlit(damping)} * ew.w / ws.wsum AS factor
       |   FROM ew JOIN ws USING (src))""".stripMargin

  /** Exact PPR power iteration (include/internal/pprSingleSource.h:29-75),
    * `iterations` unrolled supersteps, never converging early (the Spark
    * query runs tolerance = -1), dangling mass deliberately leaking. */
  /** Power-iteration CTE chain `{prefix}0 .. {prefix}N` seeded 1.0 from
    * `seedsCte` (a CTE with an `id` column). Shared by exactPpr and the
    * quality harness' per-sample oracle. */
  private def pprChain(iterations: Int, damping: Double, seedsCte: String, prefix: String): String = {
    val tele = dlit(1.0 - damping)
    val init =
      s"""${prefix}0 AS MATERIALIZED (SELECT id AS seed, id AS node, ${dlit(1.0)} AS score FROM $seedsCte)"""
    val steps = (1 to iterations).map { i =>
      s"""$prefix$i AS MATERIALIZED (SELECT seed, node, ${gridSum("score")} AS score FROM (
         |   SELECT s.seed AS seed, a.dst AS node, s.score * a.factor AS score
         |   FROM $prefix${i - 1} s JOIN adj a ON s.node = a.src
         |   UNION ALL SELECT id AS seed, id AS node, $tele AS score FROM $seedsCte)
         | GROUP BY 1, 2)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  def exactPpr(iterations: Int, damping: Double, nSeeds: Int): String =
    s"""WITH ${graphCtes(damping)},
       | seeds AS MATERIALIZED (SELECT id FROM v ORDER BY id LIMIT $nSeeds),
       |${pprChain(iterations, damping, "seeds", "s")}
       |SELECT seed, node, score FROM s$iterations""".stripMargin

  /** TrustRank (operators/ExactPpr.runVector): the power-iteration chain
    * with a teleport VECTOR uniform over the trusted set {id % mod = 0},
    * one ranking vector, same preserved dangling leak and grid sums. */
  def trustRank(iterations: Int, damping: Double, mod: Int): String = {
    val tele = dlit(1.0 - damping)
    val steps = (1 to iterations).map { i =>
      s"""p$i AS MATERIALIZED (SELECT node, ${gridSum("score")} AS score FROM (
         |   SELECT a.dst AS node, s.score * a.factor AS score
         |   FROM p${i - 1} s JOIN adj a ON s.node = a.src
         |   UNION ALL SELECT node, $tele * mass AS score FROM t0)
         | GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${graphCtes(damping)},
       | tr AS MATERIALIZED (SELECT id FROM v WHERE id % $mod = 0),
       | ntr AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nt FROM tr),
       | t0 AS MATERIALIZED (SELECT id AS node, ${dlit(1.0)} / nt AS mass FROM tr CROSS JOIN ntr),
       | p0 AS MATERIALIZED (SELECT node, mass AS score FROM t0),
       |$steps
       |SELECT node, score FROM p$iterations""".stripMargin
  }

  /** WEIGHTED exact PPR: same power-iteration chain over a weighted
    * adjacency (factor d*w/sum_out w, weight = summed integer l_quantity
    * per pair — the contract of OracleSql.pageRankWeighted). */
  def exactPprWeighted(iterations: Int, damping: Double, nSeeds: Int): String =
    s"""WITH ew AS MATERIALIZED (SELECT l_partkey AS src, l_suppkey AS dst,
       |   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w FROM lineitem GROUP BY 1, 2),
       | v AS MATERIALIZED (SELECT src AS id FROM ew UNION SELECT dst AS id FROM ew),
       | ws AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM ew GROUP BY 1),
       | adj AS MATERIALIZED (SELECT ew.src, ew.dst, ${dlit(damping)} * ew.w / ws.wsum AS factor
       |   FROM ew JOIN ws USING (src)),
       | seeds AS MATERIALIZED (SELECT id FROM v ORDER BY id LIMIT $nSeeds),
       |${pprChain(iterations, damping, "seeds", "s")}
       |SELECT seed, node, score FROM s$iterations""".stripMargin

  /** Synchronous h-index coreness (operators/KCore): estimates start at the
    * undirected degree; each round replaces a vertex's value with the
    * h-index of its neighbors' values — max(least(rank, value)) over the
    * descending sort, which is tie-order-free because the sorted multiset
    * is. All integers: no quantization grid needed. */
  def kcore(rounds: Int): String = {
    val base =
      s"""e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
         | v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
         | und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |   SELECT src, dst FROM e WHERE src <> dst
         |   UNION ALL SELECT dst, src FROM e WHERE src <> dst)),
         | deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM und GROUP BY 1),
         | c0 AS MATERIALIZED (SELECT v.id AS node,
         |   CAST(coalesce(deg.deg, 0) AS DOUBLE) AS score FROM v LEFT JOIN deg ON v.id = deg.src)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""g$i AS (SELECT und.src AS gv, s.score AS ge,
         |   row_number() OVER (PARTITION BY und.src ORDER BY s.score DESC) AS r
         |   FROM und JOIN c${i - 1} s ON und.dst = s.node),
         | h$i AS (SELECT gv, max(least(CAST(r AS DOUBLE), ge)) AS h FROM g$i GROUP BY 1),
         | c$i AS MATERIALIZED (SELECT s.node, coalesce(h.h, ${dlit(0.0)}) AS score
         |   FROM c${i - 1} s LEFT JOIN h$i h ON s.node = h.gv)""".stripMargin
    }.mkString(",\n")
    s"""WITH $base,
       |$steps
       |SELECT node AS id, CAST(score AS INT) AS coreness FROM c$rounds""".stripMargin
  }

  /** HyperBall (operators/HyperBall): per-vertex HLL registers of the
    * forward ball, `rounds` unrolled max-merge supersteps, then the
    * per-vertex estimate (same math as the global HLL estimate). Register
    * state is all integers — hash-exact with no grid. */
  def hyperball(rounds: Int, p: Int, salt: Long): String = {
    val m = 1 << p
    val alpha = graft.functions.Sketch.alphaFor(m)
    val mix = graft.kernels.Mix.sql("id", "0", "1", salt)
    val steps = (1 to rounds).map { i =>
      s"""r$i AS MATERIALIZED (SELECT id, bucket, max(rho) AS rho FROM (
         |   SELECT id, bucket, rho FROM r${i - 1}
         |   UNION ALL
         |   SELECT e.src AS id, s.bucket, s.rho FROM e JOIN r${i - 1} s ON e.dst = s.id)
         | GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
       | hx AS MATERIALIZED (SELECT id, ($mix) AS h FROM v),
       | r0 AS MATERIALIZED (SELECT id, CAST(h % $m AS INT) AS bucket,
       |   CAST(${31 - p + 1} - length(ltrim(bin(h >> $p), '0')) AS INT) AS rho FROM hx),
       |$steps,
       | agg AS (SELECT id, count(*) AS filled,
       |   CAST(sum(CAST(power(2, 32 - rho) AS BIGINT)) AS BIGINT) AS sumnon
       |   FROM r$rounds GROUP BY 1),
       | t AS (SELECT id, filled, $m - filled AS zeros,
       |   sumnon + ($m - filled) * 4294967296 AS sumint FROM agg),
       | u AS (SELECT id, filled, zeros,
       |   ${dlit(alpha)} * ${dlit(m.toDouble)} * ${dlit(m.toDouble)} * 4294967296.0 / sumint AS raw
       |   FROM t)
       |SELECT id, round((CASE WHEN raw <= ${dlit(2.5 * m)} AND zeros > 0
       |    THEN ${dlit(m.toDouble)} * ln(${dlit(m.toDouble)} / zeros) ELSE raw END) * 1e6) / 1e6 AS est,
       |  filled
       |FROM u""".stripMargin
  }

  /** HyperBall geometric centralities (operators/HyperBall.centralities):
    * the hyperball register recursion replayed per round, a 1e-6-grid HLL
    * estimate CTE per round (same integer-sum + one-division + linear-
    * counting-branch math as [[hyperball]]), then the fixed-order harmonic
    * and sum-of-distances expression trees over est_0..est_rounds. */
  /** Unigram log-probability scoring (functions/TextAnalysis
    * .unigramLogprob): exact-integer corpus frequencies, one ln per token
    * of an exact-operand division, order-free 1e-12 grid mean per doc. */
  def unigramLogprob(): String =
    s"""WITH tk AS MATERIALIZED (SELECT doc_id,
       |   unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok FROM documents),
       | f AS MATERIALIZED (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
       | n AS (SELECT CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS nt FROM f),
       | lp AS (SELECT doc_id, ln(CAST(c AS DOUBLE) / nt) AS lp
       |   FROM tk JOIN f USING (tok) CROSS JOIN n)
       |SELECT doc_id, count(*) AS n_tokens,
       |  (CAST(sum(CAST(round(lp * 1e12) AS BIGINT)) AS BIGINT) / 1e12) / count(*) AS avg_logprob
       |FROM lp GROUP BY 1""".stripMargin

  /** Deterministic hash-threshold sampling (functions/Sampling): the same
    * mix31(id) < fraction·P inequality, P.toDouble on both sides. */
  def sampleByHash(fraction: Double, salt: Long): String =
    s"""SELECT doc_id, text, lang, source, n_chars FROM documents
       |WHERE CAST((${graft.kernels.Mix.sql("doc_id", "0", "2", salt)}) AS DOUBLE)
       |      < ${dlit(fraction)} * ${dlit(graft.kernels.Mix.P.toDouble)}""".stripMargin

  /** Stratified variant: per-source fractions, default for the rest. */
  def sampleStratified(fractions: Seq[(String, Double)], default: Double,
      salt: Long): String = {
    val cases = fractions.map { case (s, f) => s"WHEN '$s' THEN ${dlit(f)}" }.mkString(" ")
    s"""SELECT doc_id, text, lang, source, n_chars FROM documents
       |WHERE CAST((${graft.kernels.Mix.sql("doc_id", "0", "2", salt)}) AS DOUBLE)
       |      < (CASE source $cases ELSE ${dlit(default)} END) * ${dlit(graft.kernels.Mix.P.toDouble)}""".stripMargin
  }

  /** TF-IDF top terms (functions/TextAnalysis.tfidfTopTerms): exact-integer
    * tf/df/N, ln of one exact-operand division, product on the 1e-12 grid,
    * deterministic (score desc, tok asc) ranking. */
  def tfidfTopTerms(topN: Int): String =
    s"""WITH tk AS MATERIALIZED (SELECT doc_id,
       |   unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok FROM documents),
       | dt AS MATERIALIZED (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
       | dfq AS MATERIALIZED (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
       | n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents)
       |SELECT doc_id, tok, score, rank FROM (
       | SELECT dt.doc_id, dt.tok,
       |   round(CAST(tf AS DOUBLE) * ln(nd / CAST(df AS DOUBLE)) * 1e12) / 1e12 AS score,
       |   row_number() OVER (PARTITION BY dt.doc_id
       |     ORDER BY round(CAST(tf AS DOUBLE) * ln(nd / CAST(df AS DOUBLE)) * 1e12) / 1e12 DESC,
       |              dt.tok ASC) AS rank
       | FROM dt JOIN dfq USING (tok) CROSS JOIN n)
       |WHERE rank <= $topN""".stripMargin

  /** PMI bigram collocations (functions/TextAnalysis.pmiBigrams): exact
    * integer counts, ONE fixed-order IEEE expression, 1e-12 grid, total
    * (pmi desc, a, b) order before the LIMIT. */
  def pmiBigrams(minCount: Long, topN: Int): String =
    s"""WITH ts AS MATERIALIZED (SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents),
       | bg0 AS MATERIALIZED (SELECT unnest(list_transform(range(1, len(ts)),
       |     i -> struct_pack(a := ts[i], b := ts[i+1]))) AS s
       |   FROM ts WHERE len(ts) >= 2),
       | bg AS MATERIALIZED (SELECT s.a AS a, s.b AS b FROM bg0),
       | cab AS MATERIALIZED (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2
       |   HAVING count(*) >= $minCount),
       | uni AS MATERIALIZED (SELECT unnest(ts) AS tok FROM ts),
       | uc AS MATERIALIZED (SELECT tok, count(*) AS c FROM uni GROUP BY 1),
       | tot AS (SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM uc) AS nu,
       |                (SELECT CAST(count(*) AS DOUBLE) FROM bg) AS nb)
       |SELECT a, b, c_ab,
       |  round(ln((CAST(c_ab AS DOUBLE) * nu * nu) / (nb * CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))) * 1e12) / 1e12 AS pmi
       |FROM cab JOIN uc ca ON cab.a = ca.tok JOIN uc cb ON cab.b = cb.tok CROSS JOIN tot
       |ORDER BY pmi DESC, a ASC, b ASC LIMIT $topN""".stripMargin

  /** Gopher repetition signals (functions/TextAnalysis.repetitionStats):
    * exact-integer counts, single divisions — no grid needed. */
  def repetitionStats(): String =
    s"""WITH base AS MATERIALIZED (SELECT doc_id,
       |   regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents),
       | b2 AS MATERIALIZED (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n,
       |   CAST(len(list_distinct(ts)) AS BIGINT) AS nd FROM base),
       | bg0 AS MATERIALIZED (SELECT doc_id, unnest(list_transform(range(1, len(ts)),
       |     i -> struct_pack(a := ts[i], b := ts[i+1]))) AS s
       |   FROM b2 WHERE n >= 2),
       | bc AS MATERIALIZED (SELECT doc_id, s.a, s.b, count(*) AS c FROM bg0 GROUP BY 1, 2, 3),
       | bt AS MATERIALIZED (SELECT doc_id, max(c) AS maxc FROM bc GROUP BY 1)
       |SELECT b2.doc_id, n AS n_tokens,
       |  CASE WHEN n > 0 THEN CAST(n - nd AS DOUBLE) / n ELSE 0.0 END AS dup_token_ratio,
       |  CASE WHEN n >= 2 THEN CAST(coalesce(maxc, 0) AS DOUBLE) / (n - 1) ELSE 0.0 END AS top_bigram_frac
       |FROM b2 LEFT JOIN bt ON b2.doc_id = bt.doc_id""".stripMargin

  /** Degree assortativity (operators/GraphStats.assortativity): exact
    * integer sufficient statistics, fixed-order final expression, 1e-6
    * grid. */
  def assortativity(): String =
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst
       |   FROM lineitem WHERE l_partkey <> l_suppkey),
       | od AS (SELECT src AS u, count(*) AS x FROM e GROUP BY 1),
       | ind AS (SELECT dst AS v, count(*) AS y FROM e GROUP BY 1),
       | xy AS (SELECT x, y FROM e JOIN od ON e.src = od.u JOIN ind ON e.dst = ind.v),
       | s AS (SELECT count(*) AS m,
       |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |   CAST(sum(x*y) AS BIGINT) AS sxy,
       |   CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy FROM xy)
       |SELECT m AS n_edges,
       |  round((CASE WHEN m > 1
       |      AND CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
       |      AND CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
       |    THEN (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       |      / sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
       |           * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
       |    ELSE ${dlit(0.0)} END) * 1e6) / 1e6 AS assortativity
       |FROM s""".stripMargin

  /** Log2-binned degree histogram (operators/GraphStats.degreeHistogram):
    * integer bit-length buckets (the Sketch bin/ltrim idiom — no floating
    * log2 at bucket boundaries). */
  def degreeHistogram(): String =
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
       | od AS (SELECT v.id, coalesce(o.c, 0) AS deg FROM v LEFT JOIN
       |   (SELECT src AS id, count(*) AS c FROM e GROUP BY 1) o USING (id)),
       | ind AS (SELECT v.id, coalesce(i.c, 0) AS deg FROM v LEFT JOIN
       |   (SELECT dst AS id, count(*) AS c FROM e GROUP BY 1) i USING (id)),
       | u AS (SELECT 'out' AS kind, deg FROM od UNION ALL SELECT 'in', deg FROM ind),
       | b AS (SELECT kind, CASE WHEN deg <= 0 THEN -1
       |   ELSE CAST(length(ltrim(bin(deg), '0')) - 1 AS INT) END AS bucket FROM u)
       |SELECT kind, bucket, count(*) AS n_vertices,
       |  CASE WHEN bucket < 0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(1 AS BIGINT) << bucket END AS min_deg
       |FROM b GROUP BY 1, 2""".stripMargin

  /** Shared hyperball-with-per-round-estimates CTEs: the register
    * recursion r0..r_rounds plus a 1e-6-grid estimate CTE est0..est_rounds
    * per round (same integer-sum + one-division + linear-counting-branch
    * math as [[hyperball]]). */
  private def hyperballEstCtes(rounds: Int, p: Int, salt: Long): String = {
    val m = 1 << p
    val alpha = graft.functions.Sketch.alphaFor(m)
    val mix = graft.kernels.Mix.sql("id", "0", "1", salt)
    val steps = (1 to rounds).map { i =>
      s"""r$i AS MATERIALIZED (SELECT id, bucket, max(rho) AS rho FROM (
         |   SELECT id, bucket, rho FROM r${i - 1}
         |   UNION ALL
         |   SELECT e.src AS id, s.bucket, s.rho FROM e JOIN r${i - 1} s ON e.dst = s.id)
         | GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val estCtes = (0 to rounds).map { i =>
      s"""a$i AS (SELECT id, count(*) AS filled,
         |   CAST(sum(CAST(power(2, 32 - rho) AS BIGINT)) AS BIGINT) AS sumnon
         |   FROM r$i GROUP BY 1),
         | t$i AS (SELECT id, filled, $m - filled AS zeros,
         |   sumnon + ($m - filled) * 4294967296 AS sumint FROM a$i),
         | u$i AS (SELECT id, zeros,
         |   ${dlit(alpha)} * ${dlit(m.toDouble)} * ${dlit(m.toDouble)} * 4294967296.0 / sumint AS raw
         |   FROM t$i),
         | est$i AS MATERIALIZED (SELECT id,
         |   round((CASE WHEN raw <= ${dlit(2.5 * m)} AND zeros > 0
         |     THEN ${dlit(m.toDouble)} * ln(${dlit(m.toDouble)} / zeros) ELSE raw END) * 1e6) / 1e6 AS est
         |   FROM u$i)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
       | hx AS MATERIALIZED (SELECT id, ($mix) AS h FROM v),
       | r0 AS MATERIALIZED (SELECT id, CAST(h % $m AS INT) AS bucket,
       |   CAST(${31 - p + 1} - length(ltrim(bin(h >> $p), '0')) AS INT) AS rho FROM hx),
       |$steps,
       |$estCtes""".stripMargin
  }

  /** HyperBall geometric centralities (operators/HyperBall.centralities):
    * fixed-order harmonic and sum-of-distances expression trees over the
    * per-round estimates. */
  def harmonicCentrality(rounds: Int, p: Int, salt: Long): String = {
    val joins = (1 to rounds).map(i => s"JOIN est$i e$i USING (id)").mkString(" ")
    val harm = (1 to rounds)
      .map(i => s"(e$i.est - e${i - 1}.est) / CAST($i AS DOUBLE)").mkString(" + ")
    val sd = (1 to rounds)
      .map(i => s"(e$i.est - e${i - 1}.est) * CAST($i AS DOUBLE)").mkString(" + ")
    s"""WITH ${hyperballEstCtes(rounds, p, salt)}
       |SELECT e0.id AS id, round(($harm) * 1e6) / 1e6 AS harmonic,
       |  round(($sd) * 1e6) / 1e6 AS sum_dist
       |FROM est0 e0 $joins""".stripMargin
  }

  /** Global neighborhood function + effective-diameter table
    * (operators/HyperBall.neighborhoodFunction): pairs(t) = grid sum of the
    * per-vertex estimates, frac = pairs(t)/pairs(rounds) on the grid. */
  def neighborhoodFunction(rounds: Int, p: Int, salt: Long): String = {
    val perRound = (0 to rounds).map { t =>
      s"""SELECT $t AS t,
         |  CAST(sum(CAST(round(est * 1e6) AS BIGINT)) AS BIGINT) / 1e6 AS pairs
         |FROM est$t""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${hyperballEstCtes(rounds, p, salt)},
       | nf AS MATERIALIZED (
       |  $perRound),
       | mx AS (SELECT pairs AS pmax FROM nf WHERE t = $rounds)
       |SELECT t, pairs, round(pairs / pmax * 1e6) / 1e6 AS frac
       |FROM nf CROSS JOIN mx""".stripMargin
  }

  /** Shared HLL CTEs (functions/Sketch): edge-endpoint multiset -> mixer
    * hash -> (bucket, rho) -> per-bucket max. Integer-only up to `reg`. */
  private def hllCtes(p: Int, salt: Long): String = {
    val m = 1 << p
    val mix = graft.kernels.Mix.sql("v", "0", "1", salt)
    s"""e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | vals AS MATERIALIZED (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e),
       | hx AS MATERIALIZED (SELECT ($mix) AS h FROM vals),
       | rr AS (SELECT CAST(h % $m AS INT) AS bucket,
       |   CAST(${31 - p + 1} - length(ltrim(bin(h >> $p), '0')) AS INT) AS rho FROM hx),
       | reg AS MATERIALIZED (SELECT bucket, max(rho) AS rho FROM rr GROUP BY 1)""".stripMargin
  }

  /** HLL register table over the edge-endpoint multiset. */
  def hllRegisters(p: Int, salt: Long): String =
    s"""WITH ${hllCtes(p, salt)}
       |SELECT bucket, rho FROM reg""".stripMargin

  /** HLL estimate: exact-integer harmonic sum (2^(32-rho) per register,
    * 2^32 per empty bucket), one floating division, published small-range
    * linear-counting branch, 1e-6 output grid. Mirrors Sketch.hllEstimate's
    * operation order token for token. */
  /** Per-hour distinct users: exact count(DISTINCT) next to the keyed HLL
    * estimate (Sketch.approxDistinctBy) — the sketch × windowing
    * composition, replayed per group with the same integer register math
    * as [[hllEstimate]]. */
  def windowDistinct(p: Int, salt: Long): String = {
    val m = 1 << p
    val alpha = graft.functions.Sketch.alphaFor(m)
    val mix = graft.kernels.Mix.sql("v", "0", "1", salt)
    s"""WITH vals AS MATERIALIZED (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS k,
       |   user_id AS v FROM events),
       | hx AS MATERIALIZED (SELECT k, ($mix) AS h FROM vals),
       | rr AS (SELECT k, CAST(h % $m AS INT) AS bucket,
       |   CAST(${31 - p + 1} - length(ltrim(bin(h >> $p), '0')) AS INT) AS rho FROM hx),
       | reg AS MATERIALIZED (SELECT k, bucket, max(rho) AS rho FROM rr GROUP BY 1, 2),
       | s AS (SELECT k, count(*) AS filled,
       |   CAST(sum(CAST(power(2, 32 - rho) AS BIGINT)) AS BIGINT) AS sumnon FROM reg GROUP BY 1),
       | t AS (SELECT k, filled, $m - filled AS zeros,
       |   sumnon + ($m - filled) * 4294967296 AS sumint FROM s),
       | u AS (SELECT k, filled, zeros,
       |   ${dlit(alpha)} * ${dlit(m.toDouble)} * ${dlit(m.toDouble)} * 4294967296.0 / sumint AS raw
       |   FROM t),
       | est AS (SELECT k, round((CASE WHEN raw <= ${dlit(2.5 * m)} AND zeros > 0
       |    THEN ${dlit(m.toDouble)} * ln(${dlit(m.toDouble)} / zeros) ELSE raw END) * 1e6) / 1e6 AS est,
       |   filled FROM u),
       | ex AS (SELECT k, count(DISTINCT v) AS n_exact FROM vals GROUP BY 1)
       |SELECT ex.k AS window_epoch, ex.n_exact, est.est, est.filled
       |FROM ex JOIN est ON ex.k = est.k""".stripMargin
  }

  def hllEstimate(p: Int, salt: Long): String = {
    val m = 1 << p
    val alpha = graft.functions.Sketch.alphaFor(m)
    s"""WITH ${hllCtes(p, salt)},
       | s AS (SELECT count(*) AS filled,
       |   CAST(sum(CAST(power(2, 32 - rho) AS BIGINT)) AS BIGINT) AS sumnon FROM reg),
       | t AS (SELECT filled, $m - filled AS zeros,
       |   sumnon + ($m - filled) * 4294967296 AS sumint FROM s),
       | u AS (SELECT filled, zeros,
       |   ${dlit(alpha)} * ${dlit(m.toDouble)} * ${dlit(m.toDouble)} * 4294967296.0 / sumint AS raw
       |   FROM t)
       |SELECT round((CASE WHEN raw <= ${dlit(2.5 * m)} AND zeros > 0
       |    THEN ${dlit(m.toDouble)} * ln(${dlit(m.toDouble)} / zeros) ELSE raw END) * 1e6) / 1e6 AS est,
       |  filled
       |FROM u""".stripMargin
  }

  /** Synchronous forward-push PPR (operators/PushPpr): `iterations` unrolled
    * push supersteps from `nSeeds` seeds. Each superstep: entries whose
    * residual crosses rmax·outdeg fire (danglings always fire and leak the
    * damping share), firing converts (1−d)·residual into score and scatters
    * residual·factor along adj; grid-sums make both columns order-exact. */
  def pushPpr(iterations: Int, rmax: Double, damping: Double, nSeeds: Int): String =
    pushPprOver(graphCtes(damping), iterations, rmax, damping, nSeeds)

  /** Push PPR over the WEIGHTED adjacency: factor d*w/sum_out w, fire
    * threshold unchanged (count-based outdeg — the work bound is per
    * out-edge; see operators/PushPpr). */
  def pushPprWeighted(iterations: Int, rmax: Double, damping: Double, nSeeds: Int): String =
    pushPprOver(weightedGraphCtes(damping), iterations, rmax, damping, nSeeds)

  private def pushPprOver(ctes: String, iterations: Int, rmax: Double,
      damping: Double, nSeeds: Int): String = {
    val tele = dlit(1.0 - damping)
    val init =
      s"""p0 AS MATERIALIZED (SELECT id AS seed, id AS node,
         |   ${dlit(0.0)} AS score, ${dlit(1.0)} AS residual FROM seeds)""".stripMargin
    val steps = (1 to iterations).map { i =>
      s"""f$i AS MATERIALIZED (SELECT s.seed, s.node, s.score, s.residual,
         |   (s.residual > 0 AND s.residual >= ${dlit(rmax)} * coalesce(od.outdeg, 0)) AS fires
         |   FROM p${i - 1} s LEFT JOIN od ON s.node = od.src),
         | p$i AS MATERIALIZED (SELECT seed, node, score, residual FROM (
         |   SELECT seed, node, ${gridSum("score")} AS score, ${gridSum("residual")} AS residual FROM (
         |     SELECT seed, node,
         |       CASE WHEN fires THEN score + $tele * residual ELSE score END AS score,
         |       CASE WHEN fires THEN ${dlit(0.0)} ELSE residual END AS residual
         |     FROM f$i
         |     UNION ALL
         |     SELECT f.seed, a.dst AS node, ${dlit(0.0)} AS score, f.residual * a.factor AS residual
         |     FROM f$i f JOIN adj a ON f.node = a.src WHERE f.fires)
         |   GROUP BY 1, 2) WHERE score != 0 OR residual != 0)""".stripMargin
    }.mkString(",\n")
    s"""WITH $ctes,
       | seeds AS MATERIALIZED (SELECT id FROM v ORDER BY id LIMIT $nSeeds),
       |$init,
       |$steps
       |SELECT seed, node, score, residual FROM p$iterations""".stripMargin
  }

  /** GRank (include/grank.h:43-149): state init = self-teleport + one-hop
    * scatter pruned to L; each superstep = gather-from-successors + teleport,
    * grid-sum, top-L prune (ties score DESC, node ASC); final top-K. */
  /** GRank CTE chain `i0, s0, g1, s1 .. s{iterations}` (state pruned to L
    * every superstep). Shared by grank and the quality harness. */
  private def grankCtes(l: Int, iterations: Int, damping: Double): String = {
    val tele = dlit(1.0 - damping)
    def prune(from: String, out: String, bound: Int): String =
      s"""$out AS MATERIALIZED (SELECT seed, node, score FROM $from
         | QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $bound)""".stripMargin
    val init =
      s"""i0 AS MATERIALIZED (SELECT seed, node, ${gridSum("score")} AS score FROM (
         |   SELECT id AS seed, id AS node, $tele AS score FROM v
         |   UNION ALL SELECT src AS seed, dst AS node, factor AS score FROM adj)
         | GROUP BY 1, 2),
         |${prune("i0", "s0", l)}""".stripMargin
    val steps = (1 to iterations).map { i =>
      s"""g$i AS MATERIALIZED (SELECT seed, node, ${gridSum("score")} AS score FROM (
         |   SELECT a.src AS seed, s.node AS node, s.score * a.factor AS score
         |   FROM s${i - 1} s JOIN adj a ON s.seed = a.dst
         |   UNION ALL SELECT id AS seed, id AS node, $tele AS score FROM v)
         | GROUP BY 1, 2),
         |${prune(s"g$i", s"s$i", l)}""".stripMargin
    }.mkString(",\n")
    s"$init,\n$steps"
  }

  def grank(k: Int, l: Int, iterations: Int, damping: Double): String =
    s"""WITH ${graphCtes(damping)},
       |${grankCtes(l, iterations, damping)}
       |SELECT seed, node, score FROM s$iterations
       |QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $k""".stripMargin

  /** GRank over the WEIGHTED adjacency (operators/GRank with a `weight`
    * edge column): the same unrolled gather/teleport/prune chain — the
    * one-hop init scatter and every gather use factor d*w/sum_out w. */
  def grankWeighted(k: Int, l: Int, iterations: Int, damping: Double): String =
    s"""WITH ${weightedGraphCtes(damping)},
       |${grankCtes(l, iterations, damping)}
       |SELECT seed, node, score FROM s$iterations
       |QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $k""".stripMargin

  /** benchmarkAlgorithm quality harness (operators/Quality.evaluate): GRank
    * approximation vs a fixed-iteration exact-PPR oracle over `testNodes`
    * mixer-sampled strict (outdeg>0) seeds; per-seed Jaccard of the
    * size-aligned top sets and Kendall tau-b (pair counting, reference tie
    * semantics incl. the degenerate 1.0/0.0 rule); avg/min aggregation.
    * Values rounded to 9 decimals on both sides (avg sums a handful of
    * doubles in engine-dependent order — everything upstream is exact). */
  def qualityHarness(k: Int, l: Int, grankIterations: Int, oracleIterations: Int,
      testNodes: Int, damping: Double, sampleSeed: Long): String = {
    val salt = sampleSeed * 7919L + 424243L
    val mixSeed = graft.kernels.Mix.sql("seed", "0", "0", salt)
    s"""WITH ${graphCtes(damping)},
       |${grankCtes(l, grankIterations, damping)},
       | apx AS MATERIALIZED (SELECT seed, node, score FROM s$grankIterations
       |   QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $k),
       | cand AS MATERIALIZED (SELECT DISTINCT seed FROM apx JOIN od ON apx.seed = od.src),
       | smp AS MATERIALIZED (SELECT seed FROM cand ORDER BY $mixSeed, seed LIMIT $testNodes),
       | oseeds AS MATERIALIZED (SELECT seed AS id FROM smp),
       |${pprChain(oracleIterations, damping, "oseeds", "o")},
       | apxs AS MATERIALIZED (SELECT a.* FROM apx a JOIN smp USING (seed)),
       | sizes AS MATERIALIZED (SELECT seed, count(*) AS bsize FROM apxs GROUP BY 1),
       | otop AS MATERIALIZED (
       |   SELECT o.seed, o.node, o.score FROM o$oracleIterations o JOIN sizes z USING (seed)
       |   QUALIFY row_number() OVER (PARTITION BY o.seed ORDER BY o.score DESC, o.node ASC) <= z.bsize),
       | ca AS (SELECT seed, count(*) AS na FROM apxs GROUP BY 1),
       | cb AS (SELECT seed, count(*) AS nb FROM otop GROUP BY 1),
       | ci AS (SELECT a.seed, count(*) AS ni FROM apxs a JOIN otop b ON a.seed = b.seed AND a.node = b.node GROUP BY 1),
       | jac AS MATERIALIZED (SELECT s.seed,
       |   CASE WHEN coalesce(na, 0) + coalesce(nb, 0) = 0 THEN ${dlit(1.0)}
       |        ELSE CAST(coalesce(ni, 0) AS DOUBLE) /
       |             CAST(coalesce(na, 0) + coalesce(nb, 0) - coalesce(ni, 0) AS DOUBLE) END AS jaccard
       |   FROM smp s LEFT JOIN ca USING (seed) LEFT JOIN cb USING (seed) LEFT JOIN ci USING (seed)),
       | pairs AS MATERIALIZED (
       |   SELECT a.seed, a.node, a.score AS x, coalesce(o.score, ${dlit(0.0)}) AS y
       |   FROM apxs a LEFT JOIN o$oracleIterations o ON a.seed = o.seed AND a.node = o.node),
       | kp AS MATERIALIZED (SELECT p1.seed,
       |   sum(CASE WHEN p1.x <> p2.x AND p1.y <> p2.y AND ((p1.x < p2.x) = (p1.y < p2.y)) THEN 1 ELSE 0 END) AS c,
       |   sum(CASE WHEN p1.x <> p2.x AND p1.y <> p2.y AND ((p1.x < p2.x) <> (p1.y < p2.y)) THEN 1 ELSE 0 END) AS d,
       |   sum(CASE WHEN p1.x = p2.x AND p1.y <> p2.y THEN 1 ELSE 0 END) AS tx,
       |   sum(CASE WHEN p1.y = p2.y AND p1.x <> p2.x THEN 1 ELSE 0 END) AS ty
       |   FROM pairs p1 JOIN pairs p2 ON p1.seed = p2.seed AND p1.node < p2.node GROUP BY 1),
       | ken AS MATERIALIZED (SELECT s.seed,
       |   CASE WHEN coalesce(c,0) + coalesce(d,0) + coalesce(ty,0) = 0 OR coalesce(c,0) + coalesce(d,0) + coalesce(tx,0) = 0
       |        THEN CASE WHEN (coalesce(c,0) + coalesce(d,0) + coalesce(ty,0) = 0) = (coalesce(c,0) + coalesce(d,0) + coalesce(tx,0) = 0)
       |                  THEN ${dlit(1.0)} ELSE ${dlit(0.0)} END
       |        ELSE CAST(c - d AS DOUBLE) /
       |             sqrt(CAST(c + d + ty AS DOUBLE) * CAST(c + d + tx AS DOUBLE)) END AS kendall
       |   FROM smp s LEFT JOIN kp ON s.seed = kp.seed),
       | ag AS (SELECT avg(j.jaccard) AS ja, min(j.jaccard) AS jm, avg(k.kendall) AS ka, min(k.kendall) AS km
       |        FROM jac j JOIN ken k USING (seed)),
       | sz AS (SELECT avg(bsize) AS ms FROM sizes)
       |SELECT metric, value FROM (
       |  SELECT 'jaccard average' AS metric, round(ja, 9) AS value FROM ag
       |  UNION ALL SELECT 'jaccard min', round(jm, 9) FROM ag
       |  UNION ALL SELECT 'kendall average', round(ka, 9) FROM ag
       |  UNION ALL SELECT 'kendall min', round(km, 9) FROM ag
       |  UNION ALL SELECT 'average map size', round(ms, 9) FROM sz)""".stripMargin
  }

  /** Global PageRank with uniform teleport and uniform dangling-mass
    * redistribution (operators/PageRank.scala), `iterations` unrolled steps.
    * The per-iteration leak is an exact grid sum over outdeg-0 nodes. */
  def pageRank(iterations: Int, damping: Double): String = {
    val leakSum = gridSum("score")
    val steps = (1 to iterations).map { i =>
      s"""lk$i AS MATERIALIZED (SELECT coalesce($leakSum, ${dlit(0.0)}) AS leak
         |   FROM p${i - 1} s LEFT JOIN od ON s.node = od.src WHERE od.src IS NULL),
         |p$i AS MATERIALIZED (SELECT node, ${gridSum("score")} AS score FROM (
         |   SELECT v.id AS node, base1 + base2 * lk.leak AS score FROM v CROSS JOIN lk$i lk CROSS JOIN consts
         |   UNION ALL
         |   SELECT a.dst AS node, s.score * a.factor AS score
         |   FROM p${i - 1} s JOIN adj a ON s.node = a.src)
         | GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    // (1-d)/n and d/n are computed by Spark in SCALA doubles; mirror that:
    // n is data-dependent, so divide the Scala-exact numerators by the
    // counted n in DOUBLE (same operation Spark's lit((1.0-d)/n) performs,
    // since x/n in scala == CAST(x AS DOUBLE)/n in SQL for the same doubles)
    s"""WITH ${graphCtes(damping)},
       | n1 AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
       | consts AS MATERIALIZED (SELECT ${dlit(1.0 - damping)} / n AS base1, ${dlit(damping)} / n AS base2, n FROM n1),
       | p0 AS MATERIALIZED (SELECT id AS node, ${dlit(1.0)} / n AS score FROM v CROSS JOIN consts),
       |$steps
       |SELECT node, score FROM p$iterations""".stripMargin
  }

  /** HITS hubs/authorities (operators/Hits): `iterations` unrolled rounds
    * of auth-from-hubs then hub-from-fresh-auths, each gathered with grid
    * sums, L1-normalized by one more grid sum, divided once, re-gridded —
    * the exact trajectory of Hits.run(quantize = 1e12, tolerance = -1). */
  def hits(iterations: Int): String = {
    val steps = (1 to iterations).map { i =>
      s"""ar$i AS (SELECT v.id AS node, coalesce(r.raw, ${dlit(0.0)}) AS raw FROM v LEFT JOIN (
         |   SELECT e.dst AS node, ${gridSum("score")} AS raw
         |   FROM h${i - 1} s JOIN e ON s.node = e.src GROUP BY 1) r ON v.id = r.node),
         | sa$i AS (SELECT ${gridSum("raw")} AS s FROM ar$i),
         | a$i AS MATERIALIZED (SELECT node, round(raw / s * 1e12) / 1e12 AS score
         |   FROM ar$i CROSS JOIN sa$i),
         | hr$i AS (SELECT v.id AS node, coalesce(r.raw, ${dlit(0.0)}) AS raw FROM v LEFT JOIN (
         |   SELECT e.src AS node, ${gridSum("score")} AS raw
         |   FROM a$i s JOIN e ON s.node = e.dst GROUP BY 1) r ON v.id = r.node),
         | sh$i AS (SELECT ${gridSum("raw")} AS s FROM hr$i),
         | h$i AS MATERIALIZED (SELECT node, round(raw / s * 1e12) / 1e12 AS score
         |   FROM hr$i CROSS JOIN sh$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
       | n1 AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
       | h0 AS MATERIALIZED (SELECT id AS node, ${dlit(1.0)} / n AS score FROM v CROSS JOIN n1),
       |$steps
       |SELECT a.node AS node, a.score AS auth, h.score AS hub
       |FROM a$iterations a JOIN h$iterations h USING (node)""".stripMargin
  }

  /** WEIGHTED global PageRank (operators/PageRank with a `weight` edge
    * column): push factor d * w(u,v) / sum_out w(u); edge weight =
    * summed integer l_quantity per (partkey, suppkey) pair. Same teleport +
    * uniform dangling redistribution and grid sums as the unweighted
    * oracle. */
  def pageRankWeighted(iterations: Int, damping: Double): String = {
    val leakSum = gridSum("score")
    val steps = (1 to iterations).map { i =>
      s"""lk$i AS MATERIALIZED (SELECT coalesce($leakSum, ${dlit(0.0)}) AS leak
         |   FROM p${i - 1} s LEFT JOIN ws ON s.node = ws.src WHERE ws.src IS NULL),
         |p$i AS MATERIALIZED (SELECT node, ${gridSum("score")} AS score FROM (
         |   SELECT v.id AS node, base1 + base2 * lk.leak AS score FROM v CROSS JOIN lk$i lk CROSS JOIN consts
         |   UNION ALL
         |   SELECT a.dst AS node, s.score * a.factor AS score
         |   FROM p${i - 1} s JOIN adj a ON s.node = a.src)
         | GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ew AS MATERIALIZED (SELECT l_partkey AS src, l_suppkey AS dst,
       |   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w FROM lineitem GROUP BY 1, 2),
       | v AS MATERIALIZED (SELECT src AS id FROM ew UNION SELECT dst AS id FROM ew),
       | ws AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM ew GROUP BY 1),
       | adj AS MATERIALIZED (SELECT ew.src, ew.dst, ${dlit(damping)} * ew.w / ws.wsum AS factor
       |   FROM ew JOIN ws USING (src)),
       | n1 AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
       | consts AS MATERIALIZED (SELECT ${dlit(1.0 - damping)} / n AS base1, ${dlit(damping)} / n AS base2, n FROM n1),
       | p0 AS MATERIALIZED (SELECT id AS node, ${dlit(1.0)} / n AS score FROM v CROSS JOIN consts),
       |$steps
       |SELECT node, score FROM p$iterations""".stripMargin
  }

  /** Host-graph projection (operators/Coarsen.project with grp = id % mod):
    * the weighted super-graph of the lineitem page graph. */
  def hostGraph(mod: Int): String =
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem)
       |SELECT src % $mod AS src, dst % $mod AS dst, count(*) AS weight
       |FROM e WHERE src % $mod <> dst % $mod GROUP BY 1, 2""".stripMargin

  /** Two-level PageRank (Coarsen.project then the weighted PageRank chain
    * on the host graph): same grid sums, teleport, and uniform dangling
    * redistribution as [[pageRankWeighted]], over the projected edges. */
  def hostPageRank(iterations: Int, damping: Double, mod: Int): String = {
    val leakSum = gridSum("score")
    val steps = (1 to iterations).map { i =>
      s"""lk$i AS MATERIALIZED (SELECT coalesce($leakSum, ${dlit(0.0)}) AS leak
         |   FROM p${i - 1} s LEFT JOIN ws ON s.node = ws.src WHERE ws.src IS NULL),
         |p$i AS MATERIALIZED (SELECT node, ${gridSum("score")} AS score FROM (
         |   SELECT v.id AS node, base1 + base2 * lk.leak AS score FROM v CROSS JOIN lk$i lk CROSS JOIN consts
         |   UNION ALL
         |   SELECT a.dst AS node, s.score * a.factor AS score
         |   FROM p${i - 1} s JOIN adj a ON s.node = a.src)
         | GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | pv AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
       | ew AS MATERIALIZED (SELECT src % $mod AS src, dst % $mod AS dst,
       |   count(*) AS w FROM e WHERE src % $mod <> dst % $mod GROUP BY 1, 2),
       | v AS MATERIALIZED (SELECT DISTINCT id % $mod AS id FROM pv),
       | ws AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM ew GROUP BY 1),
       | adj AS MATERIALIZED (SELECT ew.src, ew.dst, ${dlit(damping)} * ew.w / ws.wsum AS factor
       |   FROM ew JOIN ws USING (src)),
       | n1 AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
       | consts AS MATERIALIZED (SELECT ${dlit(1.0 - damping)} / n AS base1, ${dlit(damping)} / n AS base2, n FROM n1),
       | p0 AS MATERIALIZED (SELECT id AS node, ${dlit(1.0)} / n AS score FROM v CROSS JOIN consts),
       |$steps
       |SELECT node, score FROM p$iterations""".stripMargin
  }

  /** Synchronous label propagation, fixed rounds, undirected closure
    * (operators/Components.labelPropagation): most frequent neighbor label,
    * ties -> smallest label, isolated vertices keep their label. */
  def labelPropagation(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""w$i AS MATERIALIZED (SELECT dst AS wid, label AS new_label FROM (
         |   SELECT u.dst, s.label, count(*) AS cnt
         |   FROM l${i - 1} s JOIN und u ON s.id = u.src GROUP BY 1, 2)
         | QUALIFY row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, label ASC) = 1),
         |l$i AS MATERIALIZED (SELECT s.id, coalesce(w.new_label, s.label) AS label
         | FROM l${i - 1} s LEFT JOIN w$i w ON s.id = w.wid)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
       | und AS MATERIALIZED (SELECT src, dst FROM e WHERE src <> dst
       |         UNION SELECT dst, src FROM e WHERE src <> dst),
       | l0 AS MATERIALIZED (SELECT id, id AS label FROM v),
       |$steps
       |SELECT id, label FROM l$rounds""".stripMargin
  }

  /** MCCompletePathV2 (operators/MonteCarloPpr): replays the seeded walk
    * simulation step by step — the mix31 quadratic mixer mod 2^31-1 uses
    * only BIGINT-safe arithmetic, so DuckDB reproduces every survival draw
    * and successor pick exactly; visit counts are integers and the combine
    * phase runs grid-summed, so the final scores are bit-identical. */
  /** One walk step CTE w{s} — the survival mix chain (sh/sh2/sh3) and pick
    * mix (ph/ph2) shared by EVERY walk-family oracle (walkTrace, mcPpr and
    * their weighted variants — previously four hand-kept copies; a missed
    * edit in one would be a silent oracle/engine divergence). `weighted`
    * switches the successor pick between round-robin modulo outdeg and the
    * cumulative-weight interval — MonteCarloPpr.pickIdx's two arms. */
  private def walkStepCte(st: Int, damping: Double, sSalt: Long, pSalt: Long,
      weighted: Boolean): String = {
    val p = 2147483647L
    val dl = dlit(damping)
    val adjCols = if (weighted) "a.dsts, a.cws, a.totw" else "a.dsts, a.outdeg"
    val innerCols = if (weighted) "dsts, cws, totw" else "dsts, outdeg"
    val pick1 =
      if (weighted) "a.dsts[CAST(len(list_filter(a.cws, c -> c <= (s.walkId % a.totw))) + 1 AS INT)]"
      else "a.dsts[CAST(s.walkId % a.outdeg AS INT) + 1]"
    val pickN =
      if (weighted)
        s"dsts[CAST(len(list_filter(cws, c -> c <= ((walkId + (ph2*ph2 + ph2 + 67890) % $p) % totw))) + 1 AS INT)]"
      else s"dsts[CAST((walkId + (ph2*ph2 + ph2 + 67890) % $p) % outdeg AS INT) + 1]"
    if (st == 1)
      s"""w1 AS MATERIALIZED (SELECT s.seed, s.walkId, $pick1 AS cur
         | FROM w0 s JOIN adjl a ON s.cur = a.src)""".stripMargin
    else
      s"""w$st AS MATERIALIZED (
         | SELECT seed, walkId, $pickN AS cur
         | FROM (
         |  SELECT seed, walkId, $innerCols, (ph*ph + ph + 12345) % $p AS ph2
         |  FROM (
         |   SELECT sv.seed, sv.walkId, $adjCols,
         |          ((sv.seed % $p)*48271 + (sv.cur % $p)*16807 + ($st % $p)*69621 + $pSalt) % $p AS ph
         |   FROM (
         |    SELECT seed, walkId, cur FROM (
         |     SELECT seed, walkId, cur, (sh2*sh2 + sh2 + 67890) % $p AS sh3
         |     FROM (
         |      SELECT seed, walkId, cur, (sh*sh + sh + 12345) % $p AS sh2
         |      FROM (
         |       SELECT seed, walkId, cur,
         |              ((seed % $p)*48271 + (walkId % $p)*16807 + ($st % $p)*69621 + $sSalt) % $p AS sh
         |       FROM w${st - 1})))
         |    WHERE sh3 / CAST($p AS DOUBLE) <= $dl
         |   ) sv JOIN adjl a ON sv.cur = a.src)))""".stripMargin
  }

  /** Weighted adjacency lists with cumulative integer weights (the mirror
    * of MonteCarloPpr.buildAdj's weighted contract): dsts in dst order,
    * cws = prefix sums of w in the same order, totw = Σw. Requires an
    * `ew(src, dst, w)` CTE in scope; window-sum of BIGINT is HUGEINT in
    * DuckDB, hence the casts. */
  private def weightedAdjlCte: String =
    s"""adjl AS MATERIALIZED (SELECT src, list(dst ORDER BY dst) AS dsts,
       |   list(cw ORDER BY dst) AS cws, count(*) AS outdeg, CAST(max(cw) AS BIGINT) AS totw
       |  FROM (SELECT src, dst, CAST(sum(w) OVER (PARTITION BY src ORDER BY dst) AS BIGINT) AS cw FROM ew)
       |  GROUP BY src)""".stripMargin

  /** The lineitem-derived weighted edge CTE (SparkEntry.weightedEdges). */
  private[graft] def lineitemEwCte: String =
    s"""ew AS MATERIALIZED (SELECT l_partkey AS src, l_suppkey AS dst,
       |   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** The host-graph weighted edge CTE (Coarsen.project over id % mod). */
  private[graft] def hostEwCte(mod: Int): String =
    s"""e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | ew AS MATERIALIZED (SELECT src % $mod AS src, dst % $mod AS dst, count(*) AS w
       |   FROM e WHERE src % $mod <> dst % $mod GROUP BY 1, 2)""".stripMargin

  /** WEIGHTED random-walk corpus trace (walkTrace over a `weight` column):
    * same survival recursion, weight-proportional picks. `ewCte` supplies
    * the weighted edge table — [[lineitemEwCte]] or [[hostEwCte]] (the
    * host-graph → walk-corpus composition). */
  def walkTraceWeighted(walksPerNode: Int, maxSteps: Int, damping: Double,
      salt: Long, ewCte: String): String = {
    val sSalt = salt * 7919L + 1234567L
    val pSalt = salt * 7919L + 7654321L
    val steps = (1 to maxSteps)
      .map(walkStepCte(_, damping, sSalt, pSalt, weighted = true)).mkString(",\n")
    val unions = (1 to maxSteps)
      .map(s => s"SELECT seed, walkId AS walk_id, $s AS step, cur AS node FROM w$s")
      .mkString("\n  UNION ALL ")
    s"""WITH $ewCte,
       | $weightedAdjlCte,
       | w0 AS MATERIALIZED (SELECT a.src AS seed, a.src AS cur, t.walkId
       |        FROM adjl a CROSS JOIN (SELECT unnest(range($walksPerNode)) AS walkId) t),
       |$steps
       |SELECT seed, walkId AS walk_id, 0 AS step, cur AS node FROM w0
       |  UNION ALL $unions""".stripMargin
  }

  /** WEIGHTED MC PPR (MonteCarloPpr.run over a `weight` column): weighted
    * walk steps, then the combine superstep with the PER-EDGE factor
    * d·w/Σ_out w — self entries are exactly 1.0 and scaling happens inside
    * the gather (scale-then-prune; see finishFromVisits' doc). */
  def mcPprWeighted(k: Int, l: Int, r: Int, damping: Double, salt: Long,
      maxSteps: Int): String = {
    val sSalt = salt * 7919L + 1234567L
    val pSalt = salt * 7919L + 7654321L
    val effective = math.floor(r * damping).toLong
    val dl = dlit(damping)
    val steps = (1 to maxSteps)
      .map(walkStepCte(_, damping, sSalt, pSalt, weighted = true)).mkString(",\n")
    val visitUnion = (1 to maxSteps)
      .map(s => s"SELECT seed, cur AS node FROM w$s").mkString("\n   UNION ALL ")
    s"""WITH $lineitemEwCte,
       | v AS MATERIALIZED (SELECT src AS id FROM ew UNION SELECT dst AS id FROM ew),
       | $weightedAdjlCte,
       | w0 AS MATERIALIZED (SELECT a.src AS seed, a.src AS cur, t.walkId
       |        FROM adjl a CROSS JOIN (SELECT unnest(range($effective)) AS walkId) t),
       |$steps,
       | visits AS MATERIALIZED (SELECT seed, node, count(*) AS visits FROM (
       |   $visitUnion) GROUP BY 1, 2),
       | wb0 AS MATERIALIZED (SELECT seed, node, CAST(sum(visits) AS BIGINT) / CAST($r AS DOUBLE) AS score FROM (
       |   SELECT id AS seed, id AS node, CAST($r AS BIGINT) AS visits FROM v
       |   UNION ALL SELECT seed, node, visits FROM visits) GROUP BY 1, 2),
       | wb AS MATERIALIZED (SELECT seed, node, score FROM wb0
       |   QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $l),
       | ws AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM ew GROUP BY 1),
       | ef AS MATERIALIZED (SELECT ew.src, ew.dst, $dl * ew.w / ws.wsum AS efactor
       |        FROM ew JOIN ws USING (src)),
       | comb0 AS MATERIALIZED (SELECT seed, node, ${gridSum("score")} AS score FROM (
       |   SELECT id AS seed, id AS node, ${dlit(1.0)} AS score FROM v
       |   UNION ALL
       |   SELECT ef.src AS seed, b.node AS node, b.score * ef.efactor AS score
       |   FROM ef JOIN wb b ON ef.dst = b.seed)
       |  GROUP BY 1, 2),
       | fin AS MATERIALIZED (SELECT seed, node, score FROM comb0
       |   QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $l)
       |SELECT seed, node, score FROM fin
       |QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $k""".stripMargin
  }

  /** Random-walk corpus trace (operators/MonteCarloPpr.walkTrace): the SAME
    * per-step survival+pick recursion as [[mcPpr]], emitting every
    * (seed, walk_id, step, node) position instead of visit counts. */
  def walkTrace(walksPerNode: Int, maxSteps: Int, damping: Double, salt: Long): String = {
    val sSalt = salt * 7919L + 1234567L
    val pSalt = salt * 7919L + 7654321L
    val steps = (1 to maxSteps)
      .map(walkStepCte(_, damping, sSalt, pSalt, weighted = false)).mkString(",\n")
    val unions = (1 to maxSteps)
      .map(s => s"SELECT seed, walkId AS walk_id, $s AS step, cur AS node FROM w$s")
      .mkString("\n  UNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
       | adjl AS MATERIALIZED (SELECT src, list(dst ORDER BY dst) AS dsts, count(*) AS outdeg FROM e GROUP BY src),
       | w0 AS MATERIALIZED (SELECT v.id AS seed, v.id AS cur, t.walkId
       |        FROM v JOIN adjl a ON v.id = a.src
       |        CROSS JOIN (SELECT unnest(range($walksPerNode)) AS walkId) t),
       |$steps
       |SELECT seed, walkId AS walk_id, 0 AS step, cur AS node FROM w0
       |  UNION ALL $unions""".stripMargin
  }

  def mcPpr(k: Int, l: Int, r: Int, damping: Double, salt: Long, maxSteps: Int): String = {
    val sSalt = salt * 7919L + 1234567L // survivalSalt(salt)
    val pSalt = salt * 7919L + 7654321L         // pickSalt(salt)
    val effective = math.floor(r * damping).toLong
    val dl = dlit(damping)
    val steps = (1 to maxSteps)
      .map(walkStepCte(_, damping, sSalt, pSalt, weighted = false)).mkString(",\n")
    val visitUnion = (1 to maxSteps)
      .map(s => s"SELECT seed, cur AS node FROM w$s").mkString("\n   UNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
       | adjl AS MATERIALIZED (SELECT src, list(dst ORDER BY dst) AS dsts, count(*) AS outdeg FROM e GROUP BY src),
       | w0 AS MATERIALIZED (SELECT v.id AS seed, v.id AS cur, t.walkId
       |        FROM v JOIN adjl a ON v.id = a.src
       |        CROSS JOIN (SELECT unnest(range($effective)) AS walkId) t),
       |$steps,
       | visits AS MATERIALIZED (SELECT seed, node, count(*) AS visits FROM (
       |   $visitUnion) GROUP BY 1, 2),
       | wb0 AS MATERIALIZED (SELECT seed, node, CAST(sum(visits) AS BIGINT) / CAST($r AS DOUBLE) AS score FROM (
       |   SELECT id AS seed, id AS node, CAST($r AS BIGINT) AS visits FROM v
       |   UNION ALL SELECT seed, node, visits FROM visits) GROUP BY 1, 2),
       | wb AS MATERIALIZED (SELECT seed, node, score FROM wb0
       |   QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $l),
       | fac AS MATERIALIZED (SELECT v.id, CASE WHEN a.outdeg IS NULL OR a.outdeg = 0 THEN ${dlit(1.0)}
       |                           ELSE $dl / a.outdeg END AS factor
       |         FROM v LEFT JOIN adjl a ON v.id = a.src),
       | comb0 AS MATERIALIZED (SELECT seed, node, ${gridSum("score")} AS score FROM (
       |   SELECT f.id AS seed, f.id AS node, ${dlit(1.0)} / f.factor AS score FROM fac f
       |   UNION ALL
       |   SELECT e.src AS seed, b.node AS node, b.score AS score FROM e JOIN wb b ON e.dst = b.seed)
       |  GROUP BY 1, 2),
       | comb1 AS MATERIALIZED (SELECT seed, node, score FROM comb0
       |   QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $l),
       | fin AS MATERIALIZED (SELECT c.seed, c.node, c.score * f.factor AS score
       |         FROM comb1 c JOIN fac f ON c.seed = f.id)
       |SELECT seed, node, score FROM fin
       |QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $k""".stripMargin
  }

  /** Text annotation (functions/TextAnalysis.langId + qualityScore): pure
    * per-row column math, mirrored term by term (token regex, stopword-hit
    * argmax with position bonus, band/ratio quality formula). All divisions
    * and products run on identical doubles in both engines — bit-exact. */
  /** Shared annotate chain (functions/TextAnalysis.annotate): CTEs
    * t/h/q/comp/ann over `corpusSql` — a relation with (doc_id, text) plus
    * any `carry` columns threaded through to `ann`, which exposes
    * (doc_id[, carry...], lang_pred, n_tokens, quality). */
  private def annotateCtes(corpusSql: String, carry: Seq[String]): String = {
    import graft.functions.TextAnalysis.stopwords
    val langs = Seq("en", "de", "fr", "it", "es")
    def hit(l: String): String =
      s"len(list_filter(toks, x -> x IN (${stopwords(l).map(w => s"'$w'").mkString(", ")})))"
    val hitCols = langs.map(l => s"${hit(l)} AS h_$l").mkString(",\n    ")
    val rawMax = langs.map(l => s"h_$l").mkString("greatest(", ", ", ")")
    val bonus = langs.zipWithIndex.map { case (l, i) => s"h_$l * 10 - $i" }
    val argmax = langs.zip(bonus).init
      .map { case (l, b) => s"WHEN $b THEN '$l'" }
      .mkString(s"CASE greatest(${bonus.mkString(", ")}) ", " ", s" ELSE '${langs.last}' END")
    val c = carry.map(", " + _).mkString
    s"""t AS MATERIALIZED (
       |  SELECT doc_id, text$c, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks FROM $corpusSql),
       | h AS MATERIALIZED (
       |  SELECT doc_id, text$c, toks,
       |    $hitCols
       |  FROM t),
       | q AS MATERIALIZED (
       |  SELECT doc_id$c, toks, h_en, h_de, h_fr, h_it, h_es,
       |    CAST(length(text) AS DOUBLE) AS n,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
       |    CAST(length(regexp_replace(text, '[^.,;:!?"'']', '', 'g')) AS DOUBLE) AS punct,
       |    CAST(len(toks) AS DOUBLE) AS ntok,
       |    CAST(h_en AS DOUBLE) AS stophits,
       |    CASE WHEN len(toks) > 0
       |         THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) / CAST(len(toks) AS DOUBLE)
       |         ELSE ${dlit(0.0)} END AS mwl
       |  FROM h),
       | comp AS MATERIALIZED (
       |  SELECT doc_id$c, toks, h_en, h_de, h_fr, h_it, h_es,
       |    CASE WHEN n > 0 THEN alpha / n ELSE ${dlit(0.0)} END AS alpha_ratio,
       |    CASE WHEN n > 0 THEN punct / n ELSE ${dlit(0.0)} END AS punct_ratio,
       |    CASE WHEN ntok > 0 THEN stophits / ntok ELSE ${dlit(0.0)} END AS stopword_ratio,
       |    CASE WHEN n >= 200 AND n <= 20000 THEN ${dlit(1.0)} WHEN n >= 50 THEN ${dlit(0.5)} ELSE ${dlit(0.0)} END AS len_band,
       |    CASE WHEN mwl >= 3 AND mwl <= 10 THEN ${dlit(1.0)} ELSE ${dlit(0.3)} END AS word_band
       |  FROM q),
       | ann AS MATERIALIZED (
       |  SELECT doc_id$c,
       |    CASE WHEN $rawMax = 0 THEN 'und' ELSE $argmax END AS lang_pred,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    len_band * ${dlit(0.25)} + word_band * ${dlit(0.15)} + alpha_ratio * ${dlit(0.25)}
       |      + (${dlit(1.0)} - least(punct_ratio * 5, ${dlit(1.0)})) * ${dlit(0.15)}
       |      + least(stopword_ratio * 4, ${dlit(1.0)}) * ${dlit(0.2)} AS quality
       |  FROM comp)""".stripMargin
  }

  def textAnnotate(): String =
    s"""WITH ${annotateCtes("documents", Nil)}
       |SELECT doc_id, lang_pred, n_tokens, quality FROM ann""".stripMargin

  /** Corpus-prep composition (SparkEntry q_corpus_prep): planted-duplicate
    * corpus -> exact dedup (min doc_id per text) -> annotate -> keep
    * lang_pred = 'en' AND quality >= threshold -> per-source stats with a
    * grid-summed average (one division of exact operands). */
  def corpusPrep(quality: Double): String =
    s"""WITH dup AS MATERIALIZED (SELECT doc_id, text, source FROM documents
       |   UNION ALL SELECT doc_id + 1000000, text, source FROM documents),
       | keep AS MATERIALIZED (SELECT min(doc_id) AS doc_id FROM dup GROUP BY text),
       | corpus AS MATERIALIZED (SELECT d.doc_id, d.text, d.source FROM dup d JOIN keep USING (doc_id)),
       | ${annotateCtes("corpus", Seq("source"))},
       | filt AS MATERIALIZED (SELECT * FROM ann WHERE lang_pred = 'en' AND quality >= ${dlit(quality)})
       |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  ${gridSum("quality")} / count(*) AS avg_quality
       |FROM filt GROUP BY 1""".stripMargin

  /** Multimodal metadata decode (functions/Multimodal.decodeMeta over the
    * mix31-synthesized corpus): every header field regenerated from
    * range(n) with the same mixer the synthesizer used. */
  def multimodalMeta(n: Long, seed: Long): String = {
    val salt = seed * 7919L + 888887L
    def m(role: Int, i: String = "0") = s"(${graft.kernels.Mix.sql("id", i, role.toString, salt)})"
    s"""WITH r AS MATERIALIZED (SELECT unnest(range($n)) AS id)
       |SELECT id AS media_id,
       |  CASE ${m(0)} % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |  CAST(${m(1)} % 512 + 16 AS INT) AS width,
       |  CAST(${m(2)} % 512 + 16 AS INT) AS height,
       |  CAST(${m(3)} % 3 + 1 AS INT) AS channels,
       |  CAST(${m(4)} % 200 + 32 + 6 AS INT) AS n_bytes
       |FROM r""".stripMargin
  }

  /** Multimodal feature extraction (FakeCodec.features byte histogram):
    * content bytes regenerated from the mixer; bin mass and bin0 mirrored. */
  def mediaFeatures(n: Long, seed: Long): String = {
    val salt = seed * 7919L + 888887L
    def m(role: Int, i: String = "0") = s"(${graft.kernels.Mix.sql("id", i, role.toString, salt)})"
    s"""WITH r AS MATERIALIZED (SELECT unnest(range($n)) AS id),
       | c AS MATERIALIZED (SELECT id, ${m(4)} % 200 + 32 AS clen FROM r),
       | b AS MATERIALIZED (SELECT id, clen,
       |     list_transform(range(0, clen + 1), j -> ${m(5, "j")} % 256) AS bytes FROM c)
       |SELECT id AS media_id,
       |  round(list_reduce(
       |    list_transform(range(0, 16), k -> CAST(len(list_filter(bytes, x -> x // 16 = k)) AS DOUBLE) / (clen + 1)),
       |    (a, b) -> a + b), 6) AS feature_mass,
       |  CAST(len(list_filter(bytes, x -> x // 16 = 0)) AS DOUBLE) / (clen + 1) AS bin0
       |FROM b""".stripMargin
  }

  /** LSH-bucketed ANN top-k (functions/Similarity.lshTopK): hyperplane
    * signatures recomputed from the mixer, half-signature bucket join,
    * exact cosine within candidates (list_cosine_similarity is bit-equal to
    * the engine's fold cosine on DOUBLE[] — proven by q_ann_brute). */
  def annLsh(k: Int, planes: Int, seed: Long, queryBound: Long): String = {
    val salt = seed * 7919L + 555557L
    val comp = s"((${graft.kernels.Mix.sql("i", "p", "0", salt)}) % 2000001 - 1000000) / CAST(1000000.0 AS DOUBLE)"
    val half = (1L << (planes / 2)) - 1
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       | sg AS MATERIALIZED (SELECT vec_id, v,
       |   CAST(list_sum(list_transform(range(0, $planes), p ->
       |     CASE WHEN list_reduce(
       |            list_transform(range(0, len(v)), i -> v[i + 1] * ($comp)),
       |            (a, b) -> a + b) >= 0
       |          THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
       |   FROM emb),
       | hv AS MATERIALIZED (
       |   SELECT vec_id, 0 AS part, sig & $half AS h FROM sg
       |   UNION ALL SELECT vec_id, 1, sig >> ${planes / 2} FROM sg),
       | cand AS MATERIALIZED (
       |   SELECT DISTINCT q.vec_id AS seed, c.vec_id AS node
       |   FROM hv q JOIN hv c ON q.part = c.part AND q.h = c.h
       |   WHERE q.vec_id < $queryBound AND q.vec_id <> c.vec_id),
       | sc AS MATERIALIZED (
       |   SELECT cand.seed, cand.node, list_cosine_similarity(a.v, b.v) AS score
       |   FROM cand JOIN emb a ON cand.seed = a.vec_id JOIN emb b ON cand.node = b.vec_id)
       |SELECT seed, node FROM sc
       |QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $k""".stripMargin
  }

  /** IVF ANN top-k (functions/Similarity.ivfTopK): the FULL pipeline is
    * replayed — seeded initial centroids (mix31 components), one Lloyd step
    * whose per-cell means are fixed-point grid sums (order-independent),
    * cosine argmax assignment (ties -> smallest cell), nProbe best cells
    * per query, exact cosine within probed cells, top-k. */
  def annIvf(k: Int, nCells: Int, nProbe: Int, dims: Int, seed: Long,
      queryBound: Int): String = {
    val comp = graft.kernels.Mix.sql("i", "c", "1", seed * 7919L + 777773L)
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       | cent0 AS MATERIALIZED (SELECT c,
       |     list_transform(range(0, $dims), i -> (($comp) % 2000001 - 1000000) / 1000000.0) AS cent
       |   FROM range(0, $nCells) t(c)),
       | a0 AS MATERIALIZED (SELECT vec_id, v, c, list_cosine_similarity(v, cent) AS s
       |   FROM emb CROSS JOIN cent0),
       | asg0 AS MATERIALIZED (SELECT vec_id, v, c AS cell FROM a0
       |   QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) = 1),
       | sums AS MATERIALIZED (SELECT cell, dim,
       |     CAST(sum(CAST(round(x * 1e6) AS BIGINT)) AS BIGINT) AS sx, count(*) AS n
       |   FROM (SELECT cell, unnest(range(0, $dims)) AS dim, unnest(v) AS x FROM asg0)
       |   GROUP BY 1, 2),
       | cent1n AS MATERIALIZED (SELECT cell AS c, list(sx / (n * 1e6) ORDER BY dim) AS cent
       |   FROM sums GROUP BY cell),
       | cent1 AS MATERIALIZED (SELECT c0.c AS c, coalesce(c1.cent, c0.cent) AS cent
       |   FROM cent0 c0 LEFT JOIN cent1n c1 ON c0.c = c1.c),
       | a1 AS MATERIALIZED (SELECT e.vec_id, e.v, c1.c, list_cosine_similarity(e.v, c1.cent) AS s
       |   FROM emb e CROSS JOIN cent1 c1),
       | inv AS MATERIALIZED (SELECT vec_id AS node, v AS cv, c AS cell FROM a1
       |   QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) = 1),
       | probes AS MATERIALIZED (SELECT vec_id AS seed, v AS qv, c AS cell FROM a1
       |   WHERE vec_id < $queryBound
       |   QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) <= $nProbe),
       | sc AS MATERIALIZED (SELECT DISTINCT p.seed, i.node,
       |     list_cosine_similarity(p.qv, i.cv) AS score
       |   FROM probes p JOIN inv i ON p.cell = i.cell WHERE p.seed <> i.node)
       |SELECT seed, node FROM sc
       |QUALIFY row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) <= $k""".stripMargin
  }

  /** ANN recall@k report (functions/Similarity.recallAtK over lshTopK +
    * ivfTopK vs bruteForceTopK): the three pipelines are replayed in full
    * (nested-WITH copies of the annLsh / annIvf oracles and the exact
    * brute-force scorer), per-seed hit counts stay exact integers, and each
    * metric is ONE floating division — bit-exact with no rounding. */
  def annRecall(k: Int, planes: Int, seedSalt: Long, queryBound: Int,
      nCells: Int, nProbe: Int, dims: Int): String = {
    val brute =
      s"""WITH scored AS (
         | SELECT q.vec_id AS seed, c.vec_id AS node,
         |   list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS score
         | FROM embeddings q JOIN embeddings c ON q.vec_id < $queryBound AND q.vec_id <> c.vec_id)
         |SELECT seed, node FROM (
         | SELECT seed, node, row_number() OVER (PARTITION BY seed ORDER BY score DESC, node ASC) rn
         | FROM scored) WHERE rn <= $k""".stripMargin
    s"""WITH ex AS MATERIALIZED ($brute),
       | al AS MATERIALIZED (${annLsh(k, planes, seedSalt, queryBound)}),
       | ai AS MATERIALIZED (${annIvf(k, nCells, nProbe, dims, seedSalt, queryBound)}),
       | sds AS (SELECT DISTINCT seed FROM ex),
       | hl AS (SELECT e.seed, count(*) AS h FROM ex e JOIN al a ON e.seed = a.seed AND e.node = a.node GROUP BY 1),
       | hi AS (SELECT e.seed, count(*) AS h FROM ex e JOIN ai a ON e.seed = a.seed AND e.node = a.node GROUP BY 1),
       | pl AS (SELECT s.seed, coalesce(h, 0) AS h FROM sds s LEFT JOIN hl USING (seed)),
       | pi AS (SELECT s.seed, coalesce(h, 0) AS h FROM sds s LEFT JOIN hi USING (seed)),
       | rl AS (SELECT 'lsh' AS method, count(*) AS n_seeds,
       |   CAST(sum(h) AS BIGINT) AS hits, CAST(min(h) AS BIGINT) AS min_hits FROM pl),
       | ri AS (SELECT 'ivf' AS method, count(*) AS n_seeds,
       |   CAST(sum(h) AS BIGINT) AS hits, CAST(min(h) AS BIGINT) AS min_hits FROM pi)
       |SELECT method, n_seeds, hits,
       |  CAST(hits AS DOUBLE) / (n_seeds * $k) AS avg_recall,
       |  CAST(min_hits AS DOUBLE) / $k AS min_recall
       |FROM (SELECT * FROM rl UNION ALL SELECT * FROM ri)""".stripMargin
  }

  /** Shared CTE prefix of the threshold-0.7 near-dup oracles: the planted
    * near-duplicate corpus (every document + a copy with an appended tail —
    * long docs stay above shingle-Jaccard 0.7, short ones drop below, so the
    * threshold actually separates) and its distinct word-3-shingle sets
    * (functions/Dedup.tokenShingles over TextAnalysis.tokens). */
  private def nearDupShingleCtes(tail: String, k: Int, extraDocsSql: String = ""): String =
    s"""d AS MATERIALIZED (
       |   SELECT doc_id AS id, text FROM documents
       |   UNION ALL SELECT doc_id + 1000000, text || '$tail' FROM documents$extraDocsSql),
       | tk AS MATERIALIZED (SELECT id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks FROM d),
       | sh AS MATERIALIZED (SELECT id, list_distinct(
       |   CASE WHEN len(toks) <= $k THEN [array_to_string(toks, ' ')]
       |        ELSE list_transform(range(0, len(toks) - ${k - 1}), i -> array_to_string(toks[i+1:i+$k], ' ')) END) AS sh
       |   FROM tk)""".stripMargin

  /** Candidate verification shared by both near-dup oracles: exact distinct
    * shingle-set Jaccard >= threshold (mirrors Dedup.verifyJaccard:
    * |intersect| / |union| as one double division of exact ints). */
  private def jaccardVerify(candCte: String, threshold: Double): String =
    s""" ji AS MATERIALIZED (SELECT c.id_a, c.id_b,
       |    len(list_intersect(a.sh, b.sh)) AS ni, len(a.sh) AS na, len(b.sh) AS nb
       |   FROM $candCte c JOIN sh a ON c.id_a = a.id JOIN sh b ON c.id_b = b.id)
       |SELECT id_a, id_b, CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE) AS jaccard
       |FROM ji WHERE CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE) >= ${dlit(threshold)}""".stripMargin

  /** N-gram Jaccard near-dup at threshold < 1 (functions/Dedup.ngramJaccard
    * with an unbounded hot-shingle cap, so candidate recall is exactly 1 and
    * the oracle needs no banding replay — any pair above threshold shares a
    * shingle). */
  def ngramNearDup(tail: String, k: Int, threshold: Double): String =
    s"""WITH ${nearDupShingleCtes(tail, k)},
       | inv AS MATERIALIZED (SELECT id, unnest(sh) AS s FROM sh),
       | cand AS MATERIALIZED (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |   FROM inv x JOIN inv y ON x.s = y.s AND x.id < y.id),
       |${jaccardVerify("cand", threshold)}""".stripMargin

  /** Near-dup cluster resolution (functions/Dedup.clusters over
    * ngramJaccard pairs) on the CHAIN corpus: every document plus a
    * one-tail copy (+1e6) and a two-tail copy (+2e6). Long documents link
    * a~a+1e6 and a+1e6~a+2e6 above threshold while a~a+2e6 falls below —
    * the cluster still merges all three THROUGH the middle copy, which is
    * exactly the transitivity the operator exists to resolve. Pairs replay
    * via the inverted-index + exact-Jaccard CTEs; components via the
    * recursive min-propagation CTE; pair-free docs canonicalize to
    * themselves. */
  def dedupClusters(tail: String, tail2: String, k: Int, threshold: Double,
      cap: Int): String = {
    val extra =
      s"""
         |   UNION ALL SELECT doc_id + 2000000, text || '$tail' || '$tail2' FROM documents""".stripMargin
    s"""WITH RECURSIVE
       | ${nearDupShingleCtes(tail, k, extra)},
       | inv AS MATERIALIZED (SELECT id, unnest(sh) AS s FROM sh),
       | rare AS MATERIALIZED (SELECT s FROM inv GROUP BY s HAVING count(*) <= $cap),
       | invr AS MATERIALIZED (SELECT inv.id, inv.s FROM inv JOIN rare USING (s)),
       | cand AS MATERIALIZED (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |   FROM invr x JOIN invr y ON x.s = y.s AND x.id < y.id),
       | ji AS MATERIALIZED (SELECT c.id_a, c.id_b,
       |    len(list_intersect(a.sh, b.sh)) AS ni, len(a.sh) AS na, len(b.sh) AS nb
       |   FROM cand c JOIN sh a ON c.id_a = a.id JOIN sh b ON c.id_b = b.id),
       | pr AS MATERIALIZED (SELECT id_a, id_b FROM ji
       |   WHERE CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE) >= ${dlit(threshold)}),
       | u AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pr
       |   UNION ALL SELECT id_b, id_a FROM pr),
       | r(id, comp) AS (SELECT id, id FROM d
       |   UNION
       |   SELECT u.dst, r.comp FROM r JOIN u ON r.id = u.src)
       |SELECT id AS doc_id, min(comp) AS canonical FROM r GROUP BY 1""".stripMargin
  }

  /** N-gram Jaccard near-dup with a FINITE hot-shingle cap — the actual
    * 100-TB configuration of functions/Dedup.ngramJaccard (the inverted
    * index drops shingles whose document frequency exceeds `cap` from
    * candidate generation; they still count in verification). The corpus
    * adds `hotN` identical flood documents whose only shingles are hot, so
    * the cap MEASURABLY changes the output (uncapped they'd contribute
    * hotN*(hotN-1)/2 jaccard-1.0 pairs; capped they contribute none), and
    * the oracle replays the df-filter in SQL rather than assuming recall 1. */
  def ngramNearDupCapped(tail: String, k: Int, threshold: Double, cap: Int,
      hotText: String, hotN: Int): String = {
    val extra =
      s"""
         |   UNION ALL SELECT 2000000 + i, '$hotText' FROM range(0, $hotN) t(i)""".stripMargin
    s"""WITH ${nearDupShingleCtes(tail, k, extra)},
       | inv AS MATERIALIZED (SELECT id, unnest(sh) AS s FROM sh),
       | rare AS MATERIALIZED (SELECT s FROM inv GROUP BY s HAVING count(*) <= $cap),
       | invr AS MATERIALIZED (SELECT inv.id, inv.s FROM inv JOIN rare USING (s)),
       | cand AS MATERIALIZED (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |   FROM invr x JOIN invr y ON x.s = y.s AND x.id < y.id),
       |${jaccardVerify("cand", threshold)}""".stripMargin
  }

  /** MinHash+LSH near-dup at threshold < 1 (functions/Dedup.minhashLshMix):
    * the FULL approximate pipeline is replayed — per-shingle polynomial char
    * hash, per-permutation quadratic mixing, banded bucket hashes, bucket
    * equi-join candidates, exact Jaccard verify — so even banding recall
    * misses are reproduced bit-exactly. */
  def minhashNearDup(tail: String, k: Int, bands: Int, rowsPerBand: Int,
      threshold: Double, salt: Long): String = {
    val p = graft.kernels.Mix.P
    val perms = bands * rowsPerBand
    val permMix = graft.kernels.Mix.sql("h", "p", "0", graft.functions.Dedup.permSalt(salt))
    val bandMix = graft.kernels.Mix.sql("a", "x", "band", graft.functions.Dedup.bandSalt(salt))
    s"""WITH ${nearDupShingleCtes(tail, k)},
       | hs AS MATERIALIZED (SELECT id, list_transform(sh, s ->
       |     CASE WHEN length(s) = 0 THEN CAST(0 AS BIGINT)
       |          ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
       |                 list_transform(range(1, length(s) + 1), i -> CAST(ascii(s[i:i]) AS BIGINT))),
       |               (a, c) -> (a * 31 + c) % $p) END) AS hs
       |   FROM sh),
       | sg AS MATERIALIZED (SELECT id, list_transform(range(0, $perms), p ->
       |     coalesce(list_min(list_transform(hs, h -> ($permMix))), $p)) AS sig
       |   FROM hs),
       | bnd AS MATERIALIZED (SELECT id, band,
       |     list_reduce(list_prepend(CAST(0 AS BIGINT), sig[band*$rowsPerBand+1 : band*$rowsPerBand+$rowsPerBand]),
       |       (a, x) -> ($bandMix)) AS bhash
       |   FROM (SELECT id, sig, unnest(range(0, $bands)) AS band FROM sg)),
       | cand AS MATERIALIZED (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |   FROM bnd x JOIN bnd y ON x.band = y.band AND x.bhash = y.bhash AND x.id < y.id),
       |${jaccardVerify("cand", threshold)}""".stripMargin
  }

  /** Vertex-id collision audit (sources/WebCorpus.idCollisionAudit) under a
    * deliberately weak SQL-replayable id — polynomial char hash mod
    * `modulus` — over urls derived from doc ids, so the DETECTION path is
    * what the driver verifies (ids with > 1 distinct url, their url count,
    * and the min-url witness). */
  def idCollisionAudit(modulus: Int): String = {
    val p = graft.kernels.Mix.P
    s"""WITH u AS MATERIALIZED (
       |   SELECT DISTINCT 'https://docs.example/' || doc_id AS url FROM documents),
       | h AS MATERIALIZED (SELECT url,
       |   list_reduce(list_prepend(CAST(0 AS BIGINT),
       |     list_transform(range(1, length(url) + 1), i -> CAST(ascii(url[i:i]) AS BIGINT))),
       |     (a, c) -> (a * 31 + c) % $p) % $modulus AS id
       |   FROM u)
       |SELECT id, count(*) AS n_urls, min(url) AS first_url
       |FROM h GROUP BY id HAVING count(*) > 1""".stripMargin
  }

  /** O(log n) doubled-graph 2-coloring (operators/Components
    * .twoColoringContract): vertex v splits into parity nodes (v,0)/(v,1),
    * every undirected edge connects opposite parities, selfloops connect
    * (v,0)-(v,1) directly; comp labels propagate by the same recursive
    * min-CTE as connected components, encoding (cv,cp) as cv*2+cp (ids are
    * nonnegative TPC-H keys, so the encoding preserves the struct
    * lexicographic order the Spark side uses). color = 0/1 by which parity
    * class holds the smaller label; -1 when both parities share a component
    * (odd cycle — no proper 2-coloring). */
  def twoColoringContract(): String =
    s"""WITH RECURSIVE
       | e AS (SELECT DISTINCT src, dst FROM (
       |   SELECT l_partkey AS src, l_suppkey AS dst FROM lineitem
       |   UNION ALL SELECT 10000000 + i, 10000001 + i FROM range(0, 9) t(i))),
       | und AS (SELECT src, dst FROM e WHERE src <> dst
       |         UNION SELECT dst, src FROM e WHERE src <> dst),
       | sl AS (SELECT DISTINCT src AS v FROM e WHERE src = dst),
       | v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       | de AS (SELECT src, 0 AS sp, dst, 1 AS dp FROM und
       |        UNION ALL SELECT src, 1, dst, 0 FROM und
       |        UNION ALL SELECT v, 0, v, 1 FROM sl
       |        UNION ALL SELECT v, 1, v, 0 FROM sl),
       | r(nv, np, label) AS (
       |   SELECT id, pp, id * 2 + pp FROM v CROSS JOIN (VALUES (0), (1)) t(pp)
       |   UNION
       |   SELECT de.dst, de.dp, r.label FROM r JOIN de ON r.nv = de.src AND r.np = de.sp),
       | cmp AS (SELECT nv, np, min(label) AS c FROM r GROUP BY nv, np),
       | ce AS (SELECT nv AS id, c FROM cmp WHERE np = 0),
       | co AS (SELECT nv AS id, c AS c2 FROM cmp WHERE np = 1)
       |SELECT ce.id AS id,
       |  CAST(CASE WHEN c = c2 THEN -1 WHEN c < c2 THEN 0 ELSE 1 END AS INT) AS color
       |FROM ce JOIN co ON ce.id = co.id""".stripMargin

  /** findPartitions 2-coloring (operators/Components.twoColoring): color =
    * parity of the shortest undirected distance from the component's
    * minimum-id vertex. Components via the recursive min-propagation CTE;
    * distances via a bounded BFS recursion (dedup on (id, dist) rows). */
  def twoColoring(maxDist: Int = 100): String =
    s"""WITH RECURSIVE
       | e AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       | v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
       | und AS (SELECT src, dst FROM e WHERE src <> dst
       |         UNION SELECT dst, src FROM e WHERE src <> dst),
       | r(id, comp) AS (
       |   SELECT id, id FROM v
       |   UNION
       |   SELECT u.dst, r.comp FROM r JOIN und u ON r.id = u.src),
       | c AS (SELECT id, min(comp) AS comp FROM r GROUP BY id),
       | roots AS (SELECT DISTINCT comp AS id FROM c),
       | b(id, dist) AS (
       |   SELECT id, 0 FROM roots
       |   UNION
       |   SELECT u.dst, b.dist + 1 FROM b JOIN und u ON b.id = u.src WHERE b.dist < $maxDist),
       | d AS (SELECT id, min(dist) AS dist FROM b GROUP BY id)
       |SELECT id, CAST(dist % 2 AS INT) AS color FROM d""".stripMargin

  /** Shared CTEs of the SCC fixture (operators/Scc): the directed
    * consecutive-linenumber part graph (every `mod`-th order contributes
    * edges partkey(line i) -> partkey(line i+1)), its transitive closure,
    * and scc(v) = min{u : u ⇝ v ∧ v ⇝ u} ∪ {v}. NOTE: inside a DuckDB
    * `WITH RECURSIVE` block a non-recursive CTE whose body is a top-level
    * UNION silently gets UNION ALL semantics (observed on 1.0.0) — hence
    * the explicit SELECT DISTINCT wrapper on `v`. */
  private def sccCtes(mod: Int): String =
    s"""e2 AS MATERIALIZED (
       |   SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |   FROM lineitem a JOIN lineitem b
       |     ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
       |   WHERE a.l_orderkey % $mod = 0 AND a.l_partkey <> b.l_partkey),
       | v AS MATERIALIZED (SELECT DISTINCT id FROM
       |   (SELECT src AS id FROM e2 UNION ALL SELECT dst FROM e2)),
       | r(a, b) AS (SELECT src, dst FROM e2
       |             UNION
       |             SELECT r.a, e2.dst FROM r JOIN e2 ON r.b = e2.src),
       | m AS MATERIALIZED (SELECT r1.b AS id, min(r1.a) AS mm
       |      FROM r r1 JOIN r r2 ON r1.a = r2.b AND r1.b = r2.a
       |      WHERE r1.a < r1.b GROUP BY 1),
       | sccs AS MATERIALIZED (SELECT v.id AS id, least(v.id, coalesce(m.mm, v.id)) AS scc
       |      FROM v LEFT JOIN m USING (id))""".stripMargin

  /** Strongly connected components (operators/Scc.scc) via the closure. */
  def scc(mod: Int): String =
    s"""WITH RECURSIVE
       | ${sccCtes(mod)}
       |SELECT id, scc FROM sccs""".stripMargin

  /** Bow-tie decomposition (operators/Scc.bowtie): CORE = largest SCC
    * (ties to min scc id); IN reaches the core rep, OUT is reached from it
    * (rep membership makes either equivalent to reaching the whole core). */
  def bowtie(mod: Int): String =
    s"""WITH RECURSIVE
       | ${sccCtes(mod)},
       | core AS MATERIALIZED (SELECT scc AS s FROM
       |   (SELECT scc, count(*) AS n FROM sccs GROUP BY 1) ORDER BY n DESC, scc ASC LIMIT 1),
       | inr AS MATERIALIZED (SELECT DISTINCT r.a AS id FROM r WHERE r.b = (SELECT s FROM core)),
       | outr AS MATERIALIZED (SELECT DISTINCT r.b AS id FROM r WHERE r.a = (SELECT s FROM core))
       |SELECT sccs.id AS id,
       |  CASE WHEN sccs.scc = (SELECT s FROM core) THEN 'CORE'
       |       WHEN inr.id IS NOT NULL THEN 'IN'
       |       WHEN outr.id IS NOT NULL THEN 'OUT'
       |       ELSE 'OTHER' END AS region
       |FROM sccs LEFT JOIN inr ON sccs.id = inr.id LEFT JOIN outr ON sccs.id = outr.id""".stripMargin
}
