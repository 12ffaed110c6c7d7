package graft.ops

/** Tractable DuckDB oracle variants for the staged scale points (sf1+).
  *
  * The graded (sf0.01) oracles for the near-dup family are deliberately
  * quadratic all-pairs ground truths — the strongest possible independent
  * check, but intractable past ~60k docs (1.8e11 candidate pairs at sf1).
  * These builders emit EXACT equivalents whose only change is the pair
  * enumeration algorithm:
  *
  *  - `ppjoinPairs`: prefix-filtered inverted-list join (the SSJoin/PPJoin
  *    family, Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08 — the same
  *    filters the engine's q_setsim_join uses). For Jaccard >= t with a
  *    global token order, any qualifying pair must share a token among
  *    each side's first `n - ceil(t·n) + 1` rarest tokens and satisfy the
  *    length bound `t·max(|a|,|b|) <= min(|a|,|b|)` — so candidates from
  *    the prefix join provably cover ALL qualifying pairs, and the exact
  *    Jaccard confirm (same float expression as the graded oracle)
  *    reproduces the all-pairs answer bit-for-bit. All threshold
  *    arithmetic is integer (`ceil(t·n)` as `(num·n + den - 1) // den`):
  *    a float `ceil(0.8*n)` would round up through binary representation
  *    error (0.8·5 → 4.0000000000000002 → 5) and silently shrink the
  *    lossless prefix.
  *
  *  - block-band replay (q_image_neardup): hamming(a,b) <= 3 over 64-bit
  *    fingerprints implies at least one of the four 16-bit blocks is
  *    identical (pigeonhole), so an equi-join on block values is a
  *    lossless candidate generator — the standard simhash banding
  *    argument, here used oracle-side.
  *
  *  - native cosine (q_dedup_embed_groundtruth): the same all-pairs scan,
  *    but through DuckDB's vectorized `list_cosine_similarity` instead of
  *    per-element SQL lambdas (15 s vs hours at 20k×64).
  *
  * Measured at sf1 (600k docs / 20k vectors, this machine): word-shingle
  * ppjoin 101 s, raw-documents ppjoin 80 s, image block-band 93 s,
  * native cosine 16 s.
  */
object ScaleOracles {

  /** CTE chain turning a preceding CTE `sh(doc_id, g)` (distinct gram
    * list per doc) into `p(id_a, id_b, jaccard)` = ALL pairs with
    * jaccard >= num/den, via the lossless prefix filter. Emits CTEs
    * named tok/df/rk/pref/cand/p — compose after `sh` with a trailing
    * comma. `where` optionally restricts the candidate pair (e.g. the
    * delta join's `a` side filter) — it must only REMOVE pairs that the
    * consumer does not want, not affect losslessness. */
  def ppjoinPairCtes(num: Int, den: Int, where: String = "true"): String =
    s"""tok AS (SELECT doc_id, len(g) AS n, unnest(g) AS gram FROM sh WHERE len(g) > 0),
       |df AS (SELECT gram, count(*) AS df FROM tok GROUP BY 1),
       |rk AS (SELECT doc_id, n, gram,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY df, gram) AS r
       |  FROM tok JOIN df USING (gram)),
       |pref AS (SELECT doc_id, n, gram FROM rk
       |  WHERE r <= n - (($num*n + ${den - 1}) // $den) + 1),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM pref a JOIN pref b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  WHERE a.n * $den >= b.n * $num AND b.n * $den >= a.n * $num
       |    AND ($where)),
       |p AS (SELECT id_a, id_b,
       |    CAST(len(list_intersect(sa.g, sb.g)) AS DOUBLE)
       |      / (len(sa.g) + len(sb.g) - len(list_intersect(sa.g, sb.g))) AS jaccard
       |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
       |  WHERE CAST(len(list_intersect(sa.g, sb.g)) AS DOUBLE)
       |      / (len(sa.g) + len(sb.g) - len(list_intersect(sa.g, sb.g)))
       |      >= CAST($num AS DOUBLE) / $den)""".stripMargin

  /** The word-3-shingle `sh` CTE over a docs relation (same expression as
    * the graded oracles' shingle CTE). */
  def wordShingleCte(docsRel: String): String =
    raw"""sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 2, 0)),
       |    i -> array_to_string((regexp_split_to_array(trim(text), '\s+'))[i:i+2], ' '))) AS g
       |  FROM $docsRel)""".stripMargin

  /** Rewrite every top-level `name AS (` CTE header to
    * `name AS MATERIALIZED (`. DuckDB inlines CTEs by default, so an
    * iterative oracle that references a stage twice per level (the
    * k-core peel's `s IN (k1) AND d IN (k1)`, PCA's power-iteration
    * chain) re-evaluates the whole upstream chain exponentially —
    * measured at sf1: q_kcore blew a 70 GB spill, q_pca_project took
    * 764 s; materialized, 10 s and 3.8 s with identical results. The
    * graded oracle stays untouched (at sf0.01 inlining is harmless and
    * the graded SQL should stay vanilla ANSI). */
  def materializeCtes(sql: String): String =
    sql.replaceAll("(?<=[\\n(,]|WITH )(\\s*)([A-Za-z_][A-Za-z0-9_]*) AS \\(",
      "$1$2 AS MATERIALIZED (")
}
