package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}
import graft.similarity.Ann

/** Similarity-search inventory over the `embeddings` fixture: exact
  * brute-force top-k cosine (oracle-verified to the last bit via explicit
  * double-fold SQL) and the LSH/IVF scale paths in their
  * engine-independent forms (stride-drawn planes/centroids) — every
  * query oracle-hash-gated; recall floors additionally asserted in
  * SimilaritySpec.
  */
object SimilarityQueries extends QueryModule {

  /** DuckDB mirror of the exact-arithmetic k-means fit (q103,
    * [[graft.similarity.KMeans]]): stride-drawn init, argmax-cosine
    * assignment with the kernel's (sim DESC, cell DESC) tie order,
    * integer-micro means (`floor(x·10⁶ + 0.5)` longs — exact sums, one
    * division, one float round-trip), empty cells carrying forward. The
    * iteration structure is generated, one assign/mean CTE pair per Lloyd
    * step, so engine `iters` and oracle depth cannot drift apart.
    */
  private def kmeansOracleSql(iters: Int): String = {
    def selfDot(v: String) =
      s"list_reduce(list_transform($v, x -> x::double * x::double), (x, y) -> x + y)"
    def dot(a: String, b: String) =
      s"""list_reduce(list_transform(range(1, len($a) + 1),
         |        i -> $a[i]::double * $b[i]::double), (x, y) -> x + y)""".stripMargin
    def simExpr = // vector b against centroid c (norms re-derived from floats)
      s"""(${dot("b.embedding", "c.cvec")}
         |       / (sqrt(b.n2) * sqrt(${selfDot("c.cvec")})))""".stripMargin
    def assignCte(name: String, ct: String) =
      s"""$name AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT b.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
         |        $simExpr DESC, c.cell DESC) AS arn
         |    FROM base b CROSS JOIN $ct c
         |  ) WHERE arn = 1
         |)""".stripMargin
    def meanCtes(k: Int, prev: String) =
      s"""px$k AS (
         |  SELECT a$k.cell, b.embedding, unnest(range(1, len(b.embedding) + 1)) AS i
         |  FROM a$k JOIN base b USING (vec_id)
         |), q$k AS (
         |  SELECT cell, i - 1 AS dim,
         |    cast(floor(embedding[i]::double * 1e6 + 0.5) AS bigint) AS q
         |  FROM px$k
         |), m$k AS (
         |  SELECT cell, dim,
         |    cast(cast(sum(q) AS double) / cast(count(*) AS double) / 1e6 AS float) AS m
         |  FROM q$k GROUP BY cell, dim
         |), cv$k AS (
         |  SELECT cell, list(m ORDER BY dim) AS cvec FROM m$k GROUP BY cell
         |), c$k AS (
         |  SELECT $prev.cell, coalesce(cv$k.cvec, $prev.cvec) AS cvec
         |  FROM $prev LEFT JOIN cv$k ON $prev.cell = cv$k.cell
         |)""".stripMargin
    val steps = (1 to iters).map { k =>
      assignCte(s"a$k", s"c${k - 1}") + ", " + meanCtes(k, s"c${k - 1}")
    }.mkString(", ")
    s"""WITH n AS (SELECT count(*) AS cnt FROM embeddings),
       |s AS (
       |  SELECT greatest(1, cast(floor(cnt / ceil(sqrt(cnt))) AS bigint)) AS stride
       |  FROM n
       |), c0 AS (
       |  SELECT cast(row_number() OVER (ORDER BY vec_id) AS int) AS cell,
       |    embedding AS cvec
       |  FROM embeddings WHERE vec_id % (SELECT stride FROM s) = 0
       |), base AS (
       |  SELECT vec_id, embedding, ${selfDot("embedding")} AS n2
       |  FROM embeddings
       |), $steps, fin AS (
       |  SELECT b.vec_id, c.cell, $simExpr AS sim,
       |    row_number() OVER (PARTITION BY b.vec_id ORDER BY
       |      $simExpr DESC, c.cell DESC) AS arn
       |  FROM base b CROSS JOIN c$iters c
       |)
       |SELECT vec_id, cell, sim, count(*) OVER (PARTITION BY cell) AS csize
       |FROM fin WHERE arn = 1
       |ORDER BY vec_id""".stripMargin
  }

  def queries: Map[String, QueryDef] = quantizedQueries ++ Map(

    // Exact-arithmetic distributed k-means (Lloyd over the stride init,
    // integer-micro means) — ORACLE-HASH-GATED end to end: the oracle
    // re-runs both Lloyd iterations and the final assignment, so a hash
    // PASS proves the kernel assignment (incl. tie order), the
    // order-independent exact means, AND the empty-cell carry-forward.
    "q103_kmeans" -> QueryDef(
      (s, dir) =>
        graft.similarity.KMeans.kmeans(Tables.embeddings(s, dir), iters = 2)
          .orderBy("vec_id"),
      Some(kmeansOracleSql(2))),

    // Exact ANN baseline: every 10th vector queries the full corpus.
    "q40_cosine_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Ann.bruteForceTopK(emb, emb.filter(col("vec_id") % 10 === 0), k = 5)
          .orderBy("qid", "rn")
      },
      Some("""WITH base AS (
             |  SELECT vec_id, embedding,
             |    list_reduce(list_transform(embedding, x -> x::double * x::double), (x, y) -> x + y) AS n2
             |  FROM embeddings
             |), q AS (
             |  SELECT vec_id AS qid, embedding AS qe, n2 AS qn2 FROM base WHERE vec_id % 10 = 0
             |), pairs AS (
             |  SELECT qid, vec_id AS nid,
             |    list_reduce(list_transform(range(1, len(qe) + 1),
             |        i -> qe[i]::double * embedding[i]::double), (x, y) -> x + y)
             |      / (sqrt(qn2) * sqrt(n2)) AS sim
             |  FROM base, q WHERE vec_id <> qid
             |), ranked AS (
             |  SELECT qid, nid, sim,
             |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
             |  FROM pairs
             |)
             |SELECT qid, nid, sim, rn FROM ranked WHERE rn <= 5
             |ORDER BY qid, rn""".stripMargin)),

    // Scale path: banded hyperplane LSH (occupancy-targeted table keys,
    // exact cosine re-rank), in the ENGINE-INDEPENDENT form: plane normals
    // are stride-drawn corpus vectors and the occupancy rule is integer
    // arithmetic (Ann.lshTopKDataPlanes), so the full approximate pipeline
    // — sign bits, packed bucket ids, candidate join, exact re-rank — is
    // reproduced in DuckDB and ORACLE-HASH-GATED. SimilaritySpec measures
    // recall vs q40 for both this and the splitmix-seeded lshTopK (which
    // remains the library path for corpora without a usable id column).
    "q41_cosine_lsh" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Ann.lshTopKDataPlanes(emb, emb.filter(col("vec_id") % 10 === 0), k = 5)
          .orderBy("qid", "rn")
      },
      Some("""WITH n AS (SELECT count(*) AS cnt FROM embeddings),
             |b AS (
             |  SELECT coalesce(min(x), 24) AS bits FROM range(2, 25) t(x), n
             |  WHERE (1::BIGINT << x) * 64 >= cnt
             |), np AS (SELECT 5 * bits AS np FROM b),
             |st AS (SELECT greatest(1, cnt // np) AS stride FROM n, np),
             |pl AS (
             |  SELECT pid, pvec FROM (
             |    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS pid,
             |      embedding AS pvec
             |    FROM embeddings WHERE vec_id % (SELECT stride FROM st) = 0
             |  ), np WHERE pid < np.np
             |), keysv AS (
             |  SELECT v.vec_id,
             |    (p.pid // b.bits) * (1::BIGINT << b.bits) +
             |      sum(CASE WHEN list_reduce(list_transform(range(1, len(v.embedding) + 1),
             |            i -> v.embedding[i]::double * p.pvec[i]::double), (x, y) -> x + y) >= 0
             |          THEN (1::BIGINT << cast(p.pid % b.bits AS int)) ELSE 0 END) AS bkt
             |  FROM embeddings v CROSS JOIN pl p CROSS JOIN b
             |  GROUP BY v.vec_id, p.pid // b.bits, b.bits
             |), cand AS (
             |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
             |  FROM keysv q JOIN keysv c ON q.bkt = c.bkt AND c.vec_id <> q.vec_id
             |  WHERE q.vec_id % 10 = 0
             |), base AS (
             |  SELECT vec_id, embedding,
             |    list_reduce(list_transform(embedding, x -> x::double * x::double), (x, y) -> x + y) AS n2
             |  FROM embeddings
             |), scored AS (
             |  SELECT cand.qid, cand.nid,
             |    list_reduce(list_transform(range(1, len(q.embedding) + 1),
             |        i -> q.embedding[i]::double * c.embedding[i]::double), (x, y) -> x + y)
             |      / (sqrt(q.n2) * sqrt(c.n2)) AS sim
             |  FROM cand
             |  JOIN base q ON cand.qid = q.vec_id
             |  JOIN base c ON cand.nid = c.vec_id
             |), ranked AS (
             |  SELECT qid, nid, sim,
             |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
             |  FROM scored
             |)
             |SELECT qid, nid, sim, rn FROM ranked WHERE rn <= 5
             |ORDER BY qid, rn""".stripMargin)),

    // Second scale path: inverted-file index (data-aware cells, one cell
    // per corpus vector, nProbe cells per query). Centroids are drawn by
    // the ENGINE-INDEPENDENT stride rule (every stride-th vec_id, ~√n
    // cells — q102's pattern), which makes the whole persisted pipeline —
    // assignment argmax incl. its higher-cell tie-break, probe ranking,
    // final top-k — reproducible in DuckDB and therefore ORACLE-HASH-GATED:
    // a hash PASS proves the write→load→bucketed-search round trip returns
    // exactly what a from-scratch in-memory build would (the oracle IS the
    // batch build — the same SQL gates q102's incremental-add path, so the
    // two queries also prove each other equal). refineIters=0 equivalent:
    // Lloyd is measured flat on this uniform fixture (Ann scaladoc). The
    // index is built ONCE per corpus and persisted as a cell-bucketed
    // table (the 100 TB contract: the O(n·√n) assignment is an indexing
    // cost, not a query cost); repeat query batches — and the second bench
    // pass — only pay the probe join. The table name carries a corpus
    // fingerprint (path + file sizes + mtimes) so a regenerated fixture
    // rebuilds the index.
    "q66_cosine_ivf" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val name = s"graft_ivfs_${Tables.fingerprint(s, s"$dir/embeddings.parquet")}"
        if (!s.catalog.tableExists(s"${name}_assigned"))
          Ann.writeIvfIndex(
            Ann.indexWithCentroids(emb, Ann.strideCentroids(emb)), name)
        Ann.searchIvf(Ann.loadIvfIndex(s, name),
            emb.filter(col("vec_id") % 10 === 0), k = 5)
          .orderBy("qid", "rn")
      },
      Some(ivfBatchOracleSql)),

    // Incremental index add: build the IVF index on the even-id half of
    // the corpus, add the odd-id half against the FROZEN centroids (batch
    // cost only — no retrain), then search. Centroids are drawn by an
    // ENGINE-INDEPENDENT rule (every stride-th vec_id, stride ≈ n/√n, so
    // ~√n cells at any corpus size), which makes the whole incremental
    // pipeline — assignment argmax incl. its higher-cell tie-break, probe
    // ranking, final top-k — reproducible in DuckDB: the oracle computes
    // the equivalent BATCH build over even∪odd, so a hash PASS proves the
    // add-against-frozen-centroids path ≡ indexing everything at once
    // (the assignment invariant). Exact double left-fold cosine on both
    // sides, q40-style.
    "q102_ivf_add" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val base = Ann.indexWithCentroids(
          emb.filter(col("vec_id") % 2 === 0), Ann.strideCentroids(emb))
        val idx = Ann.addToIvfIndex(base, emb.filter(col("vec_id") % 2 === 1))
        Ann.searchIvf(idx, emb.filter(col("vec_id") % 10 === 0), k = 5)
          .orderBy("qid", "rn")
      },
      Some(ivfBatchOracleSql)))

  /** The engine-independent IVF pipeline, spelled out in DuckDB SQL:
    * stride-drawn centroids (~√n cells), full-corpus argmax assignment
    * (higher-cell tie-break), nProbe=4 probe ranking (lower-cell
    * tie-break), exact left-fold double cosine, k=5. Shared by q66
    * (persisted-index search ≡ batch build) and q102 (incremental add ≡
    * batch build): one oracle, two engine paths — a pass on both proves
    * them equal to the oracle AND to each other.
    */
  private val ivfBatchOracleSql: String =
    """WITH n AS (SELECT count(*) AS cnt FROM embeddings),
             |s AS (
             |  SELECT greatest(1, cast(floor(cnt / ceil(sqrt(cnt))) AS bigint)) AS stride
             |  FROM n
             |), cent AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) AS cell,
             |    embedding AS cvec,
             |    list_reduce(list_transform(embedding, x -> x::double * x::double), (x, y) -> x + y) AS cvn2
             |  FROM embeddings WHERE vec_id % (SELECT stride FROM s) = 0
             |), base AS (
             |  SELECT vec_id, embedding,
             |    list_reduce(list_transform(embedding, x -> x::double * x::double), (x, y) -> x + y) AS n2
             |  FROM embeddings
             |), asg AS (
             |  SELECT vec_id AS nid, embedding AS ce, n2 AS cn2, cell FROM (
             |    SELECT b.vec_id, b.embedding, b.n2, c.cell,
             |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
             |        (list_reduce(list_transform(range(1, len(b.embedding) + 1),
             |            i -> b.embedding[i]::double * c.cvec[i]::double), (x, y) -> x + y)
             |         / (sqrt(b.n2) * sqrt(c.cvn2))) DESC, c.cell DESC) AS arn
             |    FROM base b CROSS JOIN cent c
             |  ) WHERE arn = 1
             |), q AS (
             |  SELECT vec_id AS qid, embedding AS qe, n2 AS qn2
             |  FROM base WHERE vec_id % 10 = 0
             |), probes AS (
             |  SELECT qid, qe, qn2, cell FROM (
             |    SELECT q.qid, q.qe, q.qn2, c.cell,
             |      row_number() OVER (PARTITION BY q.qid ORDER BY
             |        (list_reduce(list_transform(range(1, len(q.qe) + 1),
             |            i -> q.qe[i]::double * c.cvec[i]::double), (x, y) -> x + y)
             |         / (sqrt(q.qn2) * sqrt(c.cvn2))) DESC, c.cell ASC) AS pr
             |    FROM q CROSS JOIN cent c
             |  ) WHERE pr <= 4
             |), pairs AS (
             |  SELECT p.qid, a.nid,
             |    (list_reduce(list_transform(range(1, len(p.qe) + 1),
             |        i -> p.qe[i]::double * a.ce[i]::double), (x, y) -> x + y)
             |     / (sqrt(p.qn2) * sqrt(a.cn2))) AS sim
             |  FROM probes p JOIN asg a ON p.cell = a.cell AND a.nid <> p.qid
             |), ranked AS (
             |  SELECT qid, nid, sim,
             |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
             |  FROM pairs
             |)
             |SELECT qid, nid, sim, rn FROM ranked WHERE rn <= 5
             |ORDER BY qid, rn""".stripMargin

  private val quantizedQueries: Map[String, QueryDef] = Map(
    // Int8-quantized brute-force top-k — q40 at a quarter of the memory
    // traffic. Symmetric per-vector scales cancel in cosine, so scoring is
    // exact int64 dot products (native codegen loop) over 1-byte
    // dimensions; the integer math is bit-reproducible in DuckDB, which is
    // why this APPROXIMATE operator still carries a full hash-gated
    // oracle (the approximation is in the quantization, not the engine).
    "q78_quantized_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.similarity.Quantization
          .quantizedTopK(emb, emb.filter(col("vec_id") % 10 === 0), k = 5)
          .orderBy("qid", "rn")
      },
      Some("""WITH s AS (
             |  SELECT vec_id, embedding,
             |    list_max(list_transform(embedding, y -> abs(y::double)))
             |      / cast(127 AS double) AS scale
             |  FROM embeddings
             |), qz AS (
             |  SELECT vec_id,
             |    CASE WHEN scale > 0
             |      THEN list_transform(embedding, x -> cast(round(x::double / scale) AS tinyint))
             |      ELSE list_transform(embedding, x -> cast(0 AS tinyint)) END AS q
             |  FROM s
             |), base AS (
             |  SELECT vec_id, q,
             |    list_reduce(list_transform(q, x -> x::bigint * x::bigint), (x, y) -> x + y) AS qn2
             |  FROM qz
             |), qset AS (
             |  SELECT vec_id AS qid, q AS qe, qn2 AS qqn2 FROM base WHERE vec_id % 10 = 0
             |), pairs AS (
             |  SELECT qid, vec_id AS nid,
             |    cast(list_reduce(list_transform(range(1, len(qe) + 1),
             |        i -> qe[i]::bigint * q[i]::bigint), (x, y) -> x + y) AS double)
             |      / (sqrt(cast(qqn2 AS double)) * sqrt(cast(qn2 AS double))) AS sim
             |  FROM base, qset WHERE vec_id <> qid
             |), ranked AS (
             |  SELECT qid, nid, sim,
             |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
             |  FROM pairs
             |)
             |SELECT qid, nid, sim, rn FROM ranked WHERE rn <= 5
             |ORDER BY qid, rn""".stripMargin)))
}
