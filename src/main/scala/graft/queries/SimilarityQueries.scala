package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.similarity.SimilarityOps
import graft.queries.SqlGen._

/** Oracle-verified similarity-search queries over the embeddings table
  * (Array[Float] × 64). Dot products are fixed 64-term chains → identical
  * doubles in Spark and DuckDB, so even the ranking needs no tolerance. */
object SimilarityQueries {

  private val Dim = 64

  private def emb(s: SparkSession, d: String) = Tables.load(s, d, "embeddings")

  /** SQL fragment: left-assoc 64-term dot product of e1/e2 list columns. */
  private def sqlDot(a: String, b: String): String =
    (1 to Dim).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")
  private def sqlNorm(a: String): String =
    "SQRT(" + (1 to Dim).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($a[$i] AS DOUBLE)")
      .mkString("(", " + ", ")") + ")"
  private def sqlCos(a: String, b: String): String =
    s"${sqlDot(a, b)} / (${sqlNorm(a)} * ${sqlNorm(b)})"

  /** Shared WITH-body prefix: LSH-bucketed cosine kNN graph over
    * `embeddings WHERE vec_id < limitId`, symmetrized distinct edges in
    * `sym(u, v)` — the oracle twin of Community.knnGraphLSH (used by
    * both ml_lpa_communities and ml_louvain_lpa). */
  def lshSymGraphPrefix(limitId: Int, k: Int, nPlanes: Int): String = {
    val bucket = (0 until nPlanes).map { j =>
      val proj = (1 to Dim).map { i =>
        s"CAST(embedding[$i] AS DOUBLE) * ${SimilarityOps.planeComponent(j, i)}"
      }.mkString("(", " + ", ")")
      s"CASE WHEN $proj > 0 THEN ${math.pow(2, j).toLong} ELSE 0 END"
    }.mkString(" + ")
    s"""b AS MATERIALIZED (
       |  SELECT vec_id, embedding, ($bucket) AS bucket
       |  FROM embeddings WHERE vec_id < $limitId),
       |knn AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC,
       |                 c.vec_id ASC) AS rank
       |    FROM b q JOIN b c ON q.bucket = c.bucket
       |      AND q.vec_id <> c.vec_id)
       |  WHERE rank <= $k),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(query_id, neighbor_id) AS u0,
       |    GREATEST(query_id, neighbor_id) AS v0 FROM knn),
       |sym AS MATERIALIZED (
       |  SELECT u0 AS u, v0 AS v FROM edges
       |  UNION
       |  SELECT v0 AS u, u0 AS v FROM edges)""".stripMargin
  }

  /** DuckDB twin of SimilarityOps.semanticDedup: the coarse-quantizer
    * trajectory unrolled round by round (seeds = nlist smallest ids →
    * window-argmax cosine assignment, ties by list_id → per-dimension
    * sqlMean update), final assignment with ROUND(cos, 6) to centroid,
    * within-cluster duplicate pairs at `eps`, recursive-CTE connected
    * components (label = min id), and the keep-least-central window. */
  private def semanticDedupSql(nlist: Int, eps: Double, lloyd: Int): String = {
    def dims(src: String) = (1 to Dim).map(i =>
      s"CAST($src[$i] AS DOUBLE) AS d$i").mkString(",\n    ")
    // cosine(vector, centroid columns of alias c) — ascending chains
    def cosC(e: String): String = {
      val dot = (1 to Dim).map(i =>
        s"CAST($e[$i] AS DOUBLE) * c.d$i").mkString("(", " + ", ")")
      val cn = "SQRT(" + (1 to Dim).map(i => s"c.d$i * c.d$i")
        .mkString("(", " + ", ")") + ")"
      s"$dot / (${sqlNorm(e)} * $cn)"
    }
    def assignCte(name: String, from: String, extraInner: String,
                  extraOuter: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, embedding, list_id$extraOuter FROM (
         |    SELECT e.vec_id, e.embedding, c.list_id$extraInner,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosC("e.embedding")} DESC, c.list_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN $from c) WHERE rn = 1)"""
        .stripMargin
    val rounds = (1 to lloyd).map { r =>
      val means = (1 to Dim).map(i =>
        s"${SqlGen.sqlMean(s"CAST(embedding[$i] AS DOUBLE)")} AS d$i")
        .mkString(",\n    ")
      s"""${assignCte(s"a$r", s"c${r - 1}", "", "")},
         |c$r AS MATERIALIZED (
         |  SELECT list_id, $means FROM a$r GROUP BY list_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE
       |seeds AS (SELECT vec_id, embedding FROM embeddings
       |          ORDER BY vec_id LIMIT $nlist),
       |c0 AS MATERIALIZED (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS list_id,
       |    ${dims("embedding")}
       |  FROM seeds),
       |$rounds,
       |${assignCte("af0", s"c$lloyd",
            s", ROUND(${cosC("e.embedding")}, 6) AS cent_sim",
            ", cent_sim")},
       |p AS MATERIALIZED (
       |  SELECT x.vec_id AS id1, y.vec_id AS id2
       |  FROM af0 x JOIN af0 y
       |    ON x.list_id = y.list_id AND x.vec_id < y.vec_id
       |  WHERE ${sqlCos("x.embedding", "y.embedding")} >= $eps),
       |edges AS (SELECT id1 AS u, id2 AS v FROM p
       |          UNION SELECT id2, id1 FROM p),
       |reach(node, label) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node),
       |grp AS (SELECT node, MIN(label) AS group_id FROM reach GROUP BY node)
       |SELECT af0.vec_id, af0.list_id, af0.cent_sim, grp.group_id,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY grp.group_id
       |      ORDER BY af0.cent_sim ASC, af0.vec_id ASC) = 1
       |    THEN 1 ELSE 0 END AS INT) AS keep
       |FROM af0 JOIN grp ON grp.node = af0.vec_id
       |ORDER BY af0.vec_id""".stripMargin
  }

  /** DuckDB twin of the TWO-LEVEL (IMI-style) quantizer path of
    * SimilarityOps.semanticDedup (ntop forced): tops = the `ntop`
    * smallest-seed centroids, FIXED across rounds; per round the
    * children route to their nearest top (cos desc, top_id asc), each
    * row routes to its nearest SURVIVING top and then argmaxes only
    * within that cell's children (cos desc, list_id asc — exactly the
    * ChildArgTop contract), and the per-dimension exact means update
    * the children. Pairs / components / keep replay as in the flat
    * twin. */
  private def semanticDedupHierSql(nlist: Int, ntop: Int, eps: Double,
                                   lloyd: Int): String = {
    def dims(src: String) = (1 to Dim).map(i =>
      s"CAST($src[$i] AS DOUBLE) AS d$i").mkString(",\n    ")
    def cNorm(a: String) = "SQRT(" + (1 to Dim).map(i => s"$a.d$i * $a.d$i")
      .mkString("(", " + ", ")") + ")"
    def cosCC(a: String, b: String) = {
      val dot = (1 to Dim).map(i => s"$a.d$i * $b.d$i")
        .mkString("(", " + ", ")")
      s"$dot / (${cNorm(a)} * ${cNorm(b)})"
    }
    def cosEC(e: String, c: String) = {
      val dot = (1 to Dim).map(i => s"CAST($e[$i] AS DOUBLE) * $c.d$i")
        .mkString("(", " + ", ")")
      s"$dot / (${sqlNorm(e)} * ${cNorm(c)})"
    }
    // one two-stage assignment block over children table `prev`:
    // ct$tag child→top, rt$tag row→surviving top, a$tag row→best child
    def stage(tag: String, prev: String, simSel: String,
              simOuter: String) =
      s"""ct$tag AS MATERIALIZED (
         |  SELECT list_id, top_id FROM (
         |    SELECT ch.list_id, tt.top_id,
         |      ROW_NUMBER() OVER (PARTITION BY ch.list_id
         |        ORDER BY ${cosCC("ch", "tt")} DESC, tt.top_id ASC) AS rn
         |    FROM $prev ch CROSS JOIN t tt) WHERE rn = 1),
         |rt$tag AS MATERIALIZED (
         |  SELECT vec_id, embedding, top_id FROM (
         |    SELECT e.vec_id, e.embedding, tt.top_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosEC("e.embedding", "tt")} DESC, tt.top_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN (SELECT * FROM t
         |      WHERE top_id IN (SELECT DISTINCT top_id FROM ct$tag)) tt)
         |  WHERE rn = 1),
         |a$tag AS MATERIALIZED (
         |  SELECT vec_id, embedding, list_id$simOuter FROM (
         |    SELECT r0.vec_id, r0.embedding, ch.list_id$simSel,
         |      ROW_NUMBER() OVER (PARTITION BY r0.vec_id
         |        ORDER BY ${cosEC("r0.embedding", "ch")} DESC, ch.list_id ASC) AS rn
         |    FROM rt$tag r0 JOIN ct$tag m ON m.top_id = r0.top_id
         |    JOIN $prev ch ON ch.list_id = m.list_id) WHERE rn = 1)""".stripMargin
    val rounds = (1 to lloyd).map { r =>
      val means = (1 to Dim).map(i =>
        s"${SqlGen.sqlMean(s"CAST(embedding[$i] AS DOUBLE)")} AS d$i")
        .mkString(",\n    ")
      s"""${stage(r.toString, s"c${r - 1}", "", "")},
         |c$r AS MATERIALIZED (
         |  SELECT list_id, $means FROM a$r GROUP BY list_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE
       |seeds AS (SELECT vec_id, embedding FROM embeddings
       |          ORDER BY vec_id LIMIT $nlist),
       |c0 AS MATERIALIZED (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS list_id,
       |    ${dims("embedding")}
       |  FROM seeds),
       |t AS MATERIALIZED (
       |  SELECT list_id AS top_id, ${(1 to Dim).map(i => s"d$i").mkString(", ")}
       |  FROM c0 WHERE list_id < $ntop),
       |$rounds,
       |${stage("F", s"c$lloyd",
            s",\n      ROUND(${cosEC("r0.embedding", "ch")}, 6) AS cent_sim",
            ", cent_sim")},
       |p AS MATERIALIZED (
       |  SELECT x.vec_id AS id1, y.vec_id AS id2
       |  FROM aF x JOIN aF y
       |    ON x.list_id = y.list_id AND x.vec_id < y.vec_id
       |  WHERE ${sqlCos("x.embedding", "y.embedding")} >= $eps),
       |edges AS (SELECT id1 AS u, id2 AS v FROM p
       |          UNION SELECT id2, id1 FROM p),
       |reach(node, label) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node),
       |grp AS (SELECT node, MIN(label) AS group_id FROM reach GROUP BY node)
       |SELECT aF.vec_id, aF.list_id, aF.cent_sim, grp.group_id,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY grp.group_id
       |      ORDER BY aF.cent_sim ASC, aF.vec_id ASC) = 1
       |    THEN 1 ELSE 0 END AS INT) AS keep
       |FROM aF JOIN grp ON grp.node = aF.vec_id
       |ORDER BY aF.vec_id""".stripMargin
  }

  /** WITH-body prefix replaying the PQ training + ADC scan of
    * SimilarityOps.pqEncode/pqTopKCosine: corpus unit vectors → m
    * subspace tables → smallest-id-seeded codebook → `lloyd` exact-mean
    * Lloyd rounds (window argmin with the identical
    * na²+nb²−2·dot forms) → final codes + per-query LUT → ADC ranking
    * in `ranked(query_id, neighbor_id, adc, rank)`. All reductions use
    * the proven devices (sqlMean on derived unit components, sqlDetSum
    * for the ADC sum), every distance is a fixed-order chain. */
  def pqAdcRankedCtes(queryPred: String, m: Int, ksub: Int,
                      lloyd: Int): String = {
    val sub = Dim / m
    def vcols(pre: String = "") = (1 to sub).map(i => s"$pre" + s"v$i")
    def normSq(pre: String) =
      (1 to sub).map(i => s"$pre" + s"v$i * $pre" + s"v$i").mkString(" + ")
    def dotQ(a: String, b: String) =
      (1 to sub).map(i => s"${a}v$i * ${b}v$i").mkString(" + ")
    // l2sq(a, b) exactly as SimilarityOps.l2sq: na·na + nb·nb − 2·dot
    // with na/nb = SQRT(Σ) (sqrt-then-square, mirroring norm2D usage)
    def l2sq(a: String, b: String) =
      s"SQRT(${normSq(a)}) * SQRT(${normSq(a)}) + " +
        s"SQRT(${normSq(b)}) * SQRT(${normSq(b)}) - 2.0 * (${dotQ(a, b)})"
    val uCols = (1 to Dim).map(i =>
      s"CAST(embedding[$i] AS DOUBLE) / nrm AS u_$i").mkString(",\n    ")
    def subSelect(src: String, idAs: String, pred: String) =
      (0 until m).map { s =>
        s"SELECT $idAs, $s AS s, ${(1 to sub).map(i =>
          s"u_${s * sub + i} AS v$i").mkString(", ")} FROM $src$pred"
      }.mkString("\n  UNION ALL\n  ")
    val lloydRounds = (1 to lloyd).map { r =>
      s"""asg$r AS MATERIALIZED (
         |  SELECT cid, s, code, ${vcols().mkString(", ")} FROM (
         |    SELECT c.cid, c.s, b.code, ${vcols("c.").mkString(", ")},
         |      ROW_NUMBER() OVER (PARTITION BY c.cid, c.s
         |        ORDER BY (${l2sq("c.", "b.")}) ASC, b.code ASC) AS rk
         |    FROM csub c JOIN cb${r - 1} b ON b.s = c.s)
         |  WHERE rk = 1),
         |cb$r AS MATERIALIZED (
         |  SELECT s, code, ${(1 to sub).map(i =>
             s"${sqlMean(s"v$i")} AS v$i").mkString(", ")}
         |  FROM asg$r GROUP BY s, code)""".stripMargin
    }.mkString(",\n")
    s"""un AS MATERIALIZED (
       |  SELECT vec_id, $uCols
       |  FROM (SELECT vec_id, embedding, ${sqlNorm("embedding")} AS nrm
       |        FROM embeddings)),
       |csub AS MATERIALIZED (
       |  ${subSelect("un", "vec_id AS cid", "")}),
       |sd16 AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $ksub),
       |cb0 AS MATERIALIZED (
       |  SELECT s, CAST(ROW_NUMBER() OVER (PARTITION BY s ORDER BY cid)
       |    - 1 AS INT) AS code, ${vcols().mkString(", ")}
       |  FROM csub WHERE cid IN (SELECT vec_id FROM sd16)),
       |$lloydRounds,
       |asgF AS MATERIALIZED (
       |  SELECT cid, s, code FROM (
       |    SELECT c.cid, c.s, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY c.cid, c.s
       |        ORDER BY (${l2sq("c.", "b.")}) ASC, b.code ASC) AS rk
       |    FROM csub c JOIN cb$lloyd b ON b.s = c.s)
       |  WHERE rk = 1),
       |qsub AS MATERIALIZED (
       |  ${subSelect("un", "vec_id AS query_id", s" WHERE $queryPred")}),
       |lut AS MATERIALIZED (
       |  SELECT q.query_id, q.s, b.code, (${l2sq("q.", "b.")}) AS d2
       |  FROM qsub q JOIN cb$lloyd b ON b.s = q.s),
       |ranked AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, adc,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc ASC, neighbor_id ASC) AS rank
       |  FROM (
       |    SELECT l.query_id, c.cid AS neighbor_id,
       |      ROUND(${sqlDetSum("l.d2")}, 6) AS adc
       |    FROM asgF c JOIN lut l ON l.s = c.s AND l.code = c.code
       |    GROUP BY l.query_id, c.cid)
       |  WHERE query_id <> neighbor_id)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    Q("ml_lpa_communities", // clustering/louvain.py's label-propagation
      // scaffold, oracle-exact end-to-end: the LSH kNN graph (same
      // sign-projection twin as ann_lsh_bucketed) feeds 4 SYNCHRONOUS
      // LPA rounds unrolled as CTEs — per round, each node adopts its
      // neighbors' plurality label (ties → smallest label), exactly the
      // count-argmax the distributed rounds compute. The full louvain
      // refinement stays rows-only (ml_louvain_lpa).
      (s, d) => {
        val e = emb(s, d).filter(col("vec_id") < 500)
        val graph = graft.ml.Community.knnGraphLSH(
          e, "vec_id", "embedding", Dim, 5, nPlanes = 4)
        graft.ml.Community.labelPropagation(graph, "src", "dst", 4)
          .orderBy(col("node"))
      },
      Some {
        val bucket = (0 until 4).map { j =>
          val proj = (1 to Dim).map { i =>
            s"CAST(embedding[$i] AS DOUBLE) * ${SimilarityOps.planeComponent(j, i)}"
          }.mkString("(", " + ", ")")
          s"CASE WHEN $proj > 0 THEN ${math.pow(2, j).toLong} ELSE 0 END"
        }.mkString(" + ")
        val rounds = (1 to 4).map { r =>
          s"""lab$r AS MATERIALIZED (
             |  SELECT u AS node, label FROM (
             |    SELECT s.u, l.label,
             |      ROW_NUMBER() OVER (PARTITION BY s.u
             |        ORDER BY COUNT(*) DESC, l.label ASC) AS rn
             |    FROM sym s JOIN lab${r - 1} l ON l.node = s.v
             |    GROUP BY s.u, l.label)
             |  WHERE rn = 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH b AS MATERIALIZED (
           |  SELECT vec_id, embedding, ($bucket) AS bucket
           |  FROM embeddings WHERE vec_id < 500),
           |knn AS MATERIALIZED (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |        ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC,
           |                 c.vec_id ASC) AS rank
           |    FROM b q JOIN b c ON q.bucket = c.bucket
           |      AND q.vec_id <> c.vec_id)
           |  WHERE rank <= 5),
           |edges AS MATERIALIZED (
           |  SELECT DISTINCT LEAST(query_id, neighbor_id) AS u0,
           |    GREATEST(query_id, neighbor_id) AS v0 FROM knn),
           |sym AS MATERIALIZED (
           |  SELECT u0 AS u, v0 AS v FROM edges
           |  UNION
           |  SELECT v0 AS u, u0 AS v FROM edges),
           |lab0 AS MATERIALIZED (
           |  SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM sym)),
           |$rounds
           |SELECT node, label FROM lab4 ORDER BY node""".stripMargin
      }),

    Q("ann_bruteforce_cosine", // exact top-5 cosine neighbors of 20 queries
      (s, d) => SimilarityOps.topKCosine(
          emb(s, d).filter(col("vec_id") < 20), emb(s, d),
          "vec_id", "embedding", Dim, 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank")),
      Some(s"""SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank FROM (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |    ${sqlCos("q.embedding", "c.embedding")} AS cosine,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |      ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC,
              |               c.vec_id ASC) AS rank
              |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              |  WHERE q.vec_id < 20)
              |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    Q("ann_ivf", // FAISS-style IVF ANN: coarse k-means quantizer +
      // inverted lists + probe-limited exact scoring. Run with
      // nprobe = nlist here, where IVF provably equals brute force —
      // the oracle is the exact top-k SQL; SimilaritySpec covers the
      // recall/scan trade-off at nprobe < nlist.
      (s, d) => SimilarityOps.ivfTopKCosine(
          emb(s, d).filter(col("vec_id") < 20), emb(s, d),
          "vec_id", "embedding", Dim, 3, nlist = 8, nprobe = 8)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank")),
      Some(s"""SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank FROM (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |    ${sqlCos("q.embedding", "c.embedding")} AS cosine,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |      ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC,
              |               c.vec_id ASC) AS rank
              |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              |  WHERE q.vec_id < 20)
              |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    Q("ann_pq_adc", // product-quantization ANN (Jégou TPAMI'11): unit
      // vectors → 4×16-dim subspaces → 16-centroid codebooks (exact
      // DECIMAL Lloyd, deterministic seeds/ties) → ADC scan where each
      // corpus row costs m LUT lookups, never a 64-dim distance.
      // The query runs the production contract: ADC shortlist (10% of
      // corpus) + exact re-rank of shortlist rows only. Now
      // oracle-exact: the codebook training replays as CTE rounds
      // (pqAdcRankedCtes) and the re-rank is the proven fixed-chain
      // cosine — was rows-only.
      (s, d) => SimilarityOps.pqRerankTopKCosine(
          emb(s, d).filter(col("vec_id") < 20), emb(s, d),
          "vec_id", "embedding", Dim, k = 5, shortlist = 50)
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH ${pqAdcRankedCtes("vec_id < 20", 4, 16, 2)},
              |short AS (SELECT query_id, neighbor_id FROM ranked
              |  WHERE rank <= 50)
              |SELECT query_id, neighbor_id, cosine, rank FROM (
              |  SELECT s.query_id, s.neighbor_id,
              |    ROUND(${sqlCos("q.embedding", "c.embedding")}, 6) AS cosine,
              |    ROW_NUMBER() OVER (PARTITION BY s.query_id
              |      ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC,
              |               s.neighbor_id ASC) AS rank
              |  FROM short s
              |  JOIN embeddings q ON q.vec_id = s.query_id
              |  JOIN embeddings c ON c.vec_id = s.neighbor_id)
              |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    Q("ann_ivf_pq_rerank", // the full FAISS production stack
      // (IndexIVFPQ + refine): coarse lists shrink candidates
      // ~nprobe/nlist, the ADC scan shortlists from 16-bit codes, and
      // ONLY shortlist rows fetch vectors for the exact re-rank. Raw
      // ADC is quantization-bound on unstructured corpora (measured
      // recall@10 ≈ 0.01 on the uniform growth replicas); the re-rank
      // restores recall to the IVF candidate ceiling. Run at
      // nprobe = nlist where the shortlist provably equals the plain
      // PQ ranking, so the oracle replays codebook + ADC + re-rank.
      (s, d) => SimilarityOps.ivfPqRerankTopKCosine(
          emb(s, d).filter(col("vec_id") < 20), emb(s, d),
          "vec_id", "embedding", Dim, k = 5, nlist = 8, nprobe = 8,
          shortlist = 50)
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH ${pqAdcRankedCtes("vec_id < 20", 4, 16, 2)},
              |short AS (SELECT query_id, neighbor_id FROM ranked
              |  WHERE rank <= 50)
              |SELECT query_id, neighbor_id, cosine, rank FROM (
              |  SELECT s.query_id, s.neighbor_id,
              |    ROUND(${sqlCos("q.embedding", "c.embedding")}, 6) AS cosine,
              |    ROW_NUMBER() OVER (PARTITION BY s.query_id
              |      ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC,
              |               s.neighbor_id ASC) AS rank
              |  FROM short s
              |  JOIN embeddings q ON q.vec_id = s.query_id
              |  JOIN embeddings c ON c.vec_id = s.neighbor_id)
              |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    Q("ann_ivf_pq", // the composed FAISS production shape: coarse lists
      // shrink candidates ~nprobe/nlist BEFORE any distance work, then
      // the ADC scan prices each survivor at m LUT lookups. Run at
      // nprobe = nlist where it provably equals the plain PQ scan
      // (SimilaritySpec pins the identity + the subset property at
      // nprobe < nlist). Rows-only: codebook-dependent ranking.
      (s, d) => SimilarityOps.ivfPqTopKCosine(
          emb(s, d).filter(col("vec_id") < 20), emb(s, d),
          "vec_id", "embedding", Dim, k = 5, nlist = 8, nprobe = 8)
        .orderBy(col("query_id"), col("rank")),
      // nprobe = nlist ⇒ provably equal to the plain PQ-ADC scan
      // (SimilaritySpec identity), so the oracle is the replayed
      // codebook + ADC ranking itself — was rows-only.
      Some(s"""WITH ${pqAdcRankedCtes("vec_id < 20", 4, 16, 2)}
              |SELECT query_id, neighbor_id, adc, rank FROM ranked
              |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    Q("ann_lsh_bucketed", // scale path: sign-of-projection buckets, then
      // exact cosine within bucket only (equi-join, no cross join).
      (s, d) => SimilarityOps.lshTopKCosine(
          emb(s, d).filter(col("vec_id") < 20), emb(s, d),
          "vec_id", "embedding", Dim, 3, nPlanes = 4)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank")),
      Some {
        val bucket = (0 until 4).map { j =>
          val proj = (1 to Dim).map { i =>
            s"CAST(embedding[$i] AS DOUBLE) * ${SimilarityOps.planeComponent(j, i)}"
          }.mkString("(", " + ", ")")
          s"CASE WHEN $proj > 0 THEN ${math.pow(2, j).toLong} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH b AS (SELECT vec_id, embedding, ($bucket) AS bucket FROM embeddings)
           |SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank FROM (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    ${sqlCos("q.embedding", "c.embedding")} AS cosine,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC,
           |               c.vec_id ASC) AS rank
           |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 20)
           |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
      }),

    Q("embedding_norms", // vector feature extraction: norms + means
      (s, d) => {
        val e = col("embedding")
        val mean64 = (1 to Dim).map(i => element_at(e, i).cast("double"))
          .reduce(_ + _) / Dim
        emb(s, d).select(col("vec_id"), col("label"),
            round(SimilarityOps.norm2Fixed(e, Dim), 6).as("l2_norm"),
            round(mean64, 6).as("mean_component"))
          .orderBy(col("vec_id"))
      },
      Some {
        val meanExpr = (1 to Dim).map(i => s"CAST(embedding[$i] AS DOUBLE)")
          .mkString("(", " + ", ")") + s" / $Dim"
        s"""SELECT vec_id, label,
           |  ROUND(${sqlNorm("embedding")}, 6) AS l2_norm,
           |  ROUND($meanExpr, 6) AS mean_component
           |FROM embeddings ORDER BY vec_id""".stripMargin
      }),

    Q("embedding_centroid_by_label", // per-class centroid distance: the
      // group-then-broadcast pattern for embedding-cosine near-dup.
      (s, d) => {
        val e = col("embedding")
        val perDim = (1 to Dim).map(i =>
          graft.core.Tables.exactMean(element_at(e, i).cast("double")).as(s"c$i"))
        val centroids = emb(s, d).groupBy(col("label"))
          .agg(perDim.head, perDim.tail: _*)
        val dot = (1 to Dim).map(i =>
          element_at(e, i).cast("double") * col(s"c$i")).reduce(_ + _)
        val cNorm = sqrt((1 to Dim).map(i => col(s"c$i") * col(s"c$i")).reduce(_ + _))
        emb(s, d).join(broadcast(centroids), "label")
          .select(col("vec_id"), col("label"),
            round(dot / (SimilarityOps.norm2Fixed(e, Dim) * cNorm), 6)
              .as("cos_to_centroid"))
          .orderBy(col("vec_id"))
      },
      Some {
        val cMeans = (1 to Dim).map(i =>
          s"${SqlGen.sqlMean(s"CAST(embedding[$i] AS DOUBLE)")} AS c$i").mkString(", ")
        val dot = (1 to Dim).map(i =>
          s"CAST(e.embedding[$i] AS DOUBLE) * c.c$i").mkString("(", " + ", ")")
        val cN = "SQRT(" + (1 to Dim).map(i => s"c.c$i * c.c$i")
          .mkString("(", " + ", ")") + ")"
        s"""WITH c AS (SELECT label, $cMeans FROM embeddings GROUP BY label)
           |SELECT e.vec_id, e.label,
           |  ROUND($dot / (${sqlNorm("e.embedding")} * $cN), 6) AS cos_to_centroid
           |FROM embeddings e JOIN c ON e.label = c.label
           |ORDER BY e.vec_id""".stripMargin
      }),

    Q("dedup_embedding_cosine", // embedding-cosine near-dup pairs via
      // banded hyperplane LSH (SimilarityOps.cosineNearDupPairs): 4 bands
      // × 4 sign bits, candidates = same-band bucket collisions
      // (equi-join), exact cosine ≥ 0.4 confirms. The dedup twin of
      // MinHash-LSH banding, over vectors instead of shingles.
      (s, d) => SimilarityOps.cosineNearDupPairs(
          emb(s, d), "vec_id", "embedding", Dim,
          threshold = 0.4, bands = 4, planesPerBand = 4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("id_a"), col("id_b")),
      Some {
        def bucketExpr(band: Int): String = (0 until 4).map { bit =>
          val j = band * 4 + bit
          val proj = (1 to Dim).map(i =>
            s"CAST(embedding[$i] AS DOUBLE) * ${SimilarityOps.planeComponent(j, i)}")
            .mkString("(", " + ", ")")
          s"CASE WHEN $proj > 0 THEN ${1L << bit} ELSE 0 END"
        }.mkString(" + ")
        val kSql = (0 until 4).map(b =>
          s"SELECT vec_id, ($b) AS band, (${bucketExpr(b)}) AS bucket FROM embeddings")
          .mkString("\nUNION ALL\n")
        s"""WITH k AS (
           |$kSql
           |), cand AS (
           |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM k a JOIN k b
           |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
           |SELECT id_a, id_b, ROUND(cos, 6) AS cosine FROM (
           |  SELECT c.id_a, c.id_b,
           |    ${sqlCos("e1.embedding", "e2.embedding")} AS cos
           |  FROM cand c
           |  JOIN embeddings e1 ON e1.vec_id = c.id_a
           |  JOIN embeddings e2 ON e2.vec_id = c.id_b)
           |WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin
      }),

    Q("dedup_semantic", // SemDeDup (Abbas et al. 2023): k-means-cluster
      // the embedding space (the shared IVF coarse quantizer — smallest-
      // id seeds + exact-DECIMAL-mean Lloyd), call within-cluster pairs
      // with cosine >= 0.4 semantic duplicates, connect into groups,
      // keep the member LEAST similar to its centroid (the paper's
      // "low" policy; ties -> smallest id). Oracle replays the full
      // trajectory: seeded centroids, per-round window-argmax cosine
      // assignment + exact-mean update, the within-cluster pair join,
      // recursive-CTE components, and the identical keep window.
      (s, d) => SimilarityOps.semanticDedup(
          emb(s, d), "vec_id", "embedding", Dim, nlist = 8, eps = 0.4)
        .orderBy(col("vec_id")),
      Some(semanticDedupSql(nlist = 8, eps = 0.4, lloyd = 2))),

    Q("dedup_semantic_2level", // SemDeDup through the TWO-LEVEL (IMI-
      // style, Jégou TPAMI'11 §V) coarse quantizer — the 100 TB path:
      // SemDeDup's own scale protocol grows nlist ∝ corpus (flat
      // cluster occupancy), which makes flat argmax assignment
      // O(corpus²); two-level keeps √nlist top cells driver-held and
      // argmaxes only within the matched cell's children, so per-row
      // cost and driver state are O(√nlist). ntop is forced small here
      // so the oracle exercises the hierarchy at fixture scale; the
      // full deterministic trajectory (fixed tops, per-round child
      // routing, two-stage row assignment, exact-mean updates) replays
      // as CTEs.
      (s, d) => SimilarityOps.semanticDedup(
          emb(s, d), "vec_id", "embedding", Dim, nlist = 8, eps = 0.4,
          ntop = 3)
        .orderBy(col("vec_id")),
      Some(semanticDedupHierSql(nlist = 8, ntop = 3, eps = 0.4,
        lloyd = 2))),

    Q("ann_ivf_2level", // IVF ANN through the two-level quantizer at
      // nprobe = nlist: every (surviving) list is probed, so whatever
      // the hierarchical router assigned, the scan covers the corpus
      // and the result provably equals brute force — the same
      // invariance device as ann_ivf's oracle. SimilaritySpec covers
      // recall at nprobe < nlist.
      (s, d) => SimilarityOps.ivfTopKCosine(
          emb(s, d).filter(col("vec_id") < 20), emb(s, d),
          "vec_id", "embedding", Dim, 3, nlist = 8, nprobe = 8,
          ntop = 3)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank")),
      Some(s"""SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank FROM (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |    ${sqlCos("q.embedding", "c.embedding")} AS cosine,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |      ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC,
              |               c.vec_id ASC) AS rank
              |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              |  WHERE q.vec_id < 20)
              |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    Q("graph_pagerank", // link-graph authority scoring (the corpus
      // quality-weighting shape): 10 PageRank rounds over the same
      // LSH-bucketed kNN similarity graph as the community queries.
      // Per-neighbor contributions are rounded to the 1e-12 grid and
      // summed through DECIMAL (the detSum device), so the trajectory
      // replays exactly in the unrolled-CTE oracle; sub-cap graphs take
      // the bit-identical driver replay.
      (s, d) => {
        val e = emb(s, d).filter(col("vec_id") < 500)
        val graph = graft.ml.Community.knnGraphLSH(
          e, "vec_id", "embedding", Dim, 5, nPlanes = 4)
        graft.ml.Community.pagerank(graph, "src", "dst", rounds = 10)
          .select(col("node"), round(col("r"), 6).as("rank"))
          .orderBy(col("node"))
      },
      Some(graft.ml.Community.pagerankSql(
        lshSymGraphPrefix(500, 5, nPlanes = 4),
        rounds = 10, damping = 0.85,
        select = """SELECT node, ROUND(r, 6) AS rank
                   |FROM pr10 ORDER BY node""".stripMargin))),

    Q("embedding_quantize_int8", // vector-store export: per-DIMENSION
      // symmetric int8 quantization of the embedding corpus. Scales
      // come from ONE 64-max aggregate (s_j = max|v_j|/127, broadcast
      // back), then a single zero-shuffle projection emits per-vector
      // integer checksums (sum_q, max_abs_q, n_clipped — exact) and the
      // reconstruction error (fixed left-to-right 64-term chain, the
      // embedding_norms float device, round 6). 100 TB shape: tiny agg
      // + broadcast + projection, no shuffle of the vectors.
      (s, d) => {
        val e = col("embedding")
        val scaleAggs = (1 to Dim).map(i =>
          (greatest(max(abs(element_at(e, i).cast("double"))),
            lit(1e-12)) / 127.0).as(s"s$i"))
        val scales = emb(s, d).agg(scaleAggs.head, scaleAggs.tail: _*)
        def q(i: Int) =
          least(greatest(round(element_at(e, i).cast("double") / col(s"s$i")),
            lit(-127.0)), lit(127.0))
        val sumQ = (1 to Dim).map(i => q(i)).reduce(_ + _).cast("long")
        val maxAbsQ = (1 to Dim).map(i => abs(q(i))).reduce(greatest(_, _))
          .cast("int")
        val nClipped = (1 to Dim).map(i =>
          when(abs(round(element_at(e, i).cast("double") / col(s"s$i"))) > 127,
            1).otherwise(0)).reduce(_ + _).cast("int")
        def err(i: Int) = {
          val dlt = element_at(e, i).cast("double") - q(i) * col(s"s$i")
          dlt * dlt
        }
        val recon = (1 to Dim).map(err).reduce(_ + _)
        emb(s, d).crossJoin(broadcast(scales))
          .select(col("vec_id"), sumQ.as("sum_q"), maxAbsQ.as("max_abs_q"),
            nClipped.as("n_clipped"), round(recon, 6).as("recon_err2"))
          .orderBy(col("vec_id"))
      },
      Some {
        val scaleCols = (1 to Dim).map(i =>
          s"GREATEST(MAX(ABS(CAST(embedding[$i] AS DOUBLE))), 1e-12) / 127.0 AS s$i")
          .mkString(",\n    ")
        def q(i: Int) =
          s"LEAST(GREATEST(ROUND(CAST(embedding[$i] AS DOUBLE) / s$i), -127.0), 127.0)"
        val sumQ = (1 to Dim).map(q).mkString("(", " + ", ")")
        val maxAbsQ = s"GREATEST(${(1 to Dim).map(i => s"ABS(${q(i)})").mkString(", ")})"
        val nClipped = (1 to Dim).map(i =>
          s"CASE WHEN ABS(ROUND(CAST(embedding[$i] AS DOUBLE) / s$i)) > 127 THEN 1 ELSE 0 END")
          .mkString("(", " + ", ")")
        val recon = (1 to Dim).map(i =>
          s"(CAST(embedding[$i] AS DOUBLE) - ${q(i)} * s$i) * " +
            s"(CAST(embedding[$i] AS DOUBLE) - ${q(i)} * s$i)")
          .mkString("(", " + ", ")")
        s"""WITH scales AS (
           |  SELECT
           |    $scaleCols
           |  FROM embeddings)
           |SELECT vec_id,
           |  CAST($sumQ AS BIGINT) AS sum_q,
           |  CAST($maxAbsQ AS INT) AS max_abs_q,
           |  CAST($nClipped AS INT) AS n_clipped,
           |  ROUND($recon, 6) AS recon_err2
           |FROM embeddings CROSS JOIN scales
           |ORDER BY vec_id""".stripMargin
      })
  )
}
