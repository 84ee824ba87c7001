package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search suite over `embeddings` (ARRAY<FLOAT>, 64 dims).
  * All cosine math is quantized-integer (see [[graft.ext.Similarity]]), so
  * the DuckDB oracles replay it bit-for-bit.
  */
object SimilarityQueries {

  /** DuckDB fragment: Similarity.quantize. The explicit DOUBLE cast
    * matters — FLOAT*INTEGER must not be evaluated in float precision. */
  private def sqlQ(embCol: String): String =
    s"list_transform($embCol, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"

  /** DuckDB fragment: Similarity.cosineQ over quantized list columns
    * (dimension-generic: iterates the common prefix like LongArrayDot). */
  private def sqlCosine(qa: String, qb: String): String =
    s"""CAST(list_sum(list_transform(range(1, least(len($qa), len($qb)) + 1),
       |       i -> $qa[i] * $qb[i])) AS DOUBLE)
       | / sqrt(CAST(list_sum(list_transform($qa, x -> x * x)) AS DOUBLE)
       |        * CAST(list_sum(list_transform($qb, x -> x * x)) AS DOUBLE))""".stripMargin

  /** DuckDB fragment: Similarity.signBandKeys band b (8 sign bits). */
  private def sqlBand(b: Int, rowsPerBand: Int = 8): String =
    (0 until rowsPerBand).foldLeft(s"${b}::BIGINT") { (acc, r) =>
      s"(($acc) * 2 + (CASE WHEN q[${b * rowsPerBand + r + 1}] >= 0 THEN 1 ELSE 0 END))"
    }

  val defs: Seq[QueryDef] = Seq(

    // brute-force cosine top-k for one query vector
    QueryDef("ann_topk_bruteforce",
      s"""WITH q AS (
         |  SELECT ${sqlQ("embedding")} AS qq FROM embeddings WHERE vec_id = 0),
         |e AS (
         |  SELECT vec_id, ${sqlQ("embedding")} AS qe
         |  FROM embeddings WHERE vec_id <> 0)
         |SELECT vec_id, ${sqlCosine("qe", "qq")} AS score
         |FROM e, q
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      Similarity.annTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 10)
    },

    // top-5 neighbours for each of the first 8 query vectors (broadcast
    // the query set; rank per query with a window)
    QueryDef("ann_topk_multi",
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, ${sqlQ("embedding")} AS qq
         |  FROM embeddings WHERE vec_id < 8),
         |e AS (
         |  SELECT vec_id, ${sqlQ("embedding")} AS qe FROM embeddings),
         |scored AS (
         |  SELECT q.query_id, e.vec_id, ${sqlCosine("qe", "qq")} AS score
         |  FROM e, q WHERE e.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY score DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT query_id, vec_id, score, rn FROM ranked WHERE rn <= 5
         |ORDER BY query_id, rn""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          Similarity.quantize(col("embedding")).as("qq"))
      val e = emb.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qe"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          Similarity.cosineQ(col("qe"), col("qq")).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .orderBy("query_id", "rn")
    },

    // LSH-banded near-dup pairs: same-band candidates + exact re-rank —
    // the scale path (shuffle on band key, no n² cross join)
    QueryDef("sim_banded_pairs", {
      val bands = (0 until 4).map(b => s"${sqlBand(b)} AS band_$b").mkString(",\n    ")
      s"""WITH e AS (
         |  SELECT vec_id, ${sqlQ("embedding")} AS q FROM embeddings),
         |k AS (
         |  SELECT vec_id, q,
         |    $bands
         |  FROM e),
         |banded AS (
         |  SELECT vec_id, q, unnest([band_0, band_1, band_2, band_3]) AS band
         |  FROM k),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${sqlCosine("a.q", "b.q")} AS score
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, score FROM pairs WHERE score >= 0.3
         |ORDER BY id_a, id_b""".stripMargin
    }) { (s, d) =>
      Similarity.bandedPairs(Tables.embeddings(s, d), threshold = 0.3,
          bands = 4, rowsPerBand = 8)
        .orderBy("id_a", "id_b")
    },

    // IVF-style partitioned ANN: assign to nearest of 16 centroid
    // vectors, probe the query's 4 nearest clusters, exact top-10 within
    QueryDef("ann_ivf_topk",
      s"""WITH e AS (
         |  SELECT vec_id AS id, ${sqlQ("embedding")} AS q FROM embeddings),
         |cent AS (
         |  SELECT id AS cid, q AS cq FROM e WHERE id < 16),
         |scored AS (
         |  SELECT e.id, e.q, cent.cid, ${sqlCosine("e.q", "cent.cq")} AS cscore
         |  FROM e, cent),
         |ranked AS (
         |  SELECT id, cid, ROW_NUMBER() OVER (PARTITION BY id
         |    ORDER BY cscore DESC, cid) AS rn
         |  FROM scored),
         |assign AS (
         |  SELECT id, cid AS cluster_id FROM ranked WHERE rn = 1),
         |probes AS (
         |  SELECT cid AS cluster_id FROM ranked WHERE id = 0 AND rn <= 4),
         |qv AS (SELECT q AS qq FROM e WHERE id = 0)
         |SELECT e.id AS vec_id, a.cluster_id, ${sqlCosine("e.q", "qq")} AS score
         |FROM e JOIN assign a ON e.id = a.id
         |       JOIN probes p ON a.cluster_id = p.cluster_id, qv
         |WHERE e.id <> 0
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      Similarity.ivfTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 10,
          nCentroids = 16, nProbe = 4)
        .withColumnRenamed("id", "vec_id")
    },

    // exact all-pairs near-dup (the O(n²) correctness baseline for the
    // banded variant; small n only)
    QueryDef("sim_bruteforce_pairs",
      s"""WITH e AS (
         |  SELECT vec_id, ${sqlQ("embedding")} AS q FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${sqlCosine("a.q", "b.q")} AS score
         |FROM e a, e b WHERE a.vec_id < b.vec_id
         |  AND ${sqlCosine("a.q", "b.q")} >= 0.44
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Similarity.bruteForcePairs(Tables.embeddings(s, d), threshold = 0.44)
        .orderBy("id_a", "id_b")
    },

    // one k-means ASSIGNMENT step: per-label integer centroids
    // (floor(sum/n) per dim — exact in both engines), every vector
    // assigned to its nearest centroid by exact integer squared
    // distance, confusion counts out. The canonical iterative-Spark
    // workload shape: only the k×dims centroid table is broadcast.
    QueryDef("sim_centroid_assign",
      s"""WITH q AS (
         |  SELECT vec_id, label, ${sqlQ("embedding")} AS qv FROM embeddings),
         |dims AS (
         |  SELECT DISTINCT unnest(range(1, len(qv) + 1)) AS d FROM q),
         |x AS (
         |  SELECT q.label, dims.d, qv[dims.d] AS v
         |  FROM q JOIN dims ON dims.d <= len(qv)),
         |cent AS (
         |  SELECT label AS clabel, d,
         |         CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
         |  FROM x GROUP BY 1, 2),
         |carr AS (SELECT clabel, list(c ORDER BY d) AS qc FROM cent GROUP BY 1),
         |dist AS (
         |  SELECT q.vec_id, q.label, carr.clabel,
         |    list_sum(list_transform(range(1, len(q.qv) + 1),
         |      i -> (q.qv[i] - carr.qc[i]) * (q.qv[i] - carr.qc[i]))) AS d2
         |  FROM q, carr),
         |best AS (
         |  SELECT vec_id, label, clabel,
         |         ROW_NUMBER() OVER (PARTITION BY vec_id
         |                            ORDER BY d2, clabel) AS rn
         |  FROM dist)
         |SELECT label, clabel AS assigned, COUNT(*) AS n
         |FROM best WHERE rn = 1
         |GROUP BY 1, 2 ORDER BY label, assigned""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val vecs = e.select(col("vec_id"), col("label"),
        Similarity.quantize(col("embedding")).as("q"))
      val cents = Similarity.labelCentroids(e, "label", "embedding")
      Similarity.assignNearest(vecs, "q", cents)
        .groupBy("label", "assigned")
        .agg(count(lit(1)).as("n"))
        .orderBy("label", "assigned")
    },
  )
}
