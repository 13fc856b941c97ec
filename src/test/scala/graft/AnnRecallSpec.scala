package graft

import graft.functions.TextSim
import graft.functions.TextSim.{spark => sprk}

/** Recall floors for the approximate similarity operators against exact
  * brute-force ground truth (sf0.01: 500 embeddings — small enough to
  * compute the exact answer in-test, large enough that buckets/cells are
  * populated). Pins the QUALITY side of the scale parameterization: the
  * bucket/cell ladders and multi-probe may be retuned, but a change that
  * collapses recall fails here, not in production. */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("t39 multi-probe LSH finds most true cosine>=0.4 pairs") {
    graft.functions.GraftFunctions.registerAll(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    val d = sprk
    val truth = spark.sql(
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${TextSim.norm2(d, "embedding")} AS n2 FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |FROM v a JOIN v b ON a.vec_id < b.vec_id
         |WHERE ${TextSim.dot(d, "a.embedding", "b.embedding")} / (sqrt(a.n2) * sqrt(b.n2)) >= 0.4""".stripMargin)
      .count()
    val found = SparkEntry.queries("t39_lsh_bucket_ann")(spark, dir).count()
    CacheJanitor.drain()
    assert(truth > 0, "ground truth must be non-trivial")
    val recall = found.toDouble / truth
    info(s"t39 recall: $found/$truth = $recall")
    assert(recall >= 0.30, s"LSH multi-probe recall degraded: $recall")
  }

  test("t41 IVF 3-cell probe recovers a meaningful share of exact top-3 neighbors") {
    graft.functions.GraftFunctions.registerAll(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    val d = sprk
    // Exact top-3 per bounded query (same query set as t41).
    val truth = spark.sql(
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${TextSim.norm2(d, "embedding")} AS n2 FROM embeddings),
         |q AS (SELECT * FROM v WHERE vec_id % 100 = 0 AND vec_id < 2500),
         |scored AS (
         |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |    ${TextSim.dot(d, "q.embedding", "v.embedding")} / (sqrt(q.n2) * sqrt(v.n2)) AS cosine
         |  FROM q JOIN v ON v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM scored) WHERE rnk <= 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("t41_ivf_ann")(spark, dir)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheJanitor.drain()
    assert(truth.nonEmpty)
    val recall = (truth & got).size.toDouble / truth.size
    // Synthetic embeddings are near-random (little cluster structure), so
    // cell-probe recall is inherently modest here; the floor pins
    // "multi-probe works and doesn't regress", not production quality.
    // Trained centroids (2 deterministic Lloyd iterations) lifted the
    // round-2 seed-centroid floor from 0.4 to 0.5. Measured at sf0.01:
    // 8/15 = 0.533 — the honest floor IS 0.5 (a 0.7 floor would need
    // more probes or more Lloyd iterations, not better assertions).
    info(s"t41 recall@3: ${(truth & got).size}/${truth.size} = $recall")
    assert(recall >= 0.5, s"IVF 3-probe recall degraded: $recall")
  }

  test("t48 int8 quantized scoring + exact re-rank recovers most exact top-3 neighbors") {
    graft.functions.GraftFunctions.registerAll(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    val d = sprk
    val truth = spark.sql(
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${TextSim.norm2(d, "embedding")} AS n2 FROM embeddings),
         |q AS (SELECT * FROM v WHERE vec_id % 100 = 0 AND vec_id < 2500),
         |scored AS (
         |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |    ${TextSim.dot(d, "q.embedding", "v.embedding")} / (sqrt(q.n2) * sqrt(v.n2)) AS cosine
         |  FROM q JOIN v ON v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM scored) WHERE rnk <= 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("t48_quantized_ann")(spark, dir)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheJanitor.drain()
    assert(truth.nonEmpty)
    val recall = (truth & got).size.toDouble / truth.size
    // 8 bits per dim loses little ranking signal; the top-10 candidate
    // pool + exact re-rank should recover nearly all of the exact top-3.
    info(s"t48 recall@3: ${(truth & got).size}/${truth.size} = $recall")
    assert(recall >= 0.8, s"quantized re-rank recall degraded: $recall")
  }

  test("t62 PQ ADC scoring + exact re-rank keeps a meaningful share of exact top-3") {
    graft.functions.GraftFunctions.registerAll(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    val d = sprk
    val truth = spark.sql(
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${TextSim.norm2(d, "embedding")} AS n2 FROM embeddings),
         |q AS (SELECT * FROM v WHERE vec_id % 100 = 0 AND vec_id < 2500),
         |scored AS (
         |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |    ${TextSim.dot(d, "q.embedding", "v.embedding")} / (sqrt(q.n2) * sqrt(v.n2)) AS cosine
         |  FROM q JOIN v ON v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM scored) WHERE rnk <= 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("t62_pq_ann")(spark, dir)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheJanitor.drain()
    assert(truth.nonEmpty)
    val recall = (truth & got).size.toDouble / truth.size
    // 4 bits per subspace is the crudest quantizer in the family, and the
    // synthetic embeddings are near-random (PQ's worst case: no subspace
    // structure to exploit), so the floor is deliberately modest — it pins
    // "ADC ranking carries signal and the re-rank works", not production
    // recall. Measured at sf0.01: 7/15 = 0.467 with the top-25 re-rank
    // pool (top-10 measured 0.267 — the wider pool is load-bearing).
    info(s"t62 recall@3: ${(truth & got).size}/${truth.size} = $recall")
    assert(recall >= 0.35, s"PQ ADC recall degraded: $recall")
  }

  test("t63 IVF-PQ (cell probe + ADC scoring + re-rank) holds a floor under both approximations") {
    graft.functions.GraftFunctions.registerAll(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    val d = sprk
    val truth = spark.sql(
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${TextSim.norm2(d, "embedding")} AS n2 FROM embeddings),
         |q AS (SELECT * FROM v WHERE vec_id % 100 = 0 AND vec_id < 2500),
         |scored AS (
         |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |    ${TextSim.dot(d, "q.embedding", "v.embedding")} / (sqrt(q.n2) * sqrt(v.n2)) AS cosine
         |  FROM q JOIN v ON v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM scored) WHERE rnk <= 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("t63_ivf_pq_ann")(spark, dir)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheJanitor.drain()
    assert(truth.nonEmpty)
    val recall = (truth & got).size.toDouble / truth.size
    // Recall is bounded by BOTH approximations: the 3-cell probe (t41's
    // 0.5 limit on this corpus) and 4-bit ADC ranking inside the probed
    // cells (t62's crudeness, softened by the top-25 re-rank). The floor
    // pins "the composition works", below either parent's alone.
    info(s"t63 recall@3: ${(truth & got).size}/${truth.size} = $recall")
    assert(recall >= 0.25, s"IVF-PQ recall degraded: $recall")
  }

  test("t49 IVF-SQ8 (cell probe + int8 scoring + re-rank) matches t41's recall floor") {
    graft.functions.GraftFunctions.registerAll(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    val d = sprk
    val truth = spark.sql(
      s"""WITH v AS (
         |  SELECT vec_id, embedding, ${TextSim.norm2(d, "embedding")} AS n2 FROM embeddings),
         |q AS (SELECT * FROM v WHERE vec_id % 100 = 0 AND vec_id < 2500),
         |scored AS (
         |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |    ${TextSim.dot(d, "q.embedding", "v.embedding")} / (sqrt(q.n2) * sqrt(v.n2)) AS cosine
         |  FROM q JOIN v ON v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM scored) WHERE rnk <= 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("t49_ivf_sq8_ann")(spark, dir)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheJanitor.drain()
    assert(truth.nonEmpty)
    val recall = (truth & got).size.toDouble / truth.size
    // Candidate recall is bounded by the 3-cell probe (t41's limit); the
    // int8 + top-10 re-rank inside the probed cells should cost almost
    // nothing on top (t48 measured ~no loss from 8-bit scoring).
    info(s"t49 recall@3: ${(truth & got).size}/${truth.size} = $recall")
    assert(recall >= 0.5, s"IVF-SQ8 recall fell below t41's floor: $recall")
  }
}
