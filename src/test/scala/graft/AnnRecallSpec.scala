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
    // round-2 seed-centroid floor from 0.4 to 0.5; the r7 unbiased
    // idShuffle sample+seed lifted the measured value again, 0.533 →
    // 12/15 = 0.8 at sf0.01. The floor stays at the honest 0.5 —
    // recall on a near-random corpus is partly seed geometry, and the
    // floor should survive a retuned scramble constant.
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
    // recall. Measured at sf0.01: 10/15 = 0.667 with the r7 unbiased
    // sample+seed (was 0.467 on the id-prefix sample; top-10 re-rank
    // measured 0.267 — the wider top-25 pool is load-bearing).
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

  test("quantizer training sample is unbiased on a source-clustered corpus") {
    // Ids grouped by source — the 100 TB reality an id-ordered prefix
    // sample gets wrong: the first `cap` ids would all come from source
    // 0, the quantizer would never see sources 1–3, and 75% of the
    // corpus would cram into a couple of cells. The idShuffle sample
    // must (a) span every source and (b) keep full-corpus cell
    // assignment balanced.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 64; val perSource = 125; val nSources = 4
    val rows = (0 until nSources * perSource).map { id =>
      val src = id / perSource // ids strictly grouped by source
      val center = Array.tabulate(dim)(i => math.sin(src * 37.0 + i).toFloat * 10f)
      (id.toLong, center.map(c => c + rnd.nextFloat() - 0.5f).toSeq)
    }
    rows.toDF("vec_id", "embedding").createOrReplaceTempView("clustered_embeddings")

    val n = nSources * perSource
    val k = TextSim.ivfCellsValue(n)
    val cap = k * TextSim.ivfTrainPerCell
    val sampleSources = spark.sql(
      s"""SELECT DISTINCT CAST(vec_id DIV $perSource AS INT) AS src FROM (
         |  SELECT vec_id FROM clustered_embeddings
         |  ORDER BY ${TextSim.idShuffle("vec_id")}, vec_id LIMIT $cap)""".stripMargin)
      .collect().map(_.getInt(0)).toSet
    assert(sampleSources === (0 until nSources).toSet,
      s"training sample must span every source, saw $sampleSources")

    val cents = graft.queries.TrainingData.trainCentroids(spark, "clustered_embeddings")
    assert(cents.length === k)
    // Assign the full corpus to the trained cells driver-side (500 rows).
    def dist2(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => { val t = a(i) - b(i); acc + t * t })
    val vecs = spark.sql(
      "SELECT transform(embedding, x -> CAST(x AS DOUBLE)) FROM clustered_embeddings")
      .collect().map(_.getSeq[Double](0).toArray)
    val cellSizes = vecs.map { v =>
      val ds = cents.map(c => dist2(v, c)); ds.indexOf(ds.min)
    }.groupBy(identity).map(_._2.length)
    val maxShare = cellSizes.max.toDouble / n
    info(s"clustered-fixture max cell share: $maxShare (cells used: ${cellSizes.size}/$k)")
    assert(maxShare <= 0.40,
      s"cell assignment collapsed on a source-clustered corpus: max share $maxShare")
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
