package graft

import java.nio.file.{Files, Paths}

import graft.operators.{BatchLog, ClusterLabels}

/** The label-stats sidecar chain: the health poll's totals must come
  * from O(1) metadata when the chain is intact, fall back to the exact
  * fold on ANY anomaly, and heal at compaction. Every assertion
  * compares against the keep-last fold (the source of truth), so a
  * sidecar bug can only fail loudly here — never mis-report. The x100
  * loop measured the fold at ~16 µs/doc per poll; this chain is what
  * removes that corpus-linear maintain tax. */
class LabelStatsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(ps: (Long, Long)*) =
    ps.toDF("doc_a", "doc_b")
  private def docs(ids: Long*) =
    if (ids.isEmpty) spark.range(0).selectExpr("id AS doc_id")
    else ids.toDF("doc_id")

  /** The exact fold — what every sidecar answer must equal. */
  private def foldTruth(root: String): (Long, Long) = {
    val t = ClusterLabels.read(spark, root)
    (t.count(), t.where($"doc_id" === $"label").count())
  }

  private def sidecarPath(root: String, key: String) =
    Paths.get(BatchLog.dirOfResolved(spark, ClusterLabels.dir(root), BatchLog.sanitize(key)),
      "_label_stats.json")

  test("keySetHash: order-insensitive, length-delimited, collision-resistant width") {
    // The hash is the fast path's ONLY soundness gate — SHA-256 so a
    // stale sidecar's set can't collide with the current set, and
    // length-delimited so adjacent keys can't re-segment into the same
    // digest input.
    assert(ClusterLabels.keySetHash(Seq("x", "y")) == ClusterLabels.keySetHash(Seq("y", "x")))
    assert(ClusterLabels.keySetHash(Seq("ab", "c")) != ClusterLabels.keySetHash(Seq("a", "bc")))
    assert(ClusterLabels.keySetHash(Seq("b1")) != ClusterLabels.keySetHash(Seq("b1", "b2")))
    assert(ClusterLabels.keySetHash(Nil).length == 64, "hex SHA-256 digest")
  }

  test("fast path == fold across merges, including a keeper demotion") {
    val root = Files.createTempDirectory("graft_lstats").toString
    ClusterLabels.merge(spark, root, pairs(1L -> 2L), docs(1L, 2L, 5L), Some("b1"))
    val d1 = ClusterLabels.labelStatsDetail(spark, root)
    assert(d1._4, "an intact 1-batch chain must serve from the sidecar")
    assert((d1._2, d1._3) == foldTruth(root)) // {1,2} + singleton 5

    ClusterLabels.merge(spark, root, pairs(3L -> 4L), docs(3L, 4L), Some("b2"))
    // Bridge 2–3: components {1,2} and {3,4} merge; doc 3 loses its
    // keeper status — the incremental keepers arithmetic must subtract
    // the demoted member, not just add.
    ClusterLabels.merge(spark, root, pairs(2L -> 3L), docs(), Some("b3"))
    val d3 = ClusterLabels.labelStatsDetail(spark, root)
    assert(d3._4, "an intact 3-batch chain must serve from the sidecar")
    assert((d3._2, d3._3) == foldTruth(root))
    assert(d3._2 == 5 && d3._3 == 2, s"{1,2,3,4} under 1 plus singleton 5: $d3")
  }

  test("replaying an existing key stays exact (the replay pays one fold)") {
    val root = Files.createTempDirectory("graft_lstats_replay").toString
    ClusterLabels.merge(spark, root, pairs(1L -> 2L), docs(1L, 2L), Some("b1"))
    ClusterLabels.merge(spark, root, pairs(3L -> 4L), docs(3L, 4L), Some("b2"))
    // Crash-retry shape: the same landing batch lands again under its
    // key. The dir overwrites itself; the sidecar must NOT double-count.
    ClusterLabels.merge(spark, root, pairs(3L -> 4L), docs(3L, 4L), Some("b2"))
    val d = ClusterLabels.labelStatsDetail(spark, root)
    assert(d._4, "the replay writes a fresh exact sidecar")
    assert((d._2, d._3) == foldTruth(root))
    assert(d._2 == 4 && d._3 == 2, d)
  }

  test("a MIDDLE sidecar gap keeps the fast path (only the newest is consulted)") {
    // Every written sidecar carries exact totals by induction, so a gap
    // in an OLDER batch's sidecar must not disable the O(1) poll — the
    // newest sidecar alone serves it (the pre-round-11 check demanded
    // every directory carry one, paying corpus folds for a gap that
    // changed nothing).
    val root = Files.createTempDirectory("graft_lstats_midgap").toString
    ClusterLabels.merge(spark, root, pairs(1L -> 2L), docs(1L, 2L), Some("b1"))
    ClusterLabels.merge(spark, root, pairs(2L -> 3L), docs(3L), Some("b2"))
    Files.delete(sidecarPath(root, "b1")) // a crashed OLD sidecar, simulated
    val d = ClusterLabels.labelStatsDetail(spark, root)
    assert(d._4, "a middle gap must not force the fold — the newest sidecar is exact")
    assert((d._2, d._3) == foldTruth(root))
    // And the next merge stays incremental (its arithmetic reads only
    // the newest predecessor sidecar).
    ClusterLabels.merge(spark, root, pairs(4L -> 5L), docs(4L, 5L), Some("b3"))
    val dn = ClusterLabels.labelStatsDetail(spark, root)
    assert(dn._4 && (dn._2, dn._3) == foldTruth(root))
  }

  test("a missing NEWEST sidecar degrades to the fold; ONE merge heals it (no compaction needed)") {
    val root = Files.createTempDirectory("graft_lstats_tailgap").toString
    ClusterLabels.merge(spark, root, pairs(1L -> 2L), docs(1L, 2L), Some("b1"))
    ClusterLabels.merge(spark, root, pairs(2L -> 3L), docs(3L), Some("b2"))
    Files.delete(sidecarPath(root, "b2")) // the crashed-merge shape: newest dir, no sidecar
    val d = ClusterLabels.labelStatsDetail(spark, root)
    assert(!d._4, "a tail gap must force the fold (the surviving newest sidecar is stale)")
    assert((d._2, d._3) == foldTruth(root), "the fallback is the exact fold")

    // The next merge detects the stale chain, pays ONE heal fold, and its
    // own sidecar restores the fast path — previously only compaction did.
    ClusterLabels.merge(spark, root, pairs(4L -> 5L), docs(4L, 5L), Some("b3"))
    val dh = ClusterLabels.labelStatsDetail(spark, root)
    assert(dh._4, "one healing merge must restore the O(1) poll")
    assert((dh._2, dh._3) == foldTruth(root))

    // Compaction still heals too (and stays exact).
    Files.delete(sidecarPath(root, "b3"))
    ClusterLabels.compact(spark, root)
    val dc = ClusterLabels.labelStatsDetail(spark, root)
    assert(dc._4 && (dc._2, dc._3) == foldTruth(root))
  }

  test("a torn sidecar file is survived loudly: fallback, never a throw or a wrong answer") {
    val root = Files.createTempDirectory("graft_lstats_torn").toString
    ClusterLabels.merge(spark, root, pairs(1L -> 2L), docs(1L, 2L), Some("b1"))
    Files.write(sidecarPath(root, "b1"), "{\"batch\": 1, \"labell".getBytes("UTF-8"))
    val d = ClusterLabels.labelStatsDetail(spark, root)
    assert(!d._4)
    assert((d._2, d._3) == foldTruth(root))
  }
}
