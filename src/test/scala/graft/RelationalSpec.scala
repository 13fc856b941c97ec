package graft

import graft.operators.Relational._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("dedupKeepLast keeps exactly the max-version row per key") {
    val df = Seq(
      ("a", 1, "v1"), ("a", 3, "v3"), ("a", 2, "v2"),
      ("b", 5, "w5"), ("c", 1, "x1")).toDF("k", "version", "payload")
    val out = dedupKeepLast(Seq("k"), Seq(col("version")))(df)
      .orderBy("k").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq(("a", 3, "v3"), ("b", 5, "w5"), ("c", 1, "x1")))
  }

  test("dedupKeepLast matches per-key max over random data") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val rows = List.fill(200)((rnd.nextInt(20), rnd.nextInt(1000)))
      val df = rows.toDF("k", "v").repartition(7)
      val got = dedupKeepLast(Seq("k"), Seq(col("v")))(df)
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(got == want)
    }
  }

  test("sequentialId assigns dense 1..n ids in sort order across partitions") {
    val df = spark.range(1000).select(
      (col("id") * 7919 % 1000).as("k")) // scrambled order
      .repartition(8)
    val out = sequentialId("sid", Seq(col("k")))(df)
      .orderBy("sid").collect().map(r => (r.getLong(1), r.getLong(0)))
    assert(out.map(_._1).toSeq == (1L to 1000L).toSeq, "ids dense 1..n")
    assert(out.map(_._2).toSeq == out.map(_._2).toSeq.sorted, "ids follow sort order")
  }

  test("topKPerGroup returns the k best per group with deterministic ties") {
    val df = Seq(("g1", 10), ("g1", 30), ("g1", 20), ("g1", 40), ("g2", 5))
      .toDF("g", "v")
    val out = topKPerGroup(Seq("g"), Seq(col("v").desc), 2)(df)
      .orderBy("g", "rnk").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out.toSeq == Seq(("g1", 40), ("g1", 30), ("g2", 5)))
  }

  test("withDateParts uses Monday=0 weekday and English names") {
    val df = Seq("2025-09-01", "2025-09-07").toDF("s") // Mon, Sun
      .select(to_date(col("s")).as("d"))
    val out = withDateParts("d")(df).orderBy("d")
      .select("day_of_week", "day_name", "month_name", "quarter")
      .collect()
    assert(out(0) == Row(0L, "Monday", "September", 3L))
    assert(out(1) == Row(6L, "Sunday", "September", 3L))
  }

  test("connectedComponents matches a union-find reference on random and edge-case graphs") {
    import graft.operators.Relational.connectedComponents
    def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val cases: Seq[Seq[(Long, Long)]] = Seq(
      Seq((1L, 2L)),                                   // single pair
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 8L)),     // chain + separate pair
      (1L to 12L).map(i => (i, i + 1)),                // long chain (diameter test)
      Seq((5L, 5L))                                    // self-pair only
    ) ++ Seq(1, 2, 3).map { seed =>
      val rnd = new scala.util.Random(seed)
      Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    }
    cases.foreach { pairs =>
      // Default gate: these graphs are small, so this exercises the
      // driver union-find fast path...
      val got = connectedComponents(pairs.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      CacheJanitor.drain()
      assert(got == unionFind(pairs), s"fast-path mismatch for ${pairs.take(10)}...")
      // ...and gate 0 forces the distributed round loop on the same
      // graph — both paths must agree with the reference exactly.
      val gotDist = connectedComponents(pairs.toDF("a", "b"), smallGraphMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      CacheJanitor.drain()
      assert(gotDist == unionFind(pairs), s"distributed mismatch for ${pairs.take(10)}...")
    }
  }

  test("connectedComponents resolves a chain with diameter far beyond maxRounds (pointer doubling)") {
    import graft.operators.Relational.connectedComponents
    // A 200-hop path: plain one-hop propagation needs 200 rounds and
    // would trip maxRounds=25; label-of-label doubling converges in
    // O(log d) rounds. Also exercises the periodic localCheckpoint
    // (rounds > ccCheckpointEvery would otherwise chain lineage).
    val chain = (1L to 200L).map(i => (i, i + 1))
    // Gate 0 forces the distributed loop — the doubling behavior under
    // test lives there, not in the small-graph union-find.
    val got = connectedComponents(chain.toDF("a", "b"), smallGraphMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheJanitor.drain()
    assert(got.keySet == (1L to 201L).toSet)
    assert(got.values.forall(_ == 1L), s"all chain nodes must resolve to label 1: ${got.toSeq.sortBy(_._1).take(10)}")
  }

  test("connectedComponents with a reliable checkpoint dir matches localCheckpoint mode") {
    import graft.operators.Relational.connectedComponents
    // Same chain as above, but truncating via reliable checkpoint() into
    // a shared dir — the cluster-durable mode (executor loss discards
    // localCheckpoint blocks and fails the job; checkpoint files survive).
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    try {
      val chain = (1L to 60L).map(i => (i, i + 1))
      val got = connectedComponents(chain.toDF("a", "b"), checkpointDir = Some(dir),
          smallGraphMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      CacheJanitor.drain()
      assert(got.keySet == (1L to 61L).toSet)
      assert(got.values.forall(_ == 1L))
      // The reliable path actually wrote checkpoint state to the dir.
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliable checkpoint mode must write to the checkpoint dir")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("a killed run restarts from stored labels instead of from scratch") {
    import graft.operators.Relational.connectedComponents
    // The failure-recovery recipe for the distributed loop: labels are
    // durable state (checkpointed per round; persisted by ClusterLabels
    // between batches), and a label is a connectivity certificate
    // (node—label(node) is a real edge), so a restarted driver resumes
    // by running CC over pairs ∪ stored-label edges — it must converge
    // in O(1) rounds where a cold start needs the full O(log diameter).
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_resume_ckpt").toString
    val store = java.nio.file.Files.createTempDirectory("graft_cc_resume").toString + "/labels"
    try {
      val chain = (1L to 60L).map(i => (i, i + 1))
      // Run 1 (the run that will "crash"): reliable checkpoints on; its
      // label state lands in durable storage (parquet here — the same
      // round-trip a restarted driver performs).
      connectedComponents(chain.toDF("a", "b"), checkpointDir = Some(ckpt),
        smallGraphMaxEdges = 0L).write.parquet(store)
      CacheJanitor.drain()
      // A COLD restart limited to 3 rounds cannot finish a 60-chain
      // (convergence needs ~8 rounds even with pointer doubling)...
      val cold = intercept[IllegalArgumentException] {
        connectedComponents(chain.toDF("a", "b"), maxRounds = 3, smallGraphMaxEdges = 0L)
      }
      assert(cold.getMessage.contains("did not converge"))
      CacheJanitor.drain()
      // ...but the SAME budget resumes fine from the stored labels.
      val stored = spark.read.parquet(store)
      val resumed = connectedComponents(
        chain.toDF("a", "b").union(stored.toDF("a", "b")),
        maxRounds = 3, smallGraphMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      CacheJanitor.drain()
      assert(resumed.keySet == (1L to 61L).toSet)
      assert(resumed.values.forall(_ == 1L),
        s"resumed labels must match the finished run: ${resumed.toSeq.sortBy(_._1).take(5)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("melt unpivots columns into (variable, value) rows") {
    val df = Seq((1, 10.0, 20.0)).toDF("id", "a", "b")
    val out = melt(Seq("id"), Seq("a", "b"), "variable", "value")(df)
      .orderBy("variable").collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("a", 10.0), ("b", 20.0)))
  }
}
