package graft.tools

import graft.GraftSession
import graft.operators.SignatureIndex
import graft.testfs.HostileFileSystem
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-19 (r18 verdict item 1): the point-lookup layout, measured
  * through the PRODUCTION fold path — not the synthetic-writer ladder
  * [[PointLookupBench]] priced in r18, but `SignatureIndex.ingest` →
  * `compact` → [[SignatureIndex.fetch]] — the exact code a takedown
  * verification / spot audit runs.
  *
  * Two roots, both built by the SAME production calls over the SAME
  * corpus:
  *
  *  - **adopted** — the r19 default: compaction sorts rows by doc_id
  *    within each `dgrp=` group and bounds parquet row groups at 1 MB
  *    ([[graft.operators.BatchLog.pointLookupWriteOptions]]);
  *  - **legacy** — `graft.fold.point.layout.disable=true` around its
  *    compact: the pre-r19 arrival-order fold (the rollback switch,
  *    doubling as the contrast arm).
  *
  * Probes run [[SignatureIndex.fetch]] at K ∈ {1, 16, 256}; answers
  * (row count + xor digest over doc_id and a shingle-array hash) are
  * REQUIRED equal across arms. Metered on hostile:// — `readBytes`
  * (the read-amplification signal; task inputMetrics don't see custom
  * schemes) plus listStatus/getFileStatus/open (GET/LIST economics).
  *
  * The fold-group byte floor is overridden to `SPARK_GRAFT_PLP_GROUP_MB`
  * (default 8 MB) for BOTH arms: at the default 512 KB floor a group
  * file IS one ~512 KB row group and the layouts coincide; the regime
  * the adoption targets is the 65536-group cap at corpus scale, where
  * group bytes = logBytes/65536 (a 1 TB signature log ⇒ ~16 MB groups)
  * — the override reproduces that group size at a benchable corpus,
  * with the layout as the ONLY contrast.
  *
  * Env: SPARK_GRAFT_PLP_DOCS (default 2,000,000),
  * SPARK_GRAFT_PLP_GROUP_MB (default 8),
  * SPARK_GRAFT_PLP_OUT_JSON (artifact file).
  */
object ProdLookupBench {

  private def f(d: Double): String = f"$d%.3f".replace(",", ".")

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_PLP_DOCS", "2000000").toLong
    val groupMb = sys.env.getOrElse("SPARK_GRAFT_PLP_GROUP_MB", "8").toLong
    val spark = GraftSession.build("graft-prodlookup-bench")
    HostileFileSystem.install(spark.sparkContext.hadoopConfiguration)
    graft.functions.GraftFunctions.registerAll(spark)
    val sc = spark.sparkContext
    val loadStart = loadavg()
    val localRoot = java.nio.file.Files.createTempDirectory("graft_plp").toString

    sys.props("graft.fold.group.bytes") = (groupMb << 20).toString
    // Unique-vocabulary corpus (no cross-doc shingles): signature rows
    // of uniform size, the fetch-side shape without dedup noise.
    val corpus = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 9).map(j =>
        concat(lit("w"), col("id"), lit(s"x$j"))): _*).as("text"))

    def build(tag: String, disable: Boolean): (String, Double, Double) = {
      val root = s"hostile://$localRoot/$tag"
      val t0 = System.nanoTime()
      SignatureIndex.ingest(spark, root, corpus, batchKey = Some("b1"))
      graft.CacheJanitor.drain()
      val t1 = System.nanoTime()
      if (disable) sys.props("graft.fold.point.layout.disable") = "true"
      try SignatureIndex.compact(spark, root)
      finally if (disable) sys.props -= "graft.fold.point.layout.disable"
      graft.CacheJanitor.drain()
      val t2 = System.nanoTime()
      println(s"# built $tag ingest=${f((t1 - t0) / 1e9)}s compact=${f((t2 - t1) / 1e9)}s")
      (root, (t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }
    val (adoptedRoot, _, compactAdopted) = build("adopted", disable = false)
    val (legacyRoot, _, compactLegacy) = build("legacy", disable = true)

    def logBytes(root: String): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$root/signatures")
      p.getFileSystem(sc.hadoopConfiguration).getContentSummary(p).getLength
    }
    val adoptedBytes = logBytes(adoptedRoot)
    val legacyBytes = logBytes(legacyRoot)

    val counter = new graft.JobCounter(sc)
    def metered(body: => (Long, Long)): (Long, Long, Long, Map[String, Long], Double) = {
      counter.settled()
      HostileFileSystem.reset()
      val w0 = System.nanoTime()
      val (n, dig) = body
      val wall = (System.nanoTime() - w0) / 1e9
      counter.settled()
      val c = HostileFileSystem.counts
      (n, dig, c.getOrElse("readBytes", 0L),
        Seq("listStatus", "getFileStatus", "open").map(o => o -> c.getOrElse(o, 0L)).toMap,
        wall)
    }
    def digest(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("doc_id"), aggregate(col("shs"), lit(7L),
          (h, x) => pmod(h * lit(131) + x, lit(1000000007L)))))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // Deterministic spread probe ids (the PLB generator).
    def probeIds(k: Int, salt: Int): Seq[Long] =
      (0 until k).map(i => ((i.toLong * 2654435761L + salt * 40503L) % nDocs + nDocs) % nDocs)
        .distinct

    val arms = Seq("adopted" -> adoptedRoot, "legacy" -> legacyRoot)
    val results = Seq(1, 16, 256).flatMap { k =>
      (0 until 2).map { b =>
        val ids = probeIds(k, b + 1)
        val per = arms.map { case (tag, root) =>
          val (n, dig, bytes, opsC, wall) =
            metered(digest(SignatureIndex.fetch(spark, root, ids)))
          println(s"#   k=$k b=$b $tag rows=$n bytes=${bytes / 1024}KB " +
            s"stat=${opsC("getFileStatus")} open=${opsC("open")} wall=${f(wall)}s")
          (tag, n, dig, bytes, opsC, wall)
        }
        require(per.map(p => (p._2, p._3)).distinct.size == 1,
          s"arms diverged at k=$k b=$b: ${per.map(p => (p._1, p._2, p._3))}")
        (k, b, ids.size, per)
      }
    }

    val loadEnd = loadavg()
    def opJson(c: Map[String, Long]): String =
      Seq("listStatus", "getFileStatus", "open").map(o => s""""$o":${c(o)}""").mkString("{", ",", "}")
    val probesJson = results.map { case (k, b, nIds, per) =>
      val armsJson = per.map { case (tag, n, _, bytes, opsC, wall) =>
        s""""$tag":{"rows":$n,"input_bytes":$bytes,"ops":${opJson(opsC)},"wall_sec":${f(wall)}}"""
      }.mkString(",")
      s"""{"k":$k,"batch":$b,"ids":$nIds,$armsJson}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"prod_point_lookup","docs":$nDocs,"group_mb":$groupMb,""" +
        s""""cpus":${GraftSession.cpus},""" +
        s""""log_bytes":{"adopted":$adoptedBytes,"legacy":$legacyBytes},""" +
        s""""compact_sec":{"adopted":${f(compactAdopted)},"legacy":${f(compactLegacy)}},""" +
        s""""probes":$probesJson,""" +
        s""""loadavg_start":"$loadStart","loadavg_end":"$loadEnd"}"""
    println(json)
    sys.env.get("SPARK_GRAFT_PLP_OUT_JSON").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
