package graft.tools

import graft.GraftSession
import graft.operators.{BatchLog, SignatureIndex}
import graft.testfs.HostileFileSystem
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16: price the SORTED-FOLD + pushed-In alternative with OP
  * COUNTERS (r15 verdict item 4 — the r14 rejection was priced on warm
  * -local wall-clock, where the IO that layout skips is free; the
  * carried note says re-evaluate for cold object storage, and the
  * metered hostile FS can now do that).
  *
  * Same corpus, same probe keys, two layouts of the POSTINGS fold:
  *
  *  - **grouped** (production): `hgrp = h mod G` partition dirs, probe
  *    reads only the hit groups (manifest-served planning, partition
  *    -filter pruning) — per probe ≈ |hit groups| file opens, zero
  *    listings;
  *  - **sorted**: one flat directory globally range-sorted on `h`,
  *    probe pushes `In(h, keys)` to parquet — row-group stats prune
  *    PAGES, but every file's FOOTER must still be read at execution
  *    (planning cannot see value ranges), so per probe ≥ |files| opens
  *    whatever K is.
  *
  * Probe answers (count + xor digest) are required equal across arms.
  * The artifact records listStatus/getFileStatus/open per probe per
  * arm — the GET/LIST economics a cold object store bills — plus
  * wall-clock for context (quoted second, per the house rule).
  *
  * Env: SPARK_GRAFT_SF_DIR (seed, default sf0.1),
  * SPARK_GRAFT_SORTED_FACTOR (corpus replicas, default 20),
  * SPARK_GRAFT_SORTED_OUT_JSON (artifact file).
  */
object SortedFoldBench {

  private def f(d: Double): String = f"$d%.3f".replace(",", ".")

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

  def main(args: Array[String]): Unit = {
    val seedDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SORTED_FACTOR", "20").toInt
    val spark = GraftSession.build("graft-sortedfold-bench")
    HostileFileSystem.install(spark.sparkContext.hadoopConfiguration)
    graft.functions.GraftFunctions.registerAll(spark)
    val loadStart = loadavg()
    val localRoot = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    val root = s"hostile://$localRoot/root"
    val sortedDir = s"hostile://$localRoot/sorted_postings"

    val seedDocs = spark.read.parquet(s"$seedDir/documents.parquet")
    val corpus = (0 until factor).map(ScaleBench.saltedDocs(seedDocs, _))
      .reduce(_ unionAll _).select("doc_id", "text")

    // --- grouped arm: the production fold ---------------------------
    val t0 = System.nanoTime()
    SignatureIndex.ingest(spark, root, corpus, batchKey = Some("bulk"))
    graft.CacheJanitor.drain()
    SignatureIndex.compact(spark, root)
    println(s"# bootstrap+compact ${f((System.nanoTime() - t0) / 1e9)}s")

    val postDir = SignatureIndex.postingsDir(root)
    val foldKeys = BatchLog.committedKeys(spark, postDir)
    val gByKey = foldKeys.map(k => k -> BatchLog.readGroupsSidecar(spark,
      BatchLog.dirOfResolved(spark, postDir, k), SignatureIndex.hgrpSidecarName)).toMap
    require(gByKey.values.forall(_.isDefined),
      s"postings fold must be hgrp-grouped for this pricing: $gByKey")
    println(s"# postings fold keys=$foldKeys G=${gByKey.values.flatten.toSeq.sorted}")

    // --- sorted arm: same rows, globally range-sorted on h -----------
    val allPostings = BatchLog.read(spark, postDir, "sortedfold")
      .select("h", "doc_id")
    val totalBytes = {
      val p = new org.apache.hadoop.fs.Path(postDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    }
    // ~64 MB target files: big enough that footers amortize on warm
    // storage, the shape a production sorted layout would choose.
    val files = math.max(4, (totalBytes / (64L << 20)).toInt)
    val t1 = System.nanoTime()
    allPostings.repartitionByRange(files, col("h"))
      .sortWithinPartitions("h")
      .write.mode("overwrite").parquet(sortedDir)
    println(s"# sorted rewrite ${f((System.nanoTime() - t1) / 1e9)}s files=$files " +
      s"(grouped fold bytes=${totalBytes / (1 << 20)}MB)")
    graft.CacheJanitor.drain()

    // --- probes: the distinct shingle hashes of 1 and 5 sample docs --
    def probeKeys(nDocs: Int, salt: Int): Array[Long] = {
      val ids = seedDocs.where(pmod(col("doc_id"), lit(97)) === lit(salt))
        .orderBy("doc_id").limit(nDocs).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      allPostings.where(col("doc_id").isin(ids.map(Long.box).toSeq: _*))
        .select("h").distinct().collect().map(_.getLong(0))
    }

    val ops = Seq("listStatus", "getFileStatus", "open")
    def metered(body: => (Long, Long)): (Long, Long, Map[String, Long], Double) = {
      HostileFileSystem.reset()
      val w0 = System.nanoTime()
      val (n, dig) = body
      val wall = (System.nanoTime() - w0) / 1e9
      val c = HostileFileSystem.counts
      graft.CacheJanitor.drain()
      (n, dig, ops.map(o => o -> c.getOrElse(o, 0L)).toMap, wall)
    }
    def digest(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("h"), col("doc_id"))))
        .collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    val probes = Seq(("1doc", 1), ("5doc", 5)).flatMap { case (tag, n) =>
      (0 until 3).map { b =>
        val keys = probeKeys(n, b + 1)
        val boxed = keys.map(Long.box).toSeq
        graft.CacheJanitor.drain()
        // grouped: manifest-planned fold read, hit groups only, h In keys
        val (nG, dG, cG, wG) = metered {
          val frames = foldKeys.sorted.map { k =>
            val g = gByKey(k).get
            val groups = keys.map(h => java.lang.Math.floorMod(h, g.toLong).toInt)
              .distinct.map(Int.box).toSeq
            BatchLog.readKeysWithKey(spark, postDir, Seq(k), "sortedfold")
              .where(col(SignatureIndex.hgrpCol).isin(groups: _*))
              .drop(SignatureIndex.hgrpCol).drop("batch_key")
          }
          digest(frames.reduce(_ unionByName _).where(col("h").isin(boxed: _*)))
        }
        // sorted: flat read, In(h, keys) pushed to parquet row groups
        val (nS, dS, cS, wS) = metered {
          digest(spark.read.parquet(sortedDir).where(col("h").isin(boxed: _*)))
        }
        require(nG == nS && dG == dS,
          s"arms diverged at $tag/$b: ($nG,$dG) vs ($nS,$dS)")
        println(s"#   $tag probe $b keys=${keys.length} rows=$nG | grouped " +
          s"list=${cG("listStatus")} stat=${cG("getFileStatus")} open=${cG("open")} wall=${f(wG)}s" +
          s" | sorted list=${cS("listStatus")} stat=${cS("getFileStatus")} open=${cS("open")} wall=${f(wS)}s")
        (tag, b, keys.length, nG, cG, wG, cS, wS)
      }
    }

    val loadEnd = loadavg()
    def opJson(c: Map[String, Long]): String =
      ops.map(o => s""""$o":${c(o)}""").mkString("{", ",", "}")
    val probesJson = probes.map { case (tag, b, k, n, cG, wG, cS, wS) =>
      s"""{"probe":"$tag","batch":$b,"keys":$k,"rows":$n,""" +
        s""""grouped":${opJson(cG)},"grouped_wall_sec":${f(wG)},""" +
        s""""sorted":${opJson(cS)},"sorted_wall_sec":${f(wS)}}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"sortedfold_pricing","seed":"$seedDir","factor":$factor,""" +
        s""""cpus":${GraftSession.cpus},"sorted_files":$files,""" +
        s""""fold_groups":${gByKey.values.flatten.max},""" +
        s""""probes":$probesJson,""" +
        s""""loadavg_start":"$loadStart","loadavg_end":"$loadEnd"}"""
    println(json)
    sys.env.get("SPARK_GRAFT_SORTED_OUT_JSON").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
