package graft.tools

import graft.GraftSession
import graft.testfs.HostileFileSystem
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-18 (r17 verdict item 5): price the KV point-lookup floor.
  *
  * The documented floor on both index families: a group-pruned probe
  * for K ids reads K × groupBytes (the whole hit-group files), constant
  * in the corpus but not O(rows-hit) — "a true O(increment) point
  * lookup needs a KV/secondary index outside parquet". This spike
  * measures the one layout change that closes most of that gap WITHOUT
  * leaving parquet-on-FS: sort rows by id WITHIN each group file and
  * bound parquet row-group size, so a pushed `In(id, …)` predicate
  * prunes ROW GROUPS by min/max stats — selected bytes drop from
  * K × groupBytes to ~K × rowGroupBytes while the GET count keeps the
  * grouped layout's O(hit groups) shape (footer + hit pages per file,
  * no extra listings).
  *
  * Three arms over the SAME rows in the SAME `grp = id mod G` layout:
  *  - `unsorted`   — production today: rows in arrival order, default
  *                   128 MB row groups ⇒ In(id) can prune nothing
  *                   inside a hit group;
  *  - `sorted`     — id-sorted within each group file, default row
  *                   groups (one per file at this scale) — isolates
  *                   how much sorting alone buys;
  *  - `sorted_rg`  — id-sorted + `parquet.block.size` bounded (1 MB)
  *                   ⇒ the row-group-pruned point read.
  *
  * Probe answers (count + xor digest over id,payload-hash) are
  * REQUIRED equal across arms. Recorded per probe per arm: task-level
  * input bytes (the page-cache-independent read amplification), the
  * metered hostile-FS op counts (GET/LIST economics), wall for
  * context. The remaining gap to a true KV is then rowGroupBytes /
  * rowBytes — priced in the artifact's reading, to either adopt the
  * layout or keep the floor named with numbers.
  *
  * Env: SPARK_GRAFT_PLB_ROWS (default 3,000,000),
  * SPARK_GRAFT_PLB_GROUPS (default 64),
  * SPARK_GRAFT_PLB_OUT_JSON (artifact file).
  */
object PointLookupBench {

  private def f(d: Double): String = f"$d%.3f".replace(",", ".")

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_PLB_ROWS", "3000000").toLong
    val groups = sys.env.getOrElse("SPARK_GRAFT_PLB_GROUPS", "64").toInt
    val spark = GraftSession.build("graft-pointlookup-bench")
    HostileFileSystem.install(spark.sparkContext.hadoopConfiguration)
    // Above this threshold Spark pushes an In as a [min,max] RANGE
    // filter — which spans everything for spread point ids and turns
    // row-group pruning off (the k=16 saturation the first recording
    // showed). A point-lookup path must push the literal id set.
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
    val sc = spark.sparkContext
    val loadStart = loadavg()
    val localRoot = java.nio.file.Files.createTempDirectory("graft_plb").toString

    // ~300 B/row payload: the scale of a signature/posting/code row.
    // Deterministic from id (no Random — the house determinism rule).
    val base = spark.range(rows).select(
      col("id"),
      pmod(col("id"), lit(groups.toLong)).cast("int").as("grp"),
      sha2(concat(lit("payload-"), col("id").cast("string")), 256).as(s"p1"),
      sha2(concat(lit("pay2-"), col("id").cast("string")), 512).as(s"p2"),
      sha2(concat(lit("pay3-"), col("id").cast("string")), 512).as(s"p3"))

    def write(dir: String, sorted: Boolean, blockBytes: Option[Long],
        bloom: Boolean): Unit = {
      val part = base.repartition(groups, col("grp"))
      // The unsorted arm must model ARRIVAL order honestly: a fold's
      // rows arrive in corpus order, effectively random in id for the
      // page-stat question. spark.range's ascending runs would hand the
      // "unsorted" arm nearly-sorted pages for free — shuffle by a hash
      // column so its page min/max genuinely span the group.
      val laid =
        if (sorted) part.sortWithinPartitions("grp", "id")
        else part.sortWithinPartitions(col("grp"), xxhash64(col("id")))
      val w = laid.write.mode("overwrite")
      blockBytes.foreach(b => w.option("parquet.block.size", b.toString))
      if (bloom) {
        // Per-row-group bloom filter on id: unlike min/max windows,
        // its selectivity does NOT degrade with spread multi-id In
        // lists — the K-robust point-lookup arm. ndv sized per FILE
        // (one group), fpp tight so K probes stay < a few % false
        // row-group matches.
        w.option("parquet.bloom.filter.enabled#id", "true")
        w.option("parquet.bloom.filter.expected.ndv#id", (rows / groups).toString)
        w.option("parquet.bloom.filter.fpp#id", "0.001")
        ()
      }
      w.partitionBy("grp").parquet(dir)
    }
    val arms = Seq(
      ("unsorted", false, None: Option[Long], false),
      ("sorted", true, None, false),
      ("sorted_rg", true, Some(1L << 20), false),
      ("bloom_rg", false, Some(1L << 20), true))
    val dirs = arms.map { case (tag, sorted, block, bloom) =>
      val dir = s"hostile://$localRoot/$tag"
      val t0 = System.nanoTime()
      write(dir, sorted, block, bloom)
      println(s"# wrote $tag in ${f((System.nanoTime() - t0) / 1e9)}s")
      tag -> dir
    }.toMap
    val armBytes = dirs.map { case (tag, dir) =>
      val p = new org.apache.hadoop.fs.Path(dir)
      tag -> p.getFileSystem(sc.hadoopConfiguration).getContentSummary(p).getLength
    }

    // Bytes through the metered FS itself (`readBytes` — r18 counter):
    // task inputMetrics don't track custom schemes, and page-cache
    // effects don't change what the FS was ASKED to read.
    val counter = new graft.JobCounter(sc)
    def metered(body: => (Long, Long)): (Long, Long, Long, Map[String, Long], Double) = {
      counter.settled()
      HostileFileSystem.reset()
      val w0 = System.nanoTime()
      val (n, dig) = body
      val wall = (System.nanoTime() - w0) / 1e9
      counter.settled() // drain stragglers before snapshotting counters
      val c = HostileFileSystem.counts
      (n, dig, c.getOrElse("readBytes", 0L),
        Seq("listStatus", "getFileStatus", "open").map(o => o -> c.getOrElse(o, 0L)).toMap,
        wall)
    }
    def probeRead(dir: String, ids: Seq[Long]): DataFrame = {
      val grps = ids.map(i => (i % groups).toInt).distinct.map(Int.box)
      spark.read.parquet(dir)
        .where(col("grp").isin(grps: _*)) // partition-dir pruning (static)
        .where(col("id").isin(ids.map(Long.box): _*)) // pushed to parquet
    }
    def digest(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("id"), col("p1"))))
        .collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // Deterministic probe ids, spread across the id range.
    def probeIds(k: Int, salt: Int): Seq[Long] =
      (0 until k).map(i => ((i.toLong * 2654435761L + salt * 40503L) % rows + rows) % rows)
        .distinct

    val results = Seq(1, 16, 256).flatMap { k =>
      (0 until 2).map { b =>
        val ids = probeIds(k, b + 1)
        val per = arms.map { case (tag, _, _, _) =>
          val (n, dig, bytes, opsC, wall) = metered(digest(probeRead(dirs(tag), ids)))
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
    val bytesJson = armBytes.map { case (t, by) => s""""$t":$by""" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"point_lookup_pricing","rows":$rows,"groups":$groups,""" +
        s""""cpus":${GraftSession.cpus},"arm_bytes":$bytesJson,"probes":$probesJson,""" +
        s""""loadavg_start":"$loadStart","loadavg_end":"$loadEnd"}"""
    println(json)
    sys.env.get("SPARK_GRAFT_PLB_OUT_JSON").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
