package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the incremental-join-maintenance claim
  * (BASELINE.md): given a materialized fact⋈fact view on disk and a
  * small per-side changeset, `IncrementalJoin.applyCdc` must beat the
  * from-scratch re-join — the delta fold replaces the full shuffle join
  * of the two fact tables with scans + broadcast-sized delta joins.
  *
  * Fixture: lineitem (A, row key = l_orderkey·8 + l_linenumber) ⋈ orders
  * (B, keyed by the join key o_orderkey — the row-key==join-key shape).
  * Changes: `deltaPct`% of lineitem rows payload-updated (del+ins, same
  * row key) and a quarter as many orders rows updated — both sides fire,
  * including the aSnapshot probe path (semi-pruned by ΔB's join keys).
  *
  * Both paths end in `.count()` over the complete new view, so the
  * numbers compare the JOIN MACHINERY (delta fold vs full shuffle join)
  * at identical output; the storage-side win (tombstones vs full
  * rewrite) is a separate, additive effect not measured here. Reps are
  * reported individually — rep0 carries JIT/readahead warmup (the
  * BASELINE.md measurement discipline).
  *
  * Usage: `runMain graft.IvmProbe <sfDir> [deltaPct] [reps]`
  */
object IvmProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val deltaPct = if (args.length > 1) args(1).toInt else 1
    val reps = if (args.length > 2) args(2).toInt else 3
    // non-divisors would silently shift the ACTUAL updated fraction
    // (mod = 100/deltaPct truncates) while the JSON reported the request
    require(deltaPct >= 1 && deltaPct <= 50 && 100 % deltaPct == 0,
      s"deltaPct must divide 100 (got $deltaPct) so the reported " +
        "fraction is the applied one")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // no spark.driver.memory here: the JVM is already running (sbt fork
    // options own the heap) and a builder config would be a silent no-op
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ivmprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.IncrementalJoin

    val joinKeys = Seq("o_orderkey")
    // the A-side row key must honor applyCdc's uniqueness contract —
    // GenData's (l_orderkey, l_linenumber) pairs COLLIDE (independent
    // hashes of the row id; ~24% of sf0.01 rows share a composite), so
    // the key is minted fresh at staging time and all consumers read the
    // STAGED table, never re-derive it
    def lineitemRaw: DataFrame = sources.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"),
        col("l_quantity"), col("l_extendedprice"))
      .withColumn("l_rowid", monotonically_increasing_id())
      .select("l_rowid", "o_orderkey", "l_quantity", "l_extendedprice")
    def orders: DataFrame = sources.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))

    // STAGE every input to parquet first — in deployment the CDC batch
    // and the post-change snapshots are GIVEN (landed by the ingest
    // pipeline), and the view exists; deriving them inline would bill
    // repeated base-table scans to the maintenance path that it never
    // pays in production. The timed section below reads everything from
    // disk on both paths.
    val root = java.nio.file.Files.createTempDirectory("graft-ivmprobe").toString
    def rd(name: String): DataFrame = spark.read.parquet(s"$root/$name")
    val mod = 100 / deltaPct
    // stage the keyed A base FIRST and derive everything from the staged
    // copy — monotonically_increasing_id is only stable within one write
    lineitemRaw.write.parquet(s"$root/a_base")
    def lineitem: DataFrame = rd("a_base")
    val (nA, nAk) = (lineitem.count(),
      lineitem.select("l_rowid").distinct().count())
    require(nA == nAk, s"staged row key not unique: $nA rows, $nAk keys")
    val stage = Map(
      "view" -> IncrementalJoin.joinState(lineitem, orders, joinKeys),
      "a_del" -> lineitem.filter(col("l_rowid") % mod === 0).select("l_rowid"),
      "a_ins" -> lineitem.filter(col("l_rowid") % mod === 0)
        .withColumn("l_quantity", col("l_quantity") + 100.0),
      "b_del" -> orders.filter(col("o_orderkey") % (mod * 4) === 0)
        .select("o_orderkey"),
      "b_ins" -> orders.filter(col("o_orderkey") % (mod * 4) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 10.0),
      "a_new" -> lineitem.filter(col("l_rowid") % mod =!= 0).unionByName(
        lineitem.filter(col("l_rowid") % mod === 0)
          .withColumn("l_quantity", col("l_quantity") + 100.0)),
      "b_new" -> orders.filter(col("o_orderkey") % (mod * 4) =!= 0).unionByName(
        orders.filter(col("o_orderkey") % (mod * 4) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 10.0)))
    stage.foreach { case (name, df) => df.write.parquet(s"$root/$name") }

    // wall-clock alone misleads here: on one box the shuffle is a local
    // file copy, so the fold's extra view-scan bytes mask the claim that
    // matters on a cluster — WHAT CROSSES THE NETWORK. Track shuffle
    // write volume per timed section; at 1000 executors that volume is
    // the bottleneck term.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleRecs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) {
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            shuffleRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          }
        }
      })

    def time(f: => Long): (Double, Long, Double, Long) = {
      // listener events are async (no public drain API); poll until the
      // counters stop moving — fine for a measurement tool
      def settle(): Unit = {
        var prev = -1L
        while (prev != shuffleBytes.get + shuffleRecs.get) {
          prev = shuffleBytes.get + shuffleRecs.get
          Thread.sleep(300)
        }
      }
      settle()
      val (b0, r0) = (shuffleBytes.get, shuffleRecs.get)
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      settle()
      (sec, n, (shuffleBytes.get - b0) / 1e6, shuffleRecs.get - r0)
    }

    val out = new StringBuilder
    out.append(s"""{"probe":"ivm","sf_dir":"$sfDir","delta_pct":$deltaPct""")
    (0 until reps).foreach { r =>
      val (tScratch, nScratch, mbScratch, rcScratch) = time(
        IncrementalJoin.joinState(rd("a_new"), rd("b_new"), joinKeys).count())
      val (tMaint, nMaint, mbMaint, rcMaint) = time(
        IncrementalJoin.applyCdc(rd("view"),
          "l_rowid", "o_orderkey", joinKeys,
          rd("a_ins"), rd("a_del"), rd("b_ins"), rd("b_del"),
          rd("a_new"), rd("b_new")).count())
      require(nScratch == nMaint,
        s"row mismatch: scratch=$nScratch maintained=$nMaint")
      out.append(
        f""","rep$r":{"scratch_sec":$tScratch%.2f,"scratch_shuffle_mb":$mbScratch%.1f,"scratch_shuffle_rows":$rcScratch,""" +
        f""""maintained_sec":$tMaint%.2f,"maintained_shuffle_mb":$mbMaint%.1f,"maintained_shuffle_rows":$rcMaint,"rows":$nMaint}""")
    }
    out.append("}")
    println(out.result())
    // the staged copies are multi-GB at sf10 — drop them with the run
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(rootPath, true)
    spark.stop()
  }
}
