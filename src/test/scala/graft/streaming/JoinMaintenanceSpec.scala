package graft.streaming

import graft.SparkTestBase
import graft.operators.{IncrementalAgg, IncrementalJoin}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming == batch for JOIN-view maintenance: after AvailableNow
  * drains an op-tagged CDC log against a static dimension, the
  * materialized view equals joinState(final A, B) exactly — and a full
  * replay into the existing view is a no-op (the touched-keys anti makes
  * per-batch folding idempotent). Slices touch DISJOINT key sets so the
  * final state is independent of file-arrival order. */
class JoinMaintenanceSpec extends SparkTestBase {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("CDC log drains into exactly joinState(final A, B); replay is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-joinmaint")
    val cdcDir = s"$root/cdc"
    val bDir = s"$root/dim"
    val viewDir = s"$root/view"

    // A side: orders keyed by o_orderkey joining the customer dim on
    // custkey. Initial A = custkey-matched orders with orderkey % 4 == 1
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val custDim = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"),
        col("c_acctbal"))
    custDim.write.parquet(bDir)

    val a0 = orders.filter(col("o_orderkey") % 4 === 1)
    IncrementalJoin.joinState(a0, custDim, Seq("o_custkey"))
      .write.parquet(viewDir)

    // three disjoint-key CDC slices:
    //  slice 0: INSERT the % 4 == 2 orders
    //  slice 1: DELETE the % 3 == 0 half of the initial keys
    //  slice 2: UPDATE (full new row under 'U') the % 3 == 1 initial keys
    val ins = orders.filter(col("o_orderkey") % 4 === 2)
      .withColumn("op", lit("I"))
    val del = a0.filter(col("o_orderkey") % 3 === 0)
      .withColumn("op", lit("D"))
    val upd = a0.filter(col("o_orderkey") % 3 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .withColumn("op", lit("U"))
    Seq(ins, del, upd).foreach(
      _.coalesce(1).write.mode("append").parquet(cdcDir))

    val q = JoinMaintenance.maintainJoinView(spark, cdcDir, bDir, viewDir,
      s"$root/chk", aKey = "o_orderkey", bKey = "o_custkey",
      joinKeys = Seq("o_custkey"), maxFilesPerTrigger = 1)
    q.awaitTermination()

    val aFinal = a0
      .filter(col("o_orderkey") % 3 =!= 0)
      .filter(col("o_orderkey") % 3 =!= 1)
      .unionByName(upd.drop("op"))
      .unionByName(ins.drop("op"))
    val want = IncrementalJoin.joinState(aFinal, custDim, Seq("o_custkey"))
    val got = spark.read.parquet(viewDir)
    assert(got.columns.sorted.toSeq == want.columns.sorted.toSeq)
    assert(canon(got.select(want.columns.map(col): _*)) == canon(want))
    // the change classes all genuinely fired
    assert(got.filter(col("o_orderkey") % 4 === 2).count() > 0, "inserts landed")
    assert(got.filter(col("o_orderkey") % 4 === 1 && col("o_orderkey") % 3 === 0)
      .count() == 0, "deletes removed their pairs")
    assert(del.count() > 0 && upd.count() > 0)

    // REPLAY falsifier: a fresh checkpoint refolds every slice into the
    // ALREADY-MAINTAINED view — the touched-keys anti must make that a
    // bit-identical no-op, where a blind union would duplicate pairs
    val q2 = JoinMaintenance.maintainJoinView(spark, cdcDir, bDir, viewDir,
      s"$root/chk_replay", "o_orderkey", "o_custkey",
      Seq("o_custkey"), maxFilesPerTrigger = 1)
    q2.awaitTermination()
    assert(canon(spark.read.parquet(viewDir).select(want.columns.map(col): _*))
      == canon(want), "replaying every batch must be a no-op")
  }

  test("invalid or NULL op values raise loudly instead of silently dropping the change") {
    val root = java.nio.file.Files.createTempDirectory("graft-joinbadop")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(5)
    val custDim = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    custDim.write.parquet(s"$root/dim")
    orders.withColumn("op", lit("d")).coalesce(1) // lowercase: not a valid op
      .write.parquet(s"$root/cdc")
    val q = JoinMaintenance.maintainJoinView(spark, s"$root/cdc", s"$root/dim",
      s"$root/view", s"$root/chk", "o_orderkey", "o_custkey", Seq("o_custkey"))
    val e = intercept[Exception](q.awaitTermination())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("invalid op value")),
      s"expected the loud op guard, got: ${e.getMessage}")
  }

  test("a PARTITIONED seed view is detected as existing state, not bootstrapped over") {
    val root = java.nio.file.Files.createTempDirectory("graft-joinpart")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val custDim = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    custDim.write.parquet(s"$root/dim")
    val a0 = orders.filter(col("o_orderkey") % 8 === 1)
    // Hive-style layout: the parquet files live in subdirectories
    graft.operators.IncrementalJoin.joinState(a0, custDim, Seq("o_custkey"))
      .write.partitionBy("o_custkey").parquet(s"$root/view")
    val ins = orders.filter(col("o_orderkey") % 8 === 2).withColumn("op", lit("I"))
    ins.coalesce(1).write.parquet(s"$root/cdc")
    val q = JoinMaintenance.maintainJoinView(spark, s"$root/cdc", s"$root/dim",
      s"$root/view", s"$root/chk", "o_orderkey", "o_custkey", Seq("o_custkey"))
    q.awaitTermination()
    val want = graft.operators.IncrementalJoin.joinState(
      a0.unionByName(ins.drop("op")), custDim, Seq("o_custkey"))
    val got = spark.read.parquet(s"$root/view")
    assert(got.count() == want.count(),
      "the seeded partitioned view must survive the fold — an empty-view " +
        "bootstrap would have discarded it")
    assert(canon(got.select(want.columns.map(col): _*)) == canon(want))
  }

  test("starting ahead of the CDC producer requires an explicit schema, loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-joinahead")
    val e = intercept[IllegalArgumentException](
      JoinMaintenance.maintainJoinView(spark, s"$root/cdc_missing", s"$root/dim",
        s"$root/view", s"$root/chk", "o_orderkey", "o_custkey", Seq("o_custkey")))
    assert(e.getMessage.contains("pass schema="))
  }

  test("leftJoin mode: dimension-less A rows ride null-extended through the fold") {
    val root = java.nio.file.Files.createTempDirectory("graft-joinleft")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // only even custkeys exist in the dim — odd-custkey orders must
    // survive null-extended, and a blind inner fold would LOSE them
    val custDim = Tables.load(spark, sf(), "customer")
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    custDim.write.parquet(s"$root/dim")
    val a0 = orders.filter(col("o_orderkey") % 4 === 1)
    graft.operators.IncrementalJoin.joinStateLeft(a0, custDim, Seq("o_custkey"))
      .write.parquet(s"$root/view")
    val ins = orders.filter(col("o_orderkey") % 4 === 2).withColumn("op", lit("I"))
    val del = a0.filter(col("o_orderkey") % 3 === 0).withColumn("op", lit("D"))
    Seq(ins, del).foreach(_.coalesce(1).write.mode("append").parquet(s"$root/cdc"))
    val q = JoinMaintenance.maintainJoinView(spark, s"$root/cdc", s"$root/dim",
      s"$root/view", s"$root/chk", "o_orderkey", "o_custkey", Seq("o_custkey"),
      leftJoin = true)
    q.awaitTermination()
    val aFinal = a0.filter(col("o_orderkey") % 3 =!= 0).unionByName(ins.drop("op"))
    val want = graft.operators.IncrementalJoin.joinStateLeft(
      aFinal, custDim, Seq("o_custkey"))
    val got = spark.read.parquet(s"$root/view")
    assert(canon(got.select(want.columns.map(col): _*)) == canon(want))
    assert(got.filter(col("c_mktsegment").isNull).count() > 0,
      "fixture must exercise the null-extended slice")
    assert(got.count() == aFinal.count(), "a LEFT view keeps every A row")
  }

  test("two-sided CDC: B churn folds through the stream; both left zero-crossings fire; replay is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-join2side")
    val cdcDir = s"$root/cdc"
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // B row key (c_rowkey) is DISTINCT from the join key on purpose: the
    // left fold's unmatched slice is the view's bKey-IS-NULL slice, and
    // a join-key-valued bKey is never null on a null-extended row
    val dimAll = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"),
        col("c_custkey").as("c_rowkey"), col("c_mktsegment"))
    val b0 = dimAll.filter(col("o_custkey") % 2 === 0)
    b0.write.parquet(s"$root/dim_init")
    val a0 = orders.filter(col("o_orderkey") % 4 === 1)
    IncrementalJoin.joinStateLeft(a0, b0, Seq("o_custkey"))
      .write.parquet(s"$root/view")

    // op-tagged-union log rows: A rows null the B-only columns and vice
    // versa (the join key is shared)
    def aRow(df: DataFrame, op: String) = df
      .withColumn("c_rowkey", lit(null).cast("long"))
      .withColumn("c_mktsegment", lit(null).cast("string"))
      .withColumn("side", lit("A")).withColumn("op", lit(op))
    def bRow(df: DataFrame, op: String) = df
      .withColumn("o_orderkey", lit(null).cast("long"))
      .withColumn("o_totalprice", lit(null).cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("c_rowkey"), col("c_mktsegment"),
        lit("B").as("side"), lit(op).as("op"))

    val aIns = orders.filter(col("o_orderkey") % 4 === 2)
    val aDel = a0.filter(col("o_orderkey") % 3 === 0)
    val aUpd = a0.filter(col("o_orderkey") % 3 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
    val bDead = b0.filter(col("o_custkey") % 8 === 0)      // last-row deletes
    val bFirst = dimAll.filter(col("o_custkey") % 2 === 1) // first inserts
      .filter(col("o_custkey") % 3 === 0)
    val bUpd = b0.filter(col("o_custkey") % 8 === 4)
      .withColumn("c_mktsegment", lit("UPDATED"))
    Seq(
      aRow(aIns, "I"),
      bRow(bDead, "D"),
      bRow(bFirst, "I"),
      bRow(bUpd, "U"),
      aRow(aDel, "D").unionByName(aRow(aUpd, "U"))
    ).foreach(_.coalesce(1).write.mode("append").parquet(cdcDir))

    val q = JoinMaintenance.maintainJoinViewTwoSided(spark, cdcDir,
      s"$root/dim_init", s"$root/view", s"$root/bstate", s"$root/chk",
      aKey = "o_orderkey", bKey = "c_rowkey", joinKeys = Seq("o_custkey"),
      maxFilesPerTrigger = 1, leftJoin = true)
    q.awaitTermination()

    val aFinal = a0.filter(col("o_orderkey") % 3 =!= 0)
      .filter(col("o_orderkey") % 3 =!= 1)
      .unionByName(aUpd).unionByName(aIns)
    val bFinal = b0.filter(col("o_custkey") % 8 =!= 0)
      .filter(col("o_custkey") % 8 =!= 4)
      .unionByName(bUpd).unionByName(bFirst)
    val want = IncrementalJoin.joinStateLeft(aFinal, bFinal, Seq("o_custkey"))
    val got = spark.read.parquet(s"$root/view")
    assert(canon(got.select(want.columns.map(col): _*)) == canon(want),
      "drained two-sided view must equal joinStateLeft(final A, final B)")
    // B′ state table tracks the dimension exactly
    assert(canon(spark.read.parquet(s"$root/bstate")
      .select(bFinal.columns.map(col): _*)) == canon(bFinal))
    // zero-crossing 1 (dead key): the deleted dims' untouched orders
    // must survive null-extended, not vanish
    val deadRows = got.filter(col("o_custkey") % 8 === 0)
    assert(deadRows.count() > 0 && deadRows.filter(col("c_rowkey").isNotNull).count() == 0,
      "B deletes must null-extend their keys' surviving A rows")
    // zero-crossing 2 (first insert): previously-dimless odd keys now match
    assert(got.filter(col("o_custkey") % 2 === 1 && col("o_custkey") % 3 === 0
        && col("c_rowkey").isNotNull).count() > 0,
      "a first B insert must flip its key's rows to matched")
    // B payload updates reached existing pairs
    assert(got.filter(col("c_mktsegment") === "UPDATED").count() > 0)
    // the null-extended slice is live beyond the dead keys
    assert(got.filter(col("c_rowkey").isNull).count() > 0)

    // REPLAY falsifier: a fresh checkpoint refolds every slice into the
    // maintained state pair — both touched-keys-first folds must make
    // that a no-op for the view AND the B state
    val q2 = JoinMaintenance.maintainJoinViewTwoSided(spark, cdcDir,
      s"$root/dim_init", s"$root/view", s"$root/bstate", s"$root/chk_replay",
      "o_orderkey", "c_rowkey", Seq("o_custkey"),
      maxFilesPerTrigger = 1, leftJoin = true)
    q2.awaitTermination()
    assert(canon(spark.read.parquet(s"$root/view")
      .select(want.columns.map(col): _*)) == canon(want),
      "replaying every batch must leave the view unchanged")
    assert(canon(spark.read.parquet(s"$root/bstate")
      .select(bFinal.columns.map(col): _*)) == canon(bFinal),
      "replaying every batch must leave the B state unchanged")
  }

  test("cascade: join view + downstream aggregate drain per micro-batch == from-scratch; fresh-checkpoint replay is a no-op on BOTH state tables") {

    val root = java.nio.file.Files.createTempDirectory("graft-joincascade")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val custDim = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"),
        col("c_acctbal"))
    custDim.write.parquet(s"$root/dim")
    val a0 = orders.filter(col("o_orderkey") % 4 === 1)
    IncrementalJoin.joinState(a0, custDim, Seq("o_custkey"))
      .write.parquet(s"$root/view")
    val ins = orders.filter(col("o_orderkey") % 4 === 2).withColumn("op", lit("I"))
    val del = a0.filter(col("o_orderkey") % 3 === 0).withColumn("op", lit("D"))
    val upd = a0.filter(col("o_orderkey") % 3 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .withColumn("op", lit("U"))
    Seq(ins, del, upd).foreach(
      _.coalesce(1).write.mode("append").parquet(s"$root/cdc"))
    val keys = Seq("c_mktsegment")
    val measures = Seq("o_totalprice")
    val q = JoinMaintenance.maintainJoinView(spark, s"$root/cdc", s"$root/dim",
      s"$root/view", s"$root/chk", "o_orderkey", "o_custkey",
      Seq("o_custkey"), maxFilesPerTrigger = 1,
      aggStateDir = Some(s"$root/agg"), aggKeys = keys, aggMeasures = measures)
    q.awaitTermination()
    val aFinal = a0.filter(col("o_orderkey") % 3 =!= 0)
      .filter(col("o_orderkey") % 3 =!= 1)
      .unionByName(upd.drop("op")).unionByName(ins.drop("op"))
    val wantView = IncrementalJoin.joinState(aFinal, custDim, Seq("o_custkey"))
    val wantAgg = IncrementalAgg.state(wantView, keys, measures)
    def gotAgg() = spark.read.parquet(s"$root/agg").drop("_batch_id", "_batch_sig")
    assert(canon(gotAgg().select(wantAgg.columns.map(col): _*)) == canon(wantAgg),
      "streamed cascade agg state must equal from-scratch state over the final view")
    assert(canon(spark.read.parquet(s"$root/view")
      .select(wantView.columns.map(col): _*)) == canon(wantView))
    // fresh-checkpoint full replay: view folds are anti-then-add
    // idempotent; the agg fold must SKIP every already-recorded batch id
    val q2 = JoinMaintenance.maintainJoinView(spark, s"$root/cdc", s"$root/dim",
      s"$root/view", s"$root/chk_replay", "o_orderkey", "o_custkey",
      Seq("o_custkey"), maxFilesPerTrigger = 1,
      aggStateDir = Some(s"$root/agg"), aggKeys = keys, aggMeasures = measures)
    q2.awaitTermination()
    assert(canon(gotAgg().select(wantAgg.columns.map(col): _*)) == canon(wantAgg),
      "replaying every batch must leave the agg state unchanged")
    assert(canon(spark.read.parquet(s"$root/view")
      .select(wantView.columns.map(col): _*)) == canon(wantView))
  }

  test("cascade torn trigger: crash between the agg write and the view write replays exactly") {

    val root = java.nio.file.Files.createTempDirectory("graft-joinTorn")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val custDim = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    custDim.write.parquet(s"$root/dim")
    val a0 = orders.filter(col("o_orderkey") % 4 === 1)
    IncrementalJoin.joinState(a0, custDim, Seq("o_custkey"))
      .write.parquet(s"$root/view")
    val keys = Seq("c_mktsegment")
    val measures = Seq("o_totalprice")
    val slice0 = orders.filter(col("o_orderkey") % 4 === 2).withColumn("op", lit("I"))
    val slice1 = a0.filter(col("o_orderkey") % 3 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .withColumn("op", lit("U"))
    def fold(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      JoinMaintenance.foldJoinViewBatch(spark, b, id, s"$root/dim",
        s"$root/view", "o_orderkey", "o_custkey", Seq("o_custkey"), "op",
        leftJoin = false, Some(s"$root/agg"), keys, measures)
    fold(slice0, 0L)
    // simulate the torn point: batch 1's agg write lands, the view write
    // is lost — fold fully, then restore the view to its pre-batch-1
    // state (that on-disk pair IS the crash-after-agg-write state)
    val preView = spark.read.parquet(s"$root/view").localCheckpoint()
    fold(slice1, 1L)
    preView.write.mode("overwrite").parquet(s"$root/view")
    // the checkpoint replays batch 1: the guard must skip the agg fold
    // (its delta would be the ORIGINAL one — folding it twice double
    // counts) and the view fold must land idempotently
    fold(slice1, 1L)
    val aFinal = a0.filter(col("o_orderkey") % 3 =!= 1)
      .unionByName(slice1.drop("op")).unionByName(slice0.drop("op"))
    val wantView = IncrementalJoin.joinState(aFinal, custDim, Seq("o_custkey"))
    val wantAgg = IncrementalAgg.state(wantView, keys, measures)
    assert(canon(spark.read.parquet(s"$root/view")
      .select(wantView.columns.map(col): _*)) == canon(wantView),
      "the replayed view fold must complete the torn trigger")
    assert(canon(spark.read.parquet(s"$root/agg").drop("_batch_id", "_batch_sig")
      .select(wantAgg.columns.map(col): _*)) == canon(wantAgg),
      "the replayed agg fold must be skipped, not double-counted")
  }

  test("two-sided LEFT cascade: B churn + zero-crossings flow through the view delta into the aggregate") {

    val root = java.nio.file.Files.createTempDirectory("graft-join2cascade")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val dimAll = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"),
        col("c_custkey").as("c_rowkey"), col("c_acctbal"))
    val b0 = dimAll.filter(col("o_custkey") % 2 === 0)
    b0.write.parquet(s"$root/dim_init")
    val a0 = orders.filter(col("o_orderkey") % 4 === 1)
    IncrementalJoin.joinStateLeft(a0, b0, Seq("o_custkey"))
      .write.parquet(s"$root/view")
    def aRow(df: DataFrame, op: String) = df
      .withColumn("c_rowkey", lit(null).cast("long"))
      .withColumn("c_acctbal", lit(null).cast("double"))
      .withColumn("side", lit("A")).withColumn("op", lit(op))
    def bRow(df: DataFrame, op: String) = df
      .withColumn("o_orderkey", lit(null).cast("long"))
      .withColumn("o_totalprice", lit(null).cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("c_rowkey"), col("c_acctbal"),
        lit("B").as("side"), lit(op).as("op"))
    val aIns = orders.filter(col("o_orderkey") % 4 === 2)
    val bDead = b0.filter(col("o_custkey") % 8 === 0)
    val bFirst = dimAll.filter(col("o_custkey") % 2 === 1)
      .filter(col("o_custkey") % 3 === 0)
    Seq(aRow(aIns, "I"), bRow(bDead, "D"), bRow(bFirst, "I"))
      .foreach(_.coalesce(1).write.mode("append").parquet(s"$root/cdc"))
    // B-SIDE agg key on purpose: null-extended rows put a NULL group
    // through every agg fold (the null-safe state-join case — a plain
    // key join would split it into duplicate partial rows per batch)
    val keys = Seq("c_rowkey")
    val measures = Seq("o_totalprice", "c_acctbal")
    val q = JoinMaintenance.maintainJoinViewTwoSided(spark, s"$root/cdc",
      s"$root/dim_init", s"$root/view", s"$root/bstate", s"$root/chk",
      aKey = "o_orderkey", bKey = "c_rowkey", joinKeys = Seq("o_custkey"),
      maxFilesPerTrigger = 1, leftJoin = true,
      aggStateDir = Some(s"$root/agg"), aggKeys = keys, aggMeasures = measures)
    q.awaitTermination()
    val aFinal = a0.unionByName(aIns)
    val bFinal = b0.filter(col("o_custkey") % 8 =!= 0).unionByName(bFirst)
    val wantView = IncrementalJoin.joinStateLeft(aFinal, bFinal, Seq("o_custkey"))
    val wantAgg = IncrementalAgg.state(wantView, keys, measures)
    val gotAgg = spark.read.parquet(s"$root/agg").drop("_batch_id", "_batch_sig")
    assert(canon(gotAgg.select(wantAgg.columns.map(col): _*)) == canon(wantAgg),
      "two-sided left cascade agg must equal from-scratch over the final left view")
    // the zero-crossings really moved through the agg: every
    // null-extended row (dead keys included) lands in the ONE NULL
    // c_rowkey group, whose B-side sum is NULL (no measure values) —
    // a key-splitting fold would leave several partial NULL rows
    val nullGroup = gotAgg.filter(col("c_rowkey").isNull)
    assert(nullGroup.count() == 1, "exactly one NULL-key group")
    val ng = nullGroup.head()
    assert(ng.getLong(ng.fieldIndex("n_rows")) > 0 &&
      ng.isNullAt(ng.fieldIndex("sum_c_acctbal")),
      "the NULL group must carry rows and a NULL B-side sum")
  }

  test("snowflake stream: V1 and V2 drain to the from-scratch three-way join; replay AND the torn point (V2 written, V1 not) converge") {
    val root = java.nio.file.Files.createTempDirectory("graft-snowstream")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val custDim = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    custDim.write.parquet(s"$root/dimB")
    // C joins V1 on the B-side segment column — the snowflake arm
    val segs = custDim.select(col("c_mktsegment")).distinct()
      .select(col("c_mktsegment"), xxhash64(col("c_mktsegment")).as("seg_id"),
        concat(lit("seg_"), col("c_mktsegment")).as("seg_name"))
    segs.write.parquet(s"$root/dimC")
    val a0 = orders.filter(col("o_orderkey") % 4 === 1)
    val abKey = struct(col("o_orderkey"), col("o_custkey")).as("__ab_key")
    IncrementalJoin.joinState(a0, custDim, Seq("o_custkey"))
      .write.parquet(s"$root/v1")
    IncrementalJoin.joinState(
        IncrementalJoin.joinState(a0, custDim, Seq("o_custkey"))
          .select(abKey, col("*")), segs, Seq("c_mktsegment"))
      .write.parquet(s"$root/v2")
    val ins = orders.filter(col("o_orderkey") % 4 === 2).withColumn("op", lit("I"))
    val del = a0.filter(col("o_orderkey") % 3 === 0).withColumn("op", lit("D"))
    val upd = a0.filter(col("o_orderkey") % 3 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .withColumn("op", lit("U"))
    Seq(ins, del, upd).foreach(
      _.coalesce(1).write.mode("append").parquet(s"$root/cdc"))
    // aggStateDir makes it the full THREE-level tree: join → join → agg
    val aggKeys = Seq("c_mktsegment")
    val aggMeasures = Seq("o_totalprice")
    val q = JoinMaintenance.maintainSnowflakeView(spark, s"$root/cdc",
      s"$root/dimB", s"$root/dimC", s"$root/v1", s"$root/v2", s"$root/chk",
      aKey = "o_orderkey", bKey = "o_custkey", cKey = "seg_id",
      joinKeysAB = Seq("o_custkey"), joinKeysC = Seq("c_mktsegment"),
      maxFilesPerTrigger = 1, aggStateDir = Some(s"$root/agg"),
      aggKeys = aggKeys, aggMeasures = aggMeasures)
    q.awaitTermination()
    val aFinal = a0.filter(col("o_orderkey") % 3 =!= 0)
      .filter(col("o_orderkey") % 3 =!= 1)
      .unionByName(upd.drop("op")).unionByName(ins.drop("op"))
    val wantV1 = IncrementalJoin.joinState(aFinal, custDim, Seq("o_custkey"))
    val wantV2 = IncrementalJoin.joinState(wantV1.select(abKey, col("*")),
      segs, Seq("c_mktsegment")).drop("__ab_key")
    def gotV1() = spark.read.parquet(s"$root/v1")
    def gotV2() = spark.read.parquet(s"$root/v2").drop("__ab_key")
    def gotAgg() = spark.read.parquet(s"$root/agg").drop("_batch_id", "_batch_sig")
    def wantAggOf(v2: DataFrame) = IncrementalAgg.state(v2, aggKeys, aggMeasures)
    assert(canon(gotV1().select(wantV1.columns.map(col): _*)) == canon(wantV1))
    assert(canon(gotV2().select(wantV2.columns.map(col): _*)) == canon(wantV2),
      "V2 must equal the from-scratch (A ⋈ B) ⋈ C over the final snapshots")
    val wantAgg = wantAggOf(wantV2)
    assert(canon(gotAgg().select(wantAgg.columns.map(col): _*)) == canon(wantAgg),
      "the level-3 aggregate must equal from-scratch over the final V2")
    // fresh-checkpoint full replay: both view folds anti-then-add
    // idempotent, the agg fold guarded (same-order replay ids skip)
    val q2 = JoinMaintenance.maintainSnowflakeView(spark, s"$root/cdc",
      s"$root/dimB", s"$root/dimC", s"$root/v1", s"$root/v2",
      s"$root/chk_replay", "o_orderkey", "o_custkey", "seg_id",
      Seq("o_custkey"), Seq("c_mktsegment"), maxFilesPerTrigger = 1,
      aggStateDir = Some(s"$root/agg"), aggKeys = aggKeys,
      aggMeasures = aggMeasures)
    q2.awaitTermination()
    assert(canon(gotV1().select(wantV1.columns.map(col): _*)) == canon(wantV1))
    assert(canon(gotV2().select(wantV2.columns.map(col): _*)) == canon(wantV2),
      "full replay must leave both views unchanged")
    assert(canon(gotAgg().select(wantAgg.columns.map(col): _*)) == canon(wantAgg),
      "full replay must leave the aggregate unchanged")
    // torn point: V2's write landed, V1's was lost (the one crash window
    // the V2-before-V1 order leaves) — restore V1 to pre-batch, refold
    val torn = a0.filter(col("o_orderkey") % 3 === 2)
      .filter(col("o_orderkey") % 5 === 0).withColumn("op", lit("D"))
    assert(torn.count() > 0)
    val preV1 = gotV1().localCheckpoint()
    JoinMaintenance.foldSnowflakeBatch(spark, torn, 99L, s"$root/dimB",
      s"$root/dimC", s"$root/v1", s"$root/v2", "o_orderkey", "o_custkey",
      "seg_id", Seq("o_custkey"), Seq("c_mktsegment"), "op",
      Some(s"$root/agg"), aggKeys, aggMeasures)
    preV1.write.mode("overwrite").parquet(s"$root/v1")
    JoinMaintenance.foldSnowflakeBatch(spark, torn, 99L, s"$root/dimB",
      s"$root/dimC", s"$root/v1", s"$root/v2", "o_orderkey", "o_custkey",
      "seg_id", Seq("o_custkey"), Seq("c_mktsegment"), "op",
      Some(s"$root/agg"), aggKeys, aggMeasures)
    val aTorn = aFinal.join(torn.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
    val wantV1T = IncrementalJoin.joinState(aTorn, custDim, Seq("o_custkey"))
    val wantV2T = IncrementalJoin.joinState(wantV1T.select(abKey, col("*")),
      segs, Seq("c_mktsegment")).drop("__ab_key")
    assert(canon(gotV1().select(wantV1T.columns.map(col): _*)) == canon(wantV1T),
      "the replayed V1 fold must complete the torn trigger")
    assert(canon(gotV2().select(wantV2T.columns.map(col): _*)) == canon(wantV2T),
      "the replayed V2 fold must be a no-op, not a double retraction")
    // the torn batch reached the agg exactly once: the refold's guard
    // skipped the recorded id, so the state equals from-scratch over V2′
    val wantAggT = wantAggOf(wantV2T)
    assert(canon(gotAgg().select(wantAggT.columns.map(col): _*)) == canon(wantAggT),
      "the torn-trigger refold must not double-fold the aggregate")
  }

  test("snowflake stream LEFT mode: partnerless A rows ride null-extended through V1, and their NULL-field composite keys move through the level-2 fold") {
    val root = java.nio.file.Files.createTempDirectory("graft-snowleft")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // only EVEN custkeys exist in the dim: odd-custkey orders are
    // null-extended in V1 — an inner level-1 fold would LOSE them, and
    // their (o_orderkey, NULL) composite keys must still traverse the
    // level-2 anti/semi probes (field-wise null-safe struct equality)
    val custDim = Tables.load(spark, sf(), "customer")
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    custDim.write.parquet(s"$root/dimB")
    val segs = custDim.select(col("c_mktsegment")).distinct()
      .select(col("c_mktsegment"), xxhash64(col("c_mktsegment")).as("seg_id"),
        concat(lit("seg_"), col("c_mktsegment")).as("seg_name"))
    segs.write.parquet(s"$root/dimC")
    val a0 = orders.filter(col("o_orderkey") % 4 === 1)
    val abKey = struct(col("o_orderkey"), col("o_custkey")).as("__ab_key")
    def v1Of(a: DataFrame) = IncrementalJoin.joinStateLeft(a, custDim, Seq("o_custkey"))
    def v2KeyedOf(v1: DataFrame) = IncrementalJoin.joinState(
      v1.select(abKey, col("*")), segs, Seq("c_mktsegment"))
    def v2Of(v1: DataFrame) = v2KeyedOf(v1).drop("__ab_key")
    v1Of(a0).write.parquet(s"$root/v1")
    v2KeyedOf(v1Of(a0)).write.parquet(s"$root/v2")
    val ins = orders.filter(col("o_orderkey") % 4 === 2).withColumn("op", lit("I"))
    val del = a0.filter(col("o_orderkey") % 3 === 0).withColumn("op", lit("D"))
    val upd = a0.filter(col("o_orderkey") % 3 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .withColumn("op", lit("U"))
    Seq(ins, del, upd).foreach(
      _.coalesce(1).write.mode("append").parquet(s"$root/cdc"))
    val q = JoinMaintenance.maintainSnowflakeView(spark, s"$root/cdc",
      s"$root/dimB", s"$root/dimC", s"$root/v1", s"$root/v2", s"$root/chk",
      aKey = "o_orderkey", bKey = "o_custkey", cKey = "seg_id",
      joinKeysAB = Seq("o_custkey"), joinKeysC = Seq("c_mktsegment"),
      maxFilesPerTrigger = 1, leftJoin = true)
    q.awaitTermination()
    val aFinal = a0.filter(col("o_orderkey") % 3 === 2)
      .unionByName(upd.drop("op")).unionByName(ins.drop("op"))
    val wantV1 = v1Of(aFinal)
    val wantV2 = v2Of(wantV1)
    val gotV1 = spark.read.parquet(s"$root/v1")
    val gotV2 = spark.read.parquet(s"$root/v2").drop("__ab_key")
    assert(canon(gotV1.select(wantV1.columns.map(col): _*)) == canon(wantV1),
      "V1 must equal the from-scratch LEFT join over the final snapshot")
    assert(canon(gotV2.select(wantV2.columns.map(col): _*)) == canon(wantV2),
      "V2 must equal from-scratch (A LEFT B) inner C over the final snapshot")
    // the mode difference genuinely fired: partnerless rows present in
    // V1 (an inner fold would have dropped every odd-custkey insert),
    // absent from V2 (their NULL segment joins no C row)
    assert(gotV1.filter(col("c_mktsegment").isNull).count() > 0,
      "null-extended rows must survive the level-1 fold")
    assert(wantV1.filter(col("c_mktsegment").isNull).count() > 0)
  }

  test("two-sided SNOWFLAKE stream: A and B churn one log; V1, V2, B′ and the aggregate drain to from-scratch; replay and both torn points converge") {
    val root = java.nio.file.Files.createTempDirectory("graft-snow2side")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val dimAll = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"),
        col("c_custkey").as("c_rowkey"), col("c_mktsegment"))
    // C joins V1 on the B-side segment column; built from ALL segments so
    // first-insert B rows find their C partner
    val segs = dimAll.select(col("c_mktsegment")).distinct()
      .select(col("c_mktsegment"), xxhash64(col("c_mktsegment")).as("seg_id"),
        concat(lit("seg_"), col("c_mktsegment")).as("seg_name"))
    segs.write.parquet(s"$root/dimC")
    val b0 = dimAll.filter(col("o_custkey") % 2 === 0)
    b0.write.parquet(s"$root/dim_init")
    val a0 = orders.filter(col("o_orderkey") % 4 === 1)
    val abKey = struct(col("o_orderkey"), col("c_rowkey")).as("__ab_key")
    def v1Of(a: DataFrame, b: DataFrame) =
      IncrementalJoin.joinStateLeft(a, b, Seq("o_custkey"))
    def v2Of(v1: DataFrame) = IncrementalJoin.joinState(
      v1.select(abKey, col("*")), segs, Seq("c_mktsegment")).drop("__ab_key")
    v1Of(a0, b0).write.parquet(s"$root/v1")
    IncrementalJoin.joinState(v1Of(a0, b0).select(abKey, col("*")), segs,
      Seq("c_mktsegment")).write.parquet(s"$root/v2")

    def aRow(df: DataFrame, op: String) = df
      .withColumn("c_rowkey", lit(null).cast("long"))
      .withColumn("c_mktsegment", lit(null).cast("string"))
      .withColumn("side", lit("A")).withColumn("op", lit(op))
    def bRow(df: DataFrame, op: String) = df
      .withColumn("o_orderkey", lit(null).cast("long"))
      .withColumn("o_totalprice", lit(null).cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("c_rowkey"), col("c_mktsegment"),
        lit("B").as("side"), lit(op).as("op"))
    val aIns = orders.filter(col("o_orderkey") % 4 === 2)
    val aDel = a0.filter(col("o_orderkey") % 3 === 0)
    val aUpd = a0.filter(col("o_orderkey") % 3 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
    val bDead = b0.filter(col("o_custkey") % 8 === 0)      // last-row deletes
    val bFirst = dimAll.filter(col("o_custkey") % 2 === 1) // first inserts
      .filter(col("o_custkey") % 3 === 0)
    // a B update that MOVES the level-2 join key: its V1 rows must leave
    // V2 entirely ("UPDATED" is not a segment C knows)
    val bUpd = b0.filter(col("o_custkey") % 8 === 4)
      .withColumn("c_mktsegment", lit("UPDATED"))
    Seq(
      aRow(aIns, "I"),
      bRow(bDead, "D"),
      bRow(bFirst, "I"),
      bRow(bUpd, "U"),
      aRow(aDel, "D").unionByName(aRow(aUpd, "U"))
    ).foreach(_.coalesce(1).write.mode("append").parquet(s"$root/cdc"))

    val aggKeys = Seq("c_mktsegment")
    val aggMeasures = Seq("o_totalprice")
    val q = JoinMaintenance.maintainSnowflakeViewTwoSided(spark,
      s"$root/cdc", s"$root/dim_init", s"$root/dimC", s"$root/v1",
      s"$root/v2", s"$root/bstate", s"$root/chk",
      aKey = "o_orderkey", bKey = "c_rowkey", cKey = "seg_id",
      joinKeysAB = Seq("o_custkey"), joinKeysC = Seq("c_mktsegment"),
      maxFilesPerTrigger = 1, leftJoin = true,
      aggStateDir = Some(s"$root/agg"), aggKeys = aggKeys,
      aggMeasures = aggMeasures)
    q.awaitTermination()

    val aFinal = a0.filter(col("o_orderkey") % 3 =!= 0)
      .filter(col("o_orderkey") % 3 =!= 1)
      .unionByName(aUpd).unionByName(aIns)
    val bFinal = b0.filter(col("o_custkey") % 8 =!= 0)
      .filter(col("o_custkey") % 8 =!= 4)
      .unionByName(bUpd).unionByName(bFirst)
    def gotV1() = spark.read.parquet(s"$root/v1")
    def gotV2() = spark.read.parquet(s"$root/v2").drop("__ab_key")
    def gotB() = spark.read.parquet(s"$root/bstate")
    def gotAgg() = spark.read.parquet(s"$root/agg").drop("_batch_id", "_batch_sig")
    def checkAll(a: DataFrame, b: DataFrame, clue: String): Unit = {
      val wantV1 = v1Of(a, b)
      val wantV2 = v2Of(wantV1)
      val wantAgg = IncrementalAgg.state(wantV2, aggKeys, aggMeasures)
      assert(canon(gotV1().select(wantV1.columns.map(col): _*)) == canon(wantV1),
        s"$clue: V1 must equal the from-scratch LEFT join")
      assert(canon(gotV2().select(wantV2.columns.map(col): _*)) == canon(wantV2),
        s"$clue: V2 must equal from-scratch (A LEFT B) inner C")
      assert(canon(gotB().select(b.columns.map(col): _*)) == canon(b),
        s"$clue: B state must track the dimension exactly")
      assert(canon(gotAgg().select(wantAgg.columns.map(col): _*)) == canon(wantAgg),
        s"$clue: the level-3 aggregate must equal from-scratch over V2")
    }
    checkAll(aFinal, bFinal, "drained")
    // the B-churn paths genuinely fired through BOTH levels
    val dead = gotV1().filter(col("o_custkey") % 8 === 0)
    assert(dead.count() > 0 && dead.filter(col("c_rowkey").isNotNull).count() == 0,
      "B deletes must null-extend their keys' surviving A rows in V1")
    assert(gotV2().filter(col("o_custkey") % 8 === 0).count() == 0,
      "dead keys' NULL segments must leave V2")
    assert(gotV1().filter(col("c_mktsegment") === "UPDATED").count() > 0
      && gotV2().filter(col("c_mktsegment") === "UPDATED").count() == 0,
      "a B update moving the C join key must pull its rows out of V2")
    assert(gotV2().filter(col("o_custkey") % 2 === 1).count() > 0,
      "first B inserts must cascade their keys' rows into V2")

    // fresh-checkpoint full replay: no-op on all four state tables
    val q2 = JoinMaintenance.maintainSnowflakeViewTwoSided(spark,
      s"$root/cdc", s"$root/dim_init", s"$root/dimC", s"$root/v1",
      s"$root/v2", s"$root/bstate", s"$root/chk_replay",
      "o_orderkey", "c_rowkey", "seg_id",
      Seq("o_custkey"), Seq("c_mktsegment"), maxFilesPerTrigger = 1,
      leftJoin = true, aggStateDir = Some(s"$root/agg"),
      aggKeys = aggKeys, aggMeasures = aggMeasures)
    q2.awaitTermination()
    checkAll(aFinal, bFinal, "full replay")

    // torn-trigger drills on a batch that churns BOTH sides: the write
    // order is agg → V2 → V1 → B′, leaving two interesting crash windows
    val tornA = aFinal.filter(col("o_orderkey") % 3 === 2)
      .filter(col("o_orderkey") % 5 === 0)
    val tornB = bFinal.filter(col("o_custkey") % 8 === 2)
    // a B UPDATE that moves rows across EXISTING C groups rides along:
    // the window-2 replay of a pure DELETE recomputes an EMPTY delta
    // (its view rows are already null-extended), so updates are the case
    // that actually exercises retract-and-rederive against a post-fold V1
    val segVals = segs.select("c_mktsegment").collect().map(_.getString(0)).sorted
    val tornBUpd = bFinal.filter(col("o_custkey") % 8 === 6)
      .withColumn("c_mktsegment",
        when(col("c_mktsegment") === segVals.head, lit(segVals.last))
          .otherwise(lit(segVals.head)))
    assert(tornA.count() > 0 && tornB.count() > 0 && tornBUpd.count() > 0)
    val torn = aRow(tornA, "D").unionByName(bRow(tornB, "D"))
      .unionByName(bRow(tornBUpd, "U")).localCheckpoint()
    val aTorn = aFinal.join(tornA.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
    val bTorn = bFinal.join(tornB.select("c_rowkey"), Seq("c_rowkey"), "left_anti")
      .join(tornBUpd.select("c_rowkey"), Seq("c_rowkey"), "left_anti")
      .unionByName(tornBUpd)
    val aCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val bCols = Seq("o_custkey", "c_rowkey", "c_mktsegment")
    def fold(): Unit = JoinMaintenance.foldSnowflakeTwoSidedBatch(spark,
      torn, 99L, s"$root/dim_init", s"$root/dimC", s"$root/v1", s"$root/v2",
      s"$root/bstate", "o_orderkey", "c_rowkey", "seg_id",
      Seq("o_custkey"), Seq("c_mktsegment"), aCols, bCols, "side", "op",
      leftJoin = true, Some(s"$root/agg"), aggKeys, aggMeasures)
    val preV1 = gotV1().localCheckpoint()
    val preB = gotB().localCheckpoint()
    fold()
    // window 1: agg + V2 landed, V1 and B′ lost — the replayed level-1
    // fold sees the PRE-fold states and recomputes the original delta
    preV1.write.mode("overwrite").parquet(s"$root/v1")
    preB.write.mode("overwrite").parquet(s"$root/bstate")
    fold()
    checkAll(aTorn, bTorn, "torn window 1 (V1+B′ lost)")
    // window 2: only B′ lost — the replayed fold sees the POST-fold V1,
    // whose recomputed delta retracts-and-rederives the touched keys'
    // current rows, so the V2 refold is a no-op and B′ completes
    preB.write.mode("overwrite").parquet(s"$root/bstate")
    fold()
    checkAll(aTorn, bTorn, "torn window 2 (B′ lost)")
  }

  test("two-sided INNER mode rejects B-side inserts loudly (A′ unrecoverable from an inner view)") {
    val root = java.nio.file.Files.createTempDirectory("graft-join2inner")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(20)
    val dim = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"),
        col("c_custkey").as("c_rowkey"), col("c_mktsegment"))
    dim.write.parquet(s"$root/dim_init")
    IncrementalJoin.joinState(orders, dim, Seq("o_custkey"))
      .write.parquet(s"$root/view")
    dim.limit(3)
      .withColumn("o_orderkey", lit(null).cast("long"))
      .withColumn("o_totalprice", lit(null).cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("c_rowkey"), col("c_mktsegment"),
        lit("B").as("side"), lit("I").as("op"))
      .coalesce(1).write.parquet(s"$root/cdc")
    val q = JoinMaintenance.maintainJoinViewTwoSided(spark, s"$root/cdc",
      s"$root/dim_init", s"$root/view", s"$root/bstate", s"$root/chk",
      "o_orderkey", "c_rowkey", Seq("o_custkey"))
    val e = intercept[Exception](q.awaitTermination())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("INNER view cannot")),
      s"expected the loud inner/B-insert guard, got: ${e.getMessage}")
  }

  test("three-sided snowflake: the same log churns C too — deletes, renames and inserts cascade into V2; replay and the C′-lost window converge") {
    val root = java.nio.file.Files.createTempDirectory("graft-snow3side")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val dimAll = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"),
        col("c_custkey").as("c_rowkey"), col("c_mktsegment"))
    val segs = dimAll.select(col("c_mktsegment")).distinct()
      .select(col("c_mktsegment"), xxhash64(col("c_mktsegment")).as("seg_id"),
        concat(lit("seg_"), col("c_mktsegment")).as("seg_name"))
    segs.write.parquet(s"$root/dimC")
    val b0 = dimAll.filter(col("o_custkey") % 2 === 0)
    b0.write.parquet(s"$root/dim_init")
    val a0 = orders.filter(col("o_orderkey") % 4 === 1)
    val abKey = struct(col("o_orderkey"), col("c_rowkey")).as("__ab_key")
    def v1Of(a: DataFrame, b: DataFrame) =
      IncrementalJoin.joinStateLeft(a, b, Seq("o_custkey"))
    def v2Of(v1: DataFrame, c: DataFrame) = IncrementalJoin.joinState(
      v1.select(abKey, col("*")), c, Seq("c_mktsegment")).drop("__ab_key")
    v1Of(a0, b0).write.parquet(s"$root/v1")
    IncrementalJoin.joinState(v1Of(a0, b0).select(abKey, col("*")), segs,
      Seq("c_mktsegment")).write.parquet(s"$root/v2")

    // canonical log column order shared by all three side shapes
    val logCols = Seq("o_orderkey", "o_custkey", "o_totalprice",
      "c_rowkey", "c_mktsegment", "seg_id", "seg_name", "side", "op")
    def aRow(df: DataFrame, op: String) = df
      .withColumn("c_rowkey", lit(null).cast("long"))
      .withColumn("c_mktsegment", lit(null).cast("string"))
      .withColumn("seg_id", lit(null).cast("long"))
      .withColumn("seg_name", lit(null).cast("string"))
      .withColumn("side", lit("A")).withColumn("op", lit(op))
      .select(logCols.map(col): _*)
    def bRow(df: DataFrame, op: String) = df
      .withColumn("o_orderkey", lit(null).cast("long"))
      .withColumn("o_totalprice", lit(null).cast("double"))
      .withColumn("seg_id", lit(null).cast("long"))
      .withColumn("seg_name", lit(null).cast("string"))
      .withColumn("side", lit("B")).withColumn("op", lit(op))
      .select(logCols.map(col): _*)
    def cRow(df: DataFrame, op: String) = df
      .withColumn("o_orderkey", lit(null).cast("long"))
      .withColumn("o_custkey", lit(null).cast("long"))
      .withColumn("o_totalprice", lit(null).cast("double"))
      .withColumn("c_rowkey", lit(null).cast("long"))
      .withColumn("side", lit("C")).withColumn("op", lit(op))
      .select(logCols.map(col): _*)

    val segVals = segs.select("c_mktsegment").collect().map(_.getString(0)).sorted
    assert(segVals.length >= 4, "fixture needs several segments")
    def newSeg(name: String) = segs.limit(1)
      .select(lit(name).as("c_mktsegment"), xxhash64(lit(name)).as("seg_id"),
        concat(lit("seg_"), lit(name)).as("seg_name"))
    val aIns = orders.filter(col("o_orderkey") % 4 === 2)
    val aDel = a0.filter(col("o_orderkey") % 3 === 0)
    val bUpd = b0.filter(col("o_custkey") % 8 === 4)
      .withColumn("c_mktsegment", lit("UPDATED"))
    val bUpd2 = b0.filter(col("o_custkey") % 8 === 2)
      .withColumn("c_mktsegment", lit("FRESH2"))
    val cDelRows = segs.filter(col("c_mktsegment") === segVals.head)
    val cRen = segs.filter(col("c_mktsegment") === segVals.last)
      .withColumn("seg_name", lit("renamed"))
    Seq(
      aRow(aIns, "I"),
      bRow(bUpd, "U"),
      // C slice: a whole segment deleted, one renamed, and the segment
      // the earlier B update moved rows TO inserted — those V1 rows must
      // flip INTO V2 from the C side
      cRow(cDelRows, "D").unionByName(cRow(cRen, "U"))
        .unionByName(cRow(newSeg("UPDATED"), "I")),
      // mixed slice: A delete + B move to a segment inserted IN THE SAME
      // TRIGGER (new-V1-rows × new-C-row in one fold)
      aRow(aDel, "D").unionByName(bRow(bUpd2, "U"))
        .unionByName(cRow(newSeg("FRESH2"), "I"))
    ).foreach(_.coalesce(1).write.mode("append").parquet(s"$root/cdc"))

    val aggKeys = Seq("c_mktsegment")
    val aggMeasures = Seq("o_totalprice")
    val q = JoinMaintenance.maintainSnowflakeViewTwoSided(spark,
      s"$root/cdc", s"$root/dim_init", s"$root/dimC", s"$root/v1",
      s"$root/v2", s"$root/bstate", s"$root/chk",
      aKey = "o_orderkey", bKey = "c_rowkey", cKey = "seg_id",
      joinKeysAB = Seq("o_custkey"), joinKeysC = Seq("c_mktsegment"),
      maxFilesPerTrigger = 1, leftJoin = true,
      aggStateDir = Some(s"$root/agg"), aggKeys = aggKeys,
      aggMeasures = aggMeasures, cStateDir = Some(s"$root/cstate"))
    q.awaitTermination()

    val aFinal = a0.filter(col("o_orderkey") % 3 =!= 0).unionByName(aIns)
    val bFinal = b0.filter(col("o_custkey") % 8 =!= 4)
      .filter(col("o_custkey") % 8 =!= 2)
      .unionByName(bUpd).unionByName(bUpd2)
    val cFinal = segs.filter(col("c_mktsegment") =!= segVals.head)
      .filter(col("c_mktsegment") =!= segVals.last)
      .unionByName(cRen)
      .unionByName(newSeg("UPDATED")).unionByName(newSeg("FRESH2"))
    def gotV1() = spark.read.parquet(s"$root/v1")
    def gotV2() = spark.read.parquet(s"$root/v2").drop("__ab_key")
    def gotB() = spark.read.parquet(s"$root/bstate")
    def gotC() = spark.read.parquet(s"$root/cstate")
    def gotAgg() = spark.read.parquet(s"$root/agg").drop("_batch_id", "_batch_sig")
    def checkAll(a: DataFrame, b: DataFrame, c: DataFrame, clue: String): Unit = {
      val wantV1 = v1Of(a, b)
      val wantV2 = v2Of(wantV1, c)
      val wantAgg = IncrementalAgg.state(wantV2, aggKeys, aggMeasures)
      assert(canon(gotV1().select(wantV1.columns.map(col): _*)) == canon(wantV1),
        s"$clue: V1 must equal the from-scratch LEFT join")
      assert(canon(gotV2().select(wantV2.columns.map(col): _*)) == canon(wantV2),
        s"$clue: V2 must equal from-scratch (A LEFT B) inner C")
      assert(canon(gotB().select(b.columns.map(col): _*)) == canon(b),
        s"$clue: B state must track the dimension exactly")
      assert(canon(gotC().select(c.columns.map(col): _*)) == canon(c),
        s"$clue: C state must track the dimension exactly")
      assert(canon(gotAgg().select(wantAgg.columns.map(col): _*)) == canon(wantAgg),
        s"$clue: the level-3 aggregate must equal from-scratch over V2")
    }
    checkAll(aFinal, bFinal, cFinal, "drained")
    // each C-churn class genuinely fired through the level-2 fold
    assert(gotV1().filter(col("c_mktsegment") === segVals.head).count() > 0
      && gotV2().filter(col("c_mktsegment") === segVals.head).count() == 0,
      "a deleted C segment must leave V2 while its V1 rows stay")
    assert(gotV2().filter(col("c_mktsegment") === "UPDATED").count() > 0,
      "a C insert must flip the waiting V1 rows INTO V2")
    assert(gotV2().filter(col("c_mktsegment") === "FRESH2").count() > 0,
      "same-trigger B move + C insert must land in V2 exactly once")
    assert(gotV2().filter(col("seg_name") === "renamed").count() > 0,
      "a C payload rename must reach V2's rows")

    // fresh-checkpoint full replay: no-op on all FIVE state tables
    val q2 = JoinMaintenance.maintainSnowflakeViewTwoSided(spark,
      s"$root/cdc", s"$root/dim_init", s"$root/dimC", s"$root/v1",
      s"$root/v2", s"$root/bstate", s"$root/chk_replay",
      "o_orderkey", "c_rowkey", "seg_id",
      Seq("o_custkey"), Seq("c_mktsegment"), maxFilesPerTrigger = 1,
      leftJoin = true, aggStateDir = Some(s"$root/agg"), aggKeys = aggKeys,
      aggMeasures = aggMeasures, cStateDir = Some(s"$root/cstate"))
    q2.awaitTermination()
    checkAll(aFinal, bFinal, cFinal, "full replay")

    // torn drill at the NEW crash window: everything landed except C′ —
    // the refold sees the post-fold V2 and must retract-and-rederive the
    // touched C join keys to the rows V2 already holds (the rename is
    // the dangerous case; the delete replays as an empty retraction)
    val tornA = aFinal.filter(col("o_orderkey") % 3 === 2)
      .filter(col("o_orderkey") % 7 === 0)
    val cTornDel = cFinal.filter(col("c_mktsegment") === segVals(1))
    val cTornRen = cFinal.filter(col("c_mktsegment") === segVals(2))
      .withColumn("seg_name", lit("renamed_again"))
    assert(tornA.count() > 0 && cTornDel.count() > 0 && cTornRen.count() > 0)
    val torn = aRow(tornA, "D").unionByName(cRow(cTornDel, "D"))
      .unionByName(cRow(cTornRen, "U")).localCheckpoint()
    val aTorn = aFinal.join(tornA.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
    val cTorn = cFinal.filter(col("c_mktsegment") =!= segVals(1))
      .filter(col("c_mktsegment") =!= segVals(2)).unionByName(cTornRen)
    val aCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val bCols = Seq("o_custkey", "c_rowkey", "c_mktsegment")
    val cCols = Seq("c_mktsegment", "seg_id", "seg_name")
    def fold(): Unit = JoinMaintenance.foldSnowflakeTwoSidedBatch(spark,
      torn, 99L, s"$root/dim_init", s"$root/dimC", s"$root/v1", s"$root/v2",
      s"$root/bstate", "o_orderkey", "c_rowkey", "seg_id",
      Seq("o_custkey"), Seq("c_mktsegment"), aCols, bCols, "side", "op",
      leftJoin = true, Some(s"$root/agg"), aggKeys, aggMeasures,
      Some(s"$root/cstate"), cCols)
    val preC = gotC().localCheckpoint()
    fold()
    preC.write.mode("overwrite").parquet(s"$root/cstate")
    fold()
    checkAll(aTorn, bFinal, cTorn, "torn window (C′ lost)")
  }

  test("two-sided snowflake INNER mode: B deletes (the legal B churn) cascade through both levels") {
    val root = java.nio.file.Files.createTempDirectory("graft-snow2innerdel")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val dimAll = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"),
        col("c_custkey").as("c_rowkey"), col("c_mktsegment"))
    val segs = dimAll.select(col("c_mktsegment")).distinct()
      .select(col("c_mktsegment"), xxhash64(col("c_mktsegment")).as("seg_id"),
        concat(lit("seg_"), col("c_mktsegment")).as("seg_name"))
    segs.write.parquet(s"$root/dimC")
    dimAll.write.parquet(s"$root/dim_init")
    val a0 = orders.filter(col("o_orderkey") % 4 === 1)
    val abKey = struct(col("o_orderkey"), col("c_rowkey")).as("__ab_key")
    def v1Of(a: DataFrame, b: DataFrame) =
      IncrementalJoin.joinState(a, b, Seq("o_custkey"))
    v1Of(a0, dimAll).write.parquet(s"$root/v1")
    IncrementalJoin.joinState(v1Of(a0, dimAll).select(abKey, col("*")), segs,
      Seq("c_mktsegment")).write.parquet(s"$root/v2")
    def aRow(df: DataFrame, op: String) = df
      .withColumn("c_rowkey", lit(null).cast("long"))
      .withColumn("c_mktsegment", lit(null).cast("string"))
      .withColumn("side", lit("A")).withColumn("op", lit(op))
    def bRow(df: DataFrame, op: String) = df
      .withColumn("o_orderkey", lit(null).cast("long"))
      .withColumn("o_totalprice", lit(null).cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("c_rowkey"), col("c_mktsegment"),
        lit("B").as("side"), lit(op).as("op"))
    val aIns = orders.filter(col("o_orderkey") % 4 === 2)
    val aDel = a0.filter(col("o_orderkey") % 3 === 0)
    val bDel = dimAll.filter(col("o_custkey") % 8 === 0)
    Seq(aRow(aIns, "I"), bRow(bDel, "D"), aRow(aDel, "D"))
      .foreach(_.coalesce(1).write.mode("append").parquet(s"$root/cdc"))
    val q = JoinMaintenance.maintainSnowflakeViewTwoSided(spark,
      s"$root/cdc", s"$root/dim_init", s"$root/dimC", s"$root/v1",
      s"$root/v2", s"$root/bstate", s"$root/chk",
      "o_orderkey", "c_rowkey", "seg_id",
      Seq("o_custkey"), Seq("c_mktsegment"), maxFilesPerTrigger = 1,
      aggStateDir = Some(s"$root/agg"), aggKeys = Seq("c_mktsegment"),
      aggMeasures = Seq("o_totalprice"))
    q.awaitTermination()
    val aFinal = a0.filter(col("o_orderkey") % 3 =!= 0).unionByName(aIns)
    val bFinal = dimAll.filter(col("o_custkey") % 8 =!= 0)
    val wantV1 = v1Of(aFinal, bFinal)
    val wantV2 = IncrementalJoin.joinState(wantV1.select(abKey, col("*")),
      segs, Seq("c_mktsegment")).drop("__ab_key")
    val wantAgg = IncrementalAgg.state(wantV2,
      Seq("c_mktsegment"), Seq("o_totalprice"))
    val gotV1 = spark.read.parquet(s"$root/v1")
    val gotV2 = spark.read.parquet(s"$root/v2").drop("__ab_key")
    val gotAgg = spark.read.parquet(s"$root/agg").drop("_batch_id", "_batch_sig")
    assert(canon(gotV1.select(wantV1.columns.map(col): _*)) == canon(wantV1),
      "inner V1 must drop the deleted dims' pairs entirely")
    assert(canon(gotV2.select(wantV2.columns.map(col): _*)) == canon(wantV2),
      "the B deletes must cascade out of V2 too")
    assert(canon(gotAgg.select(wantAgg.columns.map(col): _*)) == canon(wantAgg))
    assert(canon(spark.read.parquet(s"$root/bstate")
      .select(bFinal.columns.map(col): _*)) == canon(bFinal))
    assert(bDel.count() > 0
      && gotV1.filter(col("o_custkey") % 8 === 0).count() == 0,
      "an inner view null-extends nothing — deleted keys vanish")
  }

  test("two-sided snowflake INNER mode rejects B-side inserts loudly, same as the one-level fold") {
    val root = java.nio.file.Files.createTempDirectory("graft-snow2inner")
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(20)
    val dim = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"),
        col("c_custkey").as("c_rowkey"), col("c_mktsegment"))
    dim.write.parquet(s"$root/dim_init")
    val segs = dim.select(col("c_mktsegment")).distinct()
      .select(col("c_mktsegment"), xxhash64(col("c_mktsegment")).as("seg_id"))
    segs.write.parquet(s"$root/dimC")
    val abKey = struct(col("o_orderkey"), col("c_rowkey")).as("__ab_key")
    val v1 = IncrementalJoin.joinState(orders, dim, Seq("o_custkey"))
    v1.write.parquet(s"$root/v1")
    IncrementalJoin.joinState(v1.select(abKey, col("*")), segs,
      Seq("c_mktsegment")).write.parquet(s"$root/v2")
    dim.limit(3)
      .withColumn("o_orderkey", lit(null).cast("long"))
      .withColumn("o_totalprice", lit(null).cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("c_rowkey"), col("c_mktsegment"),
        lit("B").as("side"), lit("I").as("op"))
      .coalesce(1).write.parquet(s"$root/cdc")
    val q = JoinMaintenance.maintainSnowflakeViewTwoSided(spark,
      s"$root/cdc", s"$root/dim_init", s"$root/dimC", s"$root/v1",
      s"$root/v2", s"$root/bstate", s"$root/chk",
      "o_orderkey", "c_rowkey", "seg_id",
      Seq("o_custkey"), Seq("c_mktsegment"))
    val e = intercept[Exception](q.awaitTermination())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("INNER view cannot")),
      s"expected the loud inner/B-insert guard, got: ${e.getMessage}")
  }

  test("empty view dir bootstraps from the first batch") {
    val root = java.nio.file.Files.createTempDirectory("graft-joinboot")
    val cdcDir = s"$root/cdc"
    val bDir = s"$root/dim"
    val viewDir = s"$root/view"
    val orders = Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .filter(col("o_orderkey") % 16 === 1)
    val custDim = Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    custDim.write.parquet(bDir)
    orders.withColumn("op", lit("I")).coalesce(1).write.parquet(cdcDir)
    val q = JoinMaintenance.maintainJoinView(spark, cdcDir, bDir, viewDir,
      s"$root/chk", "o_orderkey", "o_custkey", Seq("o_custkey"))
    q.awaitTermination()
    val want = IncrementalJoin.joinState(orders, custDim, Seq("o_custkey"))
    assert(canon(spark.read.parquet(viewDir)
      .select(want.columns.map(col): _*)) == canon(want))
    assert(want.count() > 0)
  }
}
