package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-arithmetic checks for the round-8 profiling additions:
  * equi-width histogram and embedding standardization. */
class ProfilingExtraSpec extends SparkTestBase {
  import spark.implicits._

  test("histogramEquiWidth: hand bins, max lands in the LAST bin, width-0 guard") {
    // values 0..10 over [0,10] with 5 bins of width 2: 0,1→bin0 … 8,9→bin4,
    // and the max value 10 clamps into bin 4 (not a phantom bin 5)
    val df = (0 to 10).map(_.toDouble).toDF("v")
    val got = Profiling.histogramEquiWidth(df, "v", nBins = 5)
      .orderBy("bin")
      .as[(Long, Double, Double, Long)].collect().toList
    assert(got == List(
      (0L, 0.0, 2.0, 2L), (1L, 2.0, 4.0, 2L), (2L, 4.0, 6.0, 2L),
      (3L, 6.0, 8.0, 2L), (4L, 8.0, 10.0, 3L)))

    // constant column: one bin, zero width, all rows
    val const = Seq(7.0, 7.0, 7.0).toDF("v")
    val g2 = Profiling.histogramEquiWidth(const, "v", nBins = 4)
      .as[(Long, Double, Double, Long)].collect().toList
    assert(g2 == List((0L, 7.0, 7.0, 3L)))

    // nulls are excluded from both the envelope and the counts
    val withNull = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    assert(Profiling.histogramEquiWidth(withNull, "v", nBins = 2)
      .agg(sum("n")).as[Long].head() == 2L)
  }

  test("ksTwoSample: hand D, first-attaining location, zero on identical samples") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    // F_a - F_b peaks at 0.5 first reached at v=2
    val r = Profiling.ksTwoSample(a, b, "v")
      .as[(Long, Long, Double, Double)].head()
    assert(r == ((4L, 4L, 0.5, 2.0)))
    val same = Profiling.ksTwoSample(a, a, "v")
      .as[(Long, Long, Double, Double)].head()
    assert(same._3 == 0.0)
  }

  test("ksTwoSample two-phase prefix sum equals a single-window reference on real data") {
    import org.apache.spark.sql.expressions.Window
    val orders = graft.sources.Tables.load(spark, sf(), "orders")
    val a = orders.filter(col("o_orderstatus") === "O")
    val b = orders.filter(col("o_orderstatus") === "F")
    val got = Profiling.ksTwoSample(a, b, "o_totalprice")
      .as[(Long, Long, Double, Double)].head()
    // reference: plain global window (fine at test scale, the thing the
    // operator exists to avoid at 100 TB)
    def h(df: org.apache.spark.sql.DataFrame, c: String, z: String) =
      df.select(col("o_totalprice").cast("double").as("v"))
        .where(col("v").isNotNull).groupBy("v")
        .agg(count(lit(1)).as(c)).withColumn(z, lit(0L))
    val m = h(a, "ca", "cb").select("v", "ca", "cb")
      .unionByName(h(b, "cb", "ca").select("v", "ca", "cb"))
      .groupBy("v").agg(sum("ca").as("ca"), sum("cb").as("cb"))
    val na = m.agg(sum("ca")).as[Long].head()
    val nb = m.agg(sum("cb")).as[Long].head()
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val dd = m.select(col("v"),
      abs(sum("ca").over(w).cast("double") / na -
        sum("cb").over(w).cast("double") / nb).as("dd"))
    val dmax = dd.agg(max("dd")).as[Double].head()
    val dat = dd.filter(col("dd") === dmax).agg(min("v")).as[Double].head()
    assert(got._1 == na && got._2 == nb)
    assert(got._3 == math.rint(dmax * 1e6) / 1e6 || got._3 == BigDecimal(dmax)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got._4 == dat)
  }

  test("cumeDistBy equals window cume_dist, ties and nulls included") {
    import org.apache.spark.sql.expressions.Window
    // ties: two 5.0s share cume 0.75; null value gets null cume
    val df = Seq(Some(1.0), Some(5.0), Some(5.0), Some(9.0), None).toDF("v")
    val got = Profiling.cumeDistBy(df, "v")
      .select(col("v"), col("cume_dist")).orderBy(asc_nulls_first("v"))
      .as[(Option[Double], Option[Double])].collect().toList
    assert(got == List(
      (None, None), (Some(1.0), Some(0.25)), (Some(5.0), Some(0.75)),
      (Some(5.0), Some(0.75)), (Some(9.0), Some(1.0))))

    val orders = graft.sources.Tables.load(spark, sf(), "orders")
    val mine = Profiling.cumeDistBy(orders, "o_totalprice")
      .select(col("o_orderkey").as("k"), col("cume_dist").as("c"))
    val window = orders.select(col("o_orderkey").as("k"),
      cume_dist().over(Window.orderBy(col("o_totalprice").cast("double"))).as("c"))
    assert(mine.exceptAll(window).isEmpty && window.exceptAll(mine).isEmpty)
  }

  test("standardizeDims: hand z-scores; standardized dims have mean 0 and sd 1") {
    // dim 0: values 1, 3 → mean 2, sd 1 → z = -1, +1
    // dim 1: values 5, 5 → sd 0 → z = 0 (guard, not NaN)
    val e = Seq((1L, Seq(1.0f, 5.0f)), (2L, Seq(3.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val z = Similarity.standardizeDims(e, "vec_id", "embedding")
      .orderBy("vec_id", "dim")
      .as[(Long, Long, Double)].collect().toList
    assert(z == List((1L, 0L, -1.0), (1L, 1L, 0.0), (2L, 0L, 1.0), (2L, 1L, 0.0)))

    // on real data: every non-constant dimension re-profiles to
    // mean ≈ 0, population sd ≈ 1
    val emb = graft.sources.Tables.load(spark, sf(), "embeddings")
    val stats = Similarity.standardizeDims(emb, "vec_id", "embedding")
      .groupBy("dim")
      .agg(avg("z").as("m"),
        sqrt(avg(col("z") * col("z")) - avg("z") * avg("z")).as("sd"))
      .agg(max(abs(col("m"))).as("worst_mean"),
        max(abs(col("sd") - 1.0)).as("worst_sd"))
      .as[(Double, Double)].head()
    assert(stats._1 < 1e-9, s"standardized mean drifted: ${stats._1}")
    assert(stats._2 < 1e-6, s"standardized sd drifted: ${stats._2}")
  }

  test("trendFit: exact line recovered exactly; noise case matches hand OLS") {
    // y = 3x + 2 exactly: decimal sums + the closed form give slope 3.0,
    // intercept 2.0, r2 1.0 with NO floating error (the products and the
    // closed-form divisions are all exact in these small integers)
    val line = Seq(("g", 0, 2.0), ("g", 1, 5.0), ("g", 2, 8.0), ("g", 3, 11.0))
      .toDF("grp", "x", "y")
    val got = Profiling.trendFit(line, Seq("grp"), "x", "y")
      .select("n", "slope", "intercept", "r2")
      .as[(Long, Double, Double, Double)].head()
    assert(got == ((4L, 3.0, 2.0, 1.0)))

    // hand OLS on a non-collinear triple: x=0,1,2, y=0,1,3
    // n=3 sx=3 sy=4 sxy=7 sxx=5 syy=10
    // slope=(21-12)/(15-9)=1.5; intercept=(4-1.5*3)/3=-1/6; r2=81/(6*14)
    val tri = Seq(("g", 0, 0.0), ("g", 1, 1.0), ("g", 2, 3.0))
      .toDF("grp", "x", "y")
    val t2 = Profiling.trendFit(tri, Seq("grp"), "x", "y")
      .select("slope", "intercept", "r2")
      .as[(Double, Double, Double)].head()
    assert(t2._1 == 1.5)
    assert(t2._2 == (4.0 - 1.5 * 3.0) / 3.0)
    assert(t2._3 == 81.0 / 84.0)
  }

  test("trendFit: degenerate groups go NULL, never Inf/NaN; nulls filtered") {
    val df = Seq(
      ("single", Some(1), Some(5.0)),   // n=1 → zero x-variance
      ("constx", Some(2), Some(1.0)), ("constx", Some(2), Some(9.0)),
      ("consty", Some(1), Some(4.0)), ("consty", Some(3), Some(4.0)),
      ("nully", Some(1), None), ("nully", Some(2), Some(7.0)),
      ("nully", Some(3), Some(9.0)), ("nully", None, Some(99.0)))
      .toDF("grp", "x", "y")
    val rows = Profiling.trendFit(df, Seq("grp"), "x", "y")
      .orderBy("grp")
      .select("grp", "n", "slope", "intercept", "r2")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toList
    assert(rows.map(_._1) == List("constx", "consty", "nully", "single"))
    val byG = rows.map(r => r._1 -> r).toMap
    assert(byG("single")._2 == 1L && byG("single")._3.isEmpty
      && byG("single")._4.isEmpty && byG("single")._5.isEmpty)
    assert(byG("constx")._3.isEmpty && byG("constx")._5.isEmpty,
      "zero x-variance must yield NULL slope and r2")
    // constant y: slope 0 is well-defined, r2 is 0/0 → NULL
    assert(byG("consty")._3 == Some(0.0) && byG("consty")._5.isEmpty)
    // null x or y rows are excluded: n counts only complete pairs
    assert(byG("nully")._2 == 2L && byG("nully")._3 == Some(2.0))
  }

  test("trendFit: FRACTIONAL constant x still yields NULL (decimal-exact degeneracy, not denx==0)") {
    // x = 0.1 twice: in doubles denx = 2*0.02 - 0.2*0.2 ≈ -6.9e-18 ≠ 0,
    // so a double-zero test would emit garbage slope ≈ 32; the exact
    // decimal min==max test must catch it
    val df = Seq(("g", 0.1, 1.0), ("g", 0.1, 9.0)).toDF("grp", "x", "y")
    val r = Profiling.trendFit(df, Seq("grp"), "x", "y")
      .select("slope", "intercept", "r2").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      s"fractional constant x must be NULL-degenerate, got $r")
  }

  test("trendFit: a value overflowing the declared decimal type raises, never silently drops") {
    // under Spark's default ANSI mode the CAST itself throws
    // (NUMERIC_VALUE_OUT_OF_RANGE); with ansi.enabled=false the cast
    // nulls and trendFit's own raise_error guard fires instead — either
    // way the overflow is LOUD, never a silently skewed fit
    val df = Seq(("g", 1, 1.0e16), ("g", 2, 2.0)).toDF("grp", "x", "y")
    val e = intercept[Exception](
      Profiling.trendFit(df, Seq("grp"), "x", "y").collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("overflows") || m.contains("cannot be represented")),
      s"expected a loud overflow error, got: ${e.getMessage}")
  }
}
