package graft

import graft.functions.Sketch
import org.apache.spark.sql.functions._

/** KMV sketch laws: below-k exactness, partition invariance (the buffer
  * is a SET, so merge order is unobservable), the union merge law
  * (sketch of concatenation == k-min merge of sketches), duplicate
  * insensitivity, and estimator accuracy on a larger domain. */
class SketchSpec extends GraftSuite {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
    df.select(Sketch.kmvHash(col("v")).as("h"))
      .groupBy().agg(Sketch.kmv(col("h"), k).as("km"))
      .select("km").as[Seq[Long]].head()

  test("below k distinct values the sketch is exhaustive and the estimate exact") {
    val d = (1 to 10).flatMap(i => Seq(s"item$i", s"item$i")).toDF("v")
    val km = sketch(d, 16)
    assert(km.size == 10)
    assert(km == km.sorted)
    val est = d.select(Sketch.kmvHash(col("v")).as("h"))
      .groupBy().agg(Sketch.kmv(col("h"), 16).as("km"))
      .select(Sketch.kmvEstimate(col("km"), 16)).as[Double].head()
    assert(est == 10.0)
  }

  test("sketch is partition-invariant") {
    val d = (1 to 5000).map(i => s"w$i").toDF("v")
    val a = sketch(d.repartition(1), 32)
    val b = sketch(d.repartition(17), 32)
    assert(a == b)
  }

  test("kmvEstimate is total: all-NULL group, NULL sketch, ANSI mode on") {
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      // an all-NULL group folds to an EMPTY sketch → exact estimate 0.0,
      // no out-of-bounds element access under ANSI
      val d = Seq[Option[String]](None, None, None).toDF("v")
      val est = d.select(Sketch.kmvHash(col("v")).as("h"))
        .groupBy().agg(Sketch.kmv(col("h"), 8).as("km"))
        .select(Sketch.kmvEstimate(col("km"), 8).as("e"))
        .as[Option[Double]].head()
      assert(est.contains(0.0))
      // a NULL sketch column yields NULL, never legacy size(NULL) = -1
      val n = Seq(1).toDF("x")
        .select(Sketch.kmvEstimate(lit(null).cast("array<bigint>"), 8).as("e"))
        .as[Option[Double]].head()
      assert(n.isEmpty)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
    // and with ANSI back off, the NULL sketch still yields NULL
    val off = Seq(1).toDF("x")
      .select(Sketch.kmvEstimate(lit(null).cast("array<bigint>"), 8).as("e"))
      .as[Option[Double]].head()
    assert(off.isEmpty)
  }

  test("duplicated input leaves the sketch unchanged") {
    val d = (1 to 500).map(i => s"w$i").toDF("v")
    assert(sketch(d, 32) == sketch(d.union(d).union(d), 32))
  }

  test("merge law: sketch(A ++ B) == kmvUnion(sketch(A), sketch(B))") {
    val a = (1 to 800).map(i => s"a$i").toDF("v")
    val b = (500 to 1300).map(i => s"b$i").toDF("v")
    val full = sketch(a.union(b), 24)
    val merged = a.select(Sketch.kmvHash(col("v")).as("h"))
      .groupBy().agg(Sketch.kmv(col("h"), 24).as("ka"))
      .crossJoin(b.select(Sketch.kmvHash(col("v")).as("h"))
        .groupBy().agg(Sketch.kmv(col("h"), 24).as("kb")))
      .select(Sketch.kmvUnion(col("ka"), col("kb"), 24).as("ku"))
      .as[Seq[Long]].head()
    assert(full == merged)
  }

  private def qsketch(
      df: org.apache.spark.sql.DataFrame, k: Int): (Long, Seq[Long]) = {
    val row = df
      .select(Sketch.kmvQuantilePack(col("id"), col("v")).as("p"))
      .groupBy().agg(Sketch.kmv(col("p"), k).as("km"))
      .select(size(col("km")).cast("long").as("m"),
        Sketch.kmvSampleValues(col("km")).as("vals"))
      .as[(Long, Seq[Long])].head()
    row
  }

  test("quantile sketch: below k items the sample is the whole group and quantiles exact") {
    val d = (1 to 40).map(i => (i.toLong, (i * 7L) % 100)).toDF("id", "v")
    val (m, vals) = qsketch(d, 64)
    assert(m == 40)
    assert(vals == d.select("v").as[Long].collect().sorted.toSeq)
    val p50 = d.select(Sketch.kmvQuantilePack(col("id"), col("v")).as("p"))
      .groupBy().agg(Sketch.kmv(col("p"), 64).as("km"))
      .select(Sketch.kmvQuantileAt(Sketch.kmvSampleValues(col("km")), 50))
      .as[Long].head()
    // nearest-lower rank 1 + floor(50·39/100) = 20 of the 40 sorted values
    assert(p50 == d.select("v").as[Long].collect().sorted.apply(19))
  }

  test("quantile sketch is partition-invariant") {
    val d = (1 to 5000).map(i => (i.toLong, i * 3L)).toDF("id", "v")
    assert(qsketch(d.repartition(1), 32) == qsketch(d.repartition(17), 32))
  }

  test("quantile sketch clamps values into the 24-bit domain") {
    val d = Seq((1L, -5L), (2L, 1L << 30)).toDF("id", "v")
    val (_, vals) = qsketch(d, 8)
    assert(vals == Seq(0L, (1L << 24) - 1))
  }

  test("quantile sketch estimates land near exact quantiles at k=256") {
    val n = 20000
    val d = (1 to n).map(i => (i.toLong, i.toLong)).toDF("id", "v") // values 1..n
    val sorted = d.select(Sketch.kmvQuantilePack(col("id"), col("v")).as("p"))
      .groupBy().agg(Sketch.kmv(col("p"), 256).as("km"))
      .select(Sketch.kmvQuantileAt(Sketch.kmvSampleValues(col("km")), 50))
      .as[Long].head()
    // sample median of a uniform bottom-k-by-hash sample: rank rsd
    // ~ 1/(2·sqrt(k)) ≈ 3.1%; allow 5 sigma
    assert(math.abs(sorted - n / 2) < 0.16 * n, s"p50=$sorted")
  }

  test("estimator lands near the true cardinality at k=128") {
    val n = 20000
    val d = (1 to n).map(i => s"word$i").toDF("v")
    val est = d.select(Sketch.kmvHash(col("v")).as("h"))
      .groupBy().agg(Sketch.kmv(col("h"), 128).as("km"))
      .select(Sketch.kmvEstimate(col("km"), 128)).as[Double].head()
    // deterministic given md5; ~1/sqrt(126) ≈ 9% rsd, allow 4 sigma
    assert(math.abs(est - n) < 0.36 * n, s"est=$est")
  }
}
