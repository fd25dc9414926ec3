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
