package graft

import org.apache.spark.sql.functions._

/** Dev scratch probe: ad-hoc cardinality/cost questions during
  * optimization rounds (no driver contract rides on this). Edit the body
  * as needed; keep each round's findings in OPTIMIZATION_r*.md. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.localSpark()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    // p_dedup_semantic corpus at xM: scaled embeddings + exact copies
    val e0 = graft.ops.Scale.scaleEmbeddings(
      Tables.read(spark, sfDir, "embeddings"), mult, dim = 64)
      .select("vec_id", "embedding")
    val corpus = e0.unionByName(
      e0.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val index = graft.functions.Similarity.buildIvfIndex(corpus, "vec_id", "embedding", 16)
    val cells = index.cells.persist()
    println("PROBE cells=" + cells.count())
    // combos today: sum over cells of n^2
    val byCell = cells.groupBy("__cid").agg(count(lit(1)).as("n")).persist()
    println("PROBE combos_now=" + byCell.agg(sum(col("n") * col("n"))).head.getLong(0))
    // combos with first-coordinate banding at w = sqrt(2-2*0.98) = 0.2,
    // one side exploded to {b-1, b, b+1}: sum over (cid, b) of n_b * (n_{b-1}+n_b+n_{b+1})
    val w = math.sqrt(2.0 - 2.0 * 0.98)
    val banded = cells.select(col("__cid"),
      floor(element_at(col("__cv"), 1) / lit(w)).cast("long").as("__b"))
      .groupBy("__cid", "__b").agg(count(lit(1)).as("nb")).persist()
    val a = banded.select(col("__cid"), col("__b"), col("nb").as("na"))
    val b = banded.select(col("__cid"), explode(array(col("__b") - 1, col("__b"), col("__b") + 1)).as("__b"), col("nb"))
    val combosBand = a.join(b, Seq("__cid", "__b"))
      .agg(sum(col("na") * col("nb"))).head.getLong(0)
    println("PROBE combos_band1=" + combosBand)
    // two-coordinate banding (coords 1 and 2), 3x3 adjacency
    val banded2 = cells.select(col("__cid"),
      floor(element_at(col("__cv"), 1) / lit(w)).cast("long").as("__b1"),
      floor(element_at(col("__cv"), 2) / lit(w)).cast("long").as("__b2"))
      .groupBy("__cid", "__b1", "__b2").agg(count(lit(1)).as("nb")).persist()
    val a2 = banded2.select(col("__cid"), col("__b1"), col("__b2"), col("nb").as("na"))
    val b2 = banded2.select(col("__cid"),
      explode(array((-1 to 1).flatMap(d1 => (-1 to 1).map(d2 =>
        struct((col("__b1") + d1).as("__b1"), (col("__b2") + d2).as("__b2")))): _*)).as("__bb"), col("nb"))
      .select(col("__cid"), col("__bb.__b1").as("__b1"), col("__bb.__b2").as("__b2"), col("nb"))
    val combosBand2 = a2.join(b2, Seq("__cid", "__b1", "__b2"))
      .agg(sum(col("na") * col("nb"))).head.getLong(0)
    println("PROBE combos_band2=" + combosBand2)
    spark.stop()
  }
}
