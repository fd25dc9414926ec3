package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge relations (domain ranking for crawl
  * prioritization — builder-prompt north star; no reference equivalent).
  *
  * PageRank here is EXACT-INTEGER: ranks live in micro-units (scale 10⁶)
  * and the damping factor is the rational 85/100, applied with floor
  * division — every iteration is pure integer arithmetic, so the result
  * is bit-identical across partitionings, engines, and runs (the same
  * reproducibility contract as [[Similarity.meanPoolExact]]). The FP
  * PageRank convergence story is unchanged at this precision; what the
  * integers buy is an oracle-checkable, audit-stable artifact.
  *
  * Scale shape: the edge relation is the only corpus-sized data; each
  * iteration is one join on src (co-partitioned with the out-degree
  * relation) plus a map-side-combinable sum onto node keys, and the rank
  * relation is `localCheckpoint`ed per round so lineage stays flat
  * (the [[Dedup.componentMin]] discipline). Dangling-node mass is
  * discarded (documented variant), keeping the iteration one join + one
  * aggregation with no global redistribution term.
  */
object Graph {

  val Scale: Long = 1000000L

  /** `iterations` rounds of integer PageRank over directed `edges`
    * (duplicate edges should be pre-deduplicated by the caller if simple
    * -graph semantics are wanted). Returns (node, rank_micros). */
  def pageRankExact(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iterations >= 0 && dampNum > 0 && dampDen >= dampNum)
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct()
      .localCheckpoint()
    val outdeg = e.groupBy("__src").agg(count(lit(1)).as("__od")).localCheckpoint()
    val base = Scale * (dampDen - dampNum) / dampDen // floor, constant
    var ranks = nodes.select(col("node"), lit(Scale).as("rank_micros"))
    for (_ <- 0 until iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "__src"), Seq("__src"))
        .join(outdeg, Seq("__src"))
        .select(col("__dst").as("node"),
          expr(s"(rank_micros * $dampNum) div (${dampDen}L * __od)").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__c"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("__c"), lit(0L))).as("rank_micros"))
        .localCheckpoint()
    }
    ranks
  }
}
