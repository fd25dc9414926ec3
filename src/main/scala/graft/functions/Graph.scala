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
    // lazy-checkpoint the edge relation: every round joins it, and without
    // truncation each round re-evaluates the caller's edge derivation
    // (measured: 5 re-scans of the doc→pair construction per query). Lazy
    // (not eager) so materialization folds into the caller's single action.
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint(false)
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct()
      .localCheckpoint(false)
    val outdeg = e.groupBy("__src").agg(count(lit(1)).as("__od"))
      .localCheckpoint(false)
    val base = Scale * (dampDen - dampNum) / dampDen // floor, constant
    var ranks = nodes.select(col("node"), lit(Scale).as("rank_micros"))
    for (_ <- 0 until iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "__src"), Seq("__src"))
        .join(outdeg, Seq("__src"))
        .select(col("__dst").as("node"),
          expr(s"(rank_micros * $dampNum) div (${dampDen}L * __od)").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__c"))
      // LAZY checkpoint: the logical plan is truncated to a LogicalRDD
      // immediately (the flat-lineage property this loop needs — see the
      // class doc), but nothing materializes until the caller's single
      // action, which computes the round chain as one job cascade. The
      // eager form blocked the driver once per round for no benefit: no
      // driver decision reads the data between rounds (unlike HITS, whose
      // per-round max-normalization collect forces eager rounds).
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("__c"), lit(0L))).as("rank_micros"))
        .localCheckpoint(false)
    }
    ranks
  }

  /** `iterations` rounds of integer HITS (Kleinberg 1999) over directed
    * `edges`: auth(v) = Σ hub(u) over in-edges, hub(u) = Σ auth(v) over
    * out-edges, each re-scaled to [[Scale]] micro-units by FLOOR-dividing
    * by the round's maximum — max-normalization instead of the classic
    * L2, because max of longs and floor division are exact integer
    * operations (L2 would drag in sqrt over sums of squares), so scores
    * are bit-identical across partitionings, engines, and runs (the
    * [[pageRankExact]] contract). The per-round maximum is a single long
    * collected to the driver (bounded by construction — the k-means
    * centroid argument).
    *
    * Scale shape: per round, two joins on the edge relation (each the
    * src- or dst-keyed equi-join) + two map-side-combinable sums + two
    * 1-row aggregations; score relations are `localCheckpoint`ed so
    * lineage stays flat. Returns (node, hub_micros, auth_micros). */
  def hitsExact(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 0)
    // lazy checkpoints throughout (see pageRankExact): each round's maxOf
    // collect is the only point that must block, and it materializes every
    // pending checkpoint below it in one job cascade.
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint(false)
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct()
      .localCheckpoint(false)
    def maxOf(df: DataFrame, c: String): Long =
      Option(df.agg(max(col(c))).head().get(0)).map(_.asInstanceOf[Long]).filter(_ > 0)
        .getOrElse(1L)
    var hubs = nodes.select(col("node"), lit(Scale).as("hub_micros"))
    var auths = nodes.select(col("node"), lit(Scale).as("auth_micros"))
    for (_ <- 0 until iterations) {
      val rawA = e.join(hubs.withColumnRenamed("node", "__src"), Seq("__src"))
        .groupBy(col("__dst").as("node")).agg(sum(col("hub_micros")).as("__ra"))
        .localCheckpoint(false)
      val mA = maxOf(rawA, "__ra")
      auths = nodes.join(rawA, Seq("node"), "left")
        .select(col("node"),
          expr(s"(coalesce(__ra, 0L) * $Scale) div ${mA}L").as("auth_micros"))
        .localCheckpoint(false)
      val rawH = e.join(auths.withColumnRenamed("node", "__dst"), Seq("__dst"))
        .groupBy(col("__src").as("node")).agg(sum(col("auth_micros")).as("__rh"))
        .localCheckpoint(false)
      val mH = maxOf(rawH, "__rh")
      hubs = nodes.join(rawH, Seq("node"), "left")
        .select(col("node"),
          expr(s"(coalesce(__rh, 0L) * $Scale) div ${mH}L").as("hub_micros"))
        .localCheckpoint(false)
    }
    hubs.join(auths, Seq("node"))
  }
}
