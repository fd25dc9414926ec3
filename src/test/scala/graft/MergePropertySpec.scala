package graft

import graft.core.ConflictStrategy
import graft.ops.Merge
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property tests for merge (SURVEY §5 test plan): invariants
  * that must hold for ANY target/source tables, not just fixtures. Runs
  * under sbt test via ScalaCheck's own framework (no scalatest bridge in
  * the offline cache).
  */
object MergePropertySpec extends Properties("Merge") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, Int, String)]] =
    Gen.listOfN(12, for {
      k <- Gen.choose(0, 8)
      v <- Gen.choose(0, 100)
      s <- Gen.oneOf("a", "b", "c")
    } yield (k, v, s)).map(_.distinctBy(_._1)).suchThat(_.nonEmpty)

  property("ignore: target rows survive unchanged; inserts = source anti keys") =
    Prop.forAll(rowsGen, rowsGen) { (t, s) =>
      val out = Merge.mergePlan(s.toDF("k", "v", "s"), t.toDF("k", "v", "s"),
        columns = Seq("k" -> "k", "v" -> "v"),
        conflictKeys = Seq("k"), strategy = ConflictStrategy.Ignore)
        .collect().map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2)))).toSet
      val tSet = t.map { case (k, v, str) => (k, v, Some(str)) }.toSet
      val tKeys = t.map(_._1).toSet
      val inserted = s.filterNot(r => tKeys(r._1)).map { case (k, v, _) => (k, v, None) }.toSet
      out == tSet ++ inserted
    }

  property("update: key union; mapped col from source on match; unmapped preserved") =
    Prop.forAll(rowsGen, rowsGen) { (t, s) =>
      val out = Merge.mergePlan(s.toDF("k", "v", "s"), t.toDF("k", "v", "s"),
        columns = Seq("k" -> "k", "v" -> "v"),
        conflictKeys = Seq("k"), strategy = ConflictStrategy.Update)
        .collect().map(r => r.getInt(0) -> (r.getInt(1), Option(r.getString(2)))).toMap
      val tMap = t.map(r => r._1 -> r).toMap
      val sMap = s.map(r => r._1 -> r).toMap
      out.keySet == tMap.keySet ++ sMap.keySet &&
        out.forall { case (k, (v, str)) =>
          (tMap.get(k), sMap.get(k)) match {
            case (Some(tr), Some(sr)) => v == sr._2 && str.contains(tr._3)
            case (Some(tr), None)     => v == tr._2 && str.contains(tr._3)
            case (None, Some(sr))     => v == sr._2 && str.isEmpty
            case (None, None)         => false
          }
        }
    }

  property("exception: throws iff key sets intersect") =
    Prop.forAll(rowsGen, rowsGen) { (t, s) =>
      val overlap = t.map(_._1).toSet.intersect(s.map(_._1).toSet).nonEmpty
      // materialize the rows (not count()): validation rides the output
      // projection, and a bare count prunes every column away
      def run() = Merge.surfacingConflicts {
        Merge.mergePlan(s.toDF("k", "v", "s"), t.toDF("k", "v", "s"),
          columns = Seq("k" -> "k", "v" -> "v"),
          conflictKeys = Seq("k"), strategy = ConflictStrategy.Exception).collect().length
      }
      if (overlap)
        Prop.throws(classOf[graft.core.MergeConflictException])(run()): Prop
      else Prop(run() == t.size + s.size): Prop
    }
}
