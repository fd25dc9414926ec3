package graft

import graft.core._
import graft.ops.Merge
import org.apache.spark.sql.Row

/** Merge semantics against the reference's homes fixture values
  * (tests_integration/sql/operators/test_merge.py:27-120; data
  * tests/data/homes_merge_1.csv + homes_merge_2.csv).
  */
class MergeSpec extends GraftSuite {
  import spark.implicits._

  // homes_merge_1.csv (target): sell,list,taxes,age
  private def target = Seq(
    (142, 160, 3167.0, 60.0),
    (175, 180, 4033.0, 12.0),
    (129, 132, 1471.0, 41.0),
    (138, 140, 3204.0, 22.0))
    .toDF("sell", "list", "taxes", "age")

  // homes_merge_2.csv (source): sell,list,age
  private def source = Seq(
    (142, 160, 1.0),
    (175, 180, 1.0),
    (129, 132, 1.0),
    (138, 140, 1.0),
    (232, 240, 1.0))
    .toDF("sell", "list", "age")

  private def rowsByList(df: org.apache.spark.sql.DataFrame): Map[Int, Row] =
    df.collect().map(r => r.getInt(r.fieldIndex("list")) -> r).toMap

  test("ignore on single conflict key keeps target rows, inserts new key") {
    val out = Merge.mergePlan(source, target,
      columns = Seq("list" -> "list"),
      conflictKeys = Seq("list"),
      strategy = ConflictStrategy.Ignore)
    val rows = rowsByList(out)
    assert(rows.keySet == Set(160, 180, 132, 140, 240))
    // pre-existing rows untouched (test_merge.py single-mode expectations)
    assert(rows(160).getDouble(rows(160).fieldIndex("taxes")) == 3167.0)
    assert(rows(160).getDouble(rows(160).fieldIndex("age")) == 60.0)
    // inserted row: only mapped column (list) set, others null
    assert(rows(240).isNullAt(rows(240).fieldIndex("sell")))
    assert(rows(240).isNullAt(rows(240).fieldIndex("taxes")))
  }

  test("ignore on multi conflict key") {
    val out = Merge.mergePlan(source, target,
      columns = Seq("list" -> "list", "sell" -> "sell"),
      conflictKeys = Seq("list", "sell"),
      strategy = ConflictStrategy.Ignore)
    val rows = rowsByList(out)
    assert(rows.keySet == Set(160, 180, 132, 140, 240))
    assert(rows(180).getDouble(rows(180).fieldIndex("taxes")) == 4033.0)
    assert(rows(240).getInt(rows(240).fieldIndex("sell")) == 232)
    assert(rows(240).isNullAt(rows(240).fieldIndex("taxes")))
  }

  test("update maps source age onto target taxes, preserves unmapped age") {
    val out = Merge.mergePlan(source, target,
      columns = Seq("list" -> "list", "sell" -> "sell", "age" -> "taxes"),
      conflictKeys = Seq("list", "sell"),
      strategy = ConflictStrategy.Update)
    val rows = rowsByList(out)
    // test_merge.py update-mode: taxes all 1.0; age preserved, NaN for new row
    assert(rows.values.forall(r => r.getDouble(r.fieldIndex("taxes")) == 1.0))
    assert(rows(160).getDouble(rows(160).fieldIndex("age")) == 60.0)
    assert(rows(140).getDouble(rows(140).fieldIndex("age")) == 22.0)
    assert(rows(240).isNullAt(rows(240).fieldIndex("age")))
  }

  test("exception mode raises on key collision") {
    // validation is in-plan (no eager job): the raise fires when the plan
    // executes and surfacingConflicts recovers the typed exception
    intercept[MergeConflictException] {
      Merge.surfacingConflicts {
        Merge.mergePlan(source, target,
          columns = Seq("list" -> "list"),
          conflictKeys = Seq("list"),
          strategy = ConflictStrategy.Exception).collect()
      }
    }
  }

  test("exception mode inserts when keys are disjoint") {
    val disjoint = Seq((900, 901, 1.0)).toDF("sell", "list", "age")
    val out = Merge.mergePlan(disjoint, target,
      columns = Seq("list" -> "list", "sell" -> "sell"),
      conflictKeys = Seq("list"),
      strategy = ConflictStrategy.Exception)
    assert(out.count() == 5)
  }

  test("empty column mapping defaults to all source columns by name") {
    val out = Merge.mergePlan(source, target,
      columns =Nil,
      conflictKeys = Seq("list", "sell"),
      strategy = ConflictStrategy.Ignore)
    val rows = rowsByList(out)
    assert(rows.keySet == Set(160, 180, 132, 140, 240))
    // the inserted row carries all shared source columns, unmapped = null
    assert(rows(240).getDouble(rows(240).fieldIndex("age")) == 1.0)
    assert(rows(240).isNullAt(rows(240).fieldIndex("taxes")))
  }

  test("update fails on duplicate source conflict keys (in-plan, at execution)") {
    import spark.implicits._
    val dup = source.unionAll(Seq((142, 160, 2.0)).toDF("sell", "list", "age"))
    intercept[MergeConflictException] {
      Merge.surfacingConflicts {
        Merge.mergePlan(dup, target,
          columns = Seq("list" -> "list", "sell" -> "sell", "age" -> "taxes"),
          conflictKeys = Seq("list", "sell"),
          strategy = ConflictStrategy.Update).collect()
      }
    }
  }

  test("conflict keys must be covered by the mapping") {
    intercept[IllegalArgumentException] {
      Merge.mergePlan(source, target,
        columns = Seq("age" -> "taxes"),
        conflictKeys = Seq("list"),
        strategy = ConflictStrategy.Ignore)
    }
  }
}
