package graft

import graft.core.MergeConflictException
import graft.ops.{Merge, Scd2}
import org.apache.spark.sql.functions._

/** Type-2 SCD semantics: the four decision branches on a hand-checked
  * dimension, null-safe attribute comparison, history immutability,
  * idempotent re-application, and the in-plan duplicate-source-key
  * guard. */
class Scd2Spec extends GraftSuite {
  import spark.implicits._

  private def dim(rows: (Long, String, Option[String], String, Option[String], Boolean)*) =
    rows.toDF("id", "seg", "city", "valid_from", "valid_to", "is_current")
      .select(col("id"), col("seg"), col("city"),
        to_date(col("valid_from")).as("valid_from"),
        to_date(col("valid_to")).as("valid_to"), col("is_current"))

  private val target = dim(
    (1L, "A", Some("rome"), "2019-01-01", Some("2020-01-01"), false), // history
    (1L, "B", Some("rome"), "2020-01-01", None, true),
    (2L, "C", None, "2020-01-01", None, true),
    (3L, "D", Some("oslo"), "2020-01-01", None, true))

  private def apply(src: org.apache.spark.sql.DataFrame) =
    Scd2.scd2Plan(target, src, Seq("id"), Seq("seg", "city"), lit("2021-06-01"))
      .select(col("id"), col("seg"), col("city"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("is_current"))
      .as[(Long, String, Option[String], String, Option[String], Boolean)]
      .collect().sortBy(r => (r._1, r._4)).toSeq

  test("changed, unchanged, new, and history branches in one batch") {
    val src = Seq(
      (1L, "B2", Some("rome")),  // changed seg → close + new version
      (2L, "C", None),           // identical (null city, null-safe) → untouched
      (4L, "E", Some("kyiv")))   // new key → insert
      .toDF("id", "seg", "city")
    val out = apply(src)
    assert(out == Seq(
      (1L, "A", Some("rome"), "2019-01-01", Some("2020-01-01"), false),
      (1L, "B", Some("rome"), "2020-01-01", Some("2021-06-01"), false),
      (1L, "B2", Some("rome"), "2021-06-01", None, true),
      (2L, "C", None, "2020-01-01", None, true),
      (3L, "D", Some("oslo"), "2020-01-01", None, true),
      (4L, "E", Some("kyiv"), "2021-06-01", None, true)))
  }

  test("null transitions compare null-safely in both directions") {
    val src = Seq(
      (2L, "C", Some("lima")),   // null → value: changed
      (3L, "D", None))           // value → null: changed
      .toDF("id", "seg", "city")
    val out = apply(src)
    assert(out.count(_._6) == 3) // ids 1 (untouched current), 2, 3 new versions
    assert(out.contains((2L, "C", Some("lima"), "2021-06-01", None, true)))
    assert(out.contains((3L, "D", None, "2021-06-01", None, true)))
    assert(out.contains((2L, "C", None, "2020-01-01", Some("2021-06-01"), false)))
  }

  test("an identical batch is a no-op (idempotent re-application)") {
    val src = Seq((1L, "B", Some("rome")), (2L, "C", Option.empty[String]),
      (3L, "D", Some("oslo"))).toDF("id", "seg", "city")
    val before = target
      .select(col("id"), col("seg"), col("city"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("is_current"))
      .as[(Long, String, Option[String], String, Option[String], Boolean)]
      .collect().sortBy(r => (r._1, r._4)).toSeq
    assert(apply(src) == before)
  }

  test("duplicate source keys raise the typed merge conflict in-plan") {
    val src = Seq((2L, "X", Option.empty[String]), (2L, "Y", Option.empty[String]))
      .toDF("id", "seg", "city")
    intercept[MergeConflictException] {
      Merge.surfacingConflicts {
        Scd2.scd2Plan(target, src, Seq("id"), Seq("seg", "city"),
          lit("2021-06-01")).collect()
      }
    }
  }

  test("duplicate source keys raise even when every duplicate matches the current version") {
    // both rows identical to id=2's current attributes: no changed key,
    // no insert — the guard must still fire on the kept-current branch
    val src = Seq((2L, "C", Option.empty[String]), (2L, "C", Option.empty[String]))
      .toDF("id", "seg", "city")
    intercept[MergeConflictException] {
      Merge.surfacingConflicts {
        Scd2.scd2Plan(target, src, Seq("id"), Seq("seg", "city"),
          lit("2021-06-01")).collect()
      }
    }
  }

  test("NULL source keys raise in-plan instead of inserting null-key current rows") {
    // a NULL key slips through every null-unsafe branch join (never
    // matching cur, never matching dupKeys) — without the guard, two
    // such rows would silently become two is_current rows
    val src = Seq(("X", Option.empty[String]), ("Y", Option.empty[String]))
      .toDF("seg", "city")
      .select(org.apache.spark.sql.functions.lit(null).cast("bigint").as("id"),
        col("seg"), col("city"))
    intercept[MergeConflictException] {
      Merge.surfacingConflicts {
        Scd2.scd2Plan(target, src, Seq("id"), Seq("seg", "city"),
          lit("2021-06-01")).collect()
      }
    }
  }

  test("a NULL is_current row is kept verbatim as history, never dropped") {
    val dirty = Seq((5L, "Z", Option("bonn"), "2018-01-01",
        Option.empty[String], Option.empty[Boolean]))
      .toDF("id", "seg", "city", "valid_from", "valid_to", "is_current")
      .select(col("id"), col("seg"), col("city"),
        to_date(col("valid_from")).as("valid_from"),
        to_date(col("valid_to")).as("valid_to"),
        col("is_current").cast("boolean").as("is_current"))
    val tgt = target.unionByName(dirty)
    // source touches id=5 too: the dirty row must not be compared or
    // closed, and the batch must still insert a fresh current version
    val src = Seq((5L, "Z2", Some("bonn"))).toDF("id", "seg", "city")
    val out = Scd2.scd2Plan(tgt, src, Seq("id"), Seq("seg", "city"),
        lit("2021-06-01"))
      .select(col("id"), col("seg"), col("city"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("is_current"))
      .as[(Long, String, Option[String], String, Option[String], Option[Boolean])]
      .collect().sortBy(r => (r._1, r._4)).toSeq
    assert(out.size == tgt.count().toInt + 1) // nothing dropped, one insert
    assert(out.contains((5L, "Z", Some("bonn"), "2018-01-01", None, None)))
    assert(out.contains((5L, "Z2", Some("bonn"), "2021-06-01", None, Some(true))))
  }
}
