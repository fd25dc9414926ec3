package graft

import graft.checks.Checks
import graft.checks.Checks.{FailedChecksException, Threshold}

class ChecksSpec extends GraftSuite {
  import spark.implicits._

  private def df = Seq(
    (1, Some(10.0), "a"),
    (2, Some(20.0), "b"),
    (3, None, "a"),
    (3, Some(40.0), "c"))
    .toDF("id", "v", "tag")

  test("checkColumn computes null/distinct/unique/min/max in one pass") {
    val res = Checks.checkColumn(df, Map(
      "v" -> Map(
        "null_check" -> Threshold(equalTo = Some(1)),
        "min" -> Threshold(geqTo = Some(10)),
        "max" -> Threshold(leqTo = Some(40))),
      "id" -> Map(
        "distinct_check" -> Threshold(equalTo = Some(3)),
        "unique_check" -> Threshold(equalTo = Some(1)))))
    val byKey = res.map(r => (r.column, r.check) -> r).toMap
    assert(byKey(("v", "null_check")).result == 1.0)
    assert(byKey(("id", "distinct_check")).result == 3.0)
    assert(byKey(("id", "unique_check")).result == 1.0)
    assert(byKey(("v", "min")).result == 10.0)
    assert(byKey(("v", "max")).result == 40.0)
    assert(res.forall(_.success))
  }

  test("checkColumn fails on violated threshold") {
    val ex = intercept[FailedChecksException] {
      Checks.checkColumn(df, Map("v" -> Map("null_check" -> Threshold(equalTo = Some(0)))))
    }
    assert(ex.failures.head.column == "v")
  }

  test("tolerance widens equal_to (check_column.py _get_match parity)") {
    assert(Threshold(equalTo = Some(100), tolerance = Some(0.05)).passes(95))
    assert(Threshold(equalTo = Some(100), tolerance = Some(0.05)).passes(105))
    assert(!Threshold(equalTo = Some(100), tolerance = Some(0.05)).passes(94))
  }

  test("partition_clause filters before checking") {
    val res = Checks.checkColumn(df, Map("v" -> Map("null_check" -> Threshold(equalTo = Some(0)))),
      partitionClause = Some("tag <> 'a'"))
    assert(res.head.success)
  }

  test("checkTable evaluates named boolean checks over all rows") {
    val res = Checks.checkTable(df,
      Map("id_positive" -> "id > 0", "v_range" -> "v IS NULL OR v < 100"),
      failOnError = true)
    assert(res("id_positive") && res("v_range"))
    intercept[FailedChecksException] {
      Checks.checkTable(df, Map("v_small" -> "v < 40"))
    }
  }
}
