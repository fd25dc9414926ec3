package graft

import graft.sql.SqlDialect.toSparkSql

/** Postgres → Spark SQL dialect translation (graft.sql.SqlDialect):
  * string-level rewrites, pass-through pins for forms Spark accepts
  * natively, and end-to-end execution through GraftSession.transform
  * (the reference's dialect posture — transform.py:55-72 — passed SQL
  * straight to the warehouse engine; here the engine dialect is Spark,
  * so the common Postgres spellings must map). */
class SqlDialectSpec extends GraftSuite {
  import spark.implicits._

  private def pg(s: String) = toSparkSql(s, "postgres")

  test("postfix :: casts: atoms, function calls, parens, chains, precision") {
    assert(pg("SELECT a::int8 FROM t") == "SELECT CAST(a AS bigint) FROM t")
    assert(pg("SELECT count(*)::int4 FROM t")
      == "SELECT CAST(count(*) AS int) FROM t")
    assert(pg("SELECT (a + b)::float8 FROM t")
      == "SELECT CAST((a + b) AS double) FROM t")
    assert(pg("SELECT a::text::int8 FROM t")
      == "SELECT CAST(CAST(a AS string) AS bigint) FROM t")
    assert(pg("SELECT a::numeric(10,2) FROM t")
      == "SELECT CAST(a AS decimal(10,2)) FROM t")
    assert(pg("SELECT a::double precision FROM t")
      == "SELECT CAST(a AS double) FROM t")
    assert(pg("SELECT '42'::int8") == "SELECT CAST('42' AS bigint)")
  }

  test("explicit CAST type names map; :: inside strings/comments untouched") {
    assert(pg("SELECT CAST(a AS int8) FROM t") == "SELECT CAST(a AS bigint) FROM t")
    assert(pg("SELECT CAST(a AS double precision) FROM t")
      == "SELECT CAST(a AS double) FROM t")
    assert(pg("SELECT 'a::b' FROM t") == "SELECT 'a::b' FROM t")
    assert(pg("SELECT a FROM t -- x::int8\n") == "SELECT a FROM t -- x::int8\n")
    assert(pg("SELECT a /* c::int /* nested */ */ FROM t")
      == "SELECT a /* c::int /* nested */ */ FROM t")
  }

  test("quoted identifiers and dollar-quoted strings") {
    assert(pg("SELECT \"my col\" FROM \"T\"") == "SELECT `my col` FROM `T`")
    assert(pg("SELECT $$it's here$$") == "SELECT 'it''s here'")
    assert(pg("SELECT $tag$a$b$tag$") == "SELECT 'a$b'")
  }

  test("regex operators: ~, !~, ~*, !~*; unary bitwise ~ untouched") {
    assert(pg("SELECT * FROM t WHERE a ~ 'x'")
      == "SELECT * FROM t WHERE a  RLIKE  'x'")
    assert(pg("SELECT * FROM t WHERE a !~ 'x'")
      == "SELECT * FROM t WHERE a  NOT RLIKE  'x'")
    assert(pg("SELECT * FROM t WHERE a ~* 'x'")
      == "SELECT * FROM t WHERE upper(a) RLIKE upper('x')")
    assert(pg("SELECT * FROM t WHERE a !~* lower(p)")
      == "SELECT * FROM t WHERE NOT upper(a) RLIKE upper(lower(p))")
    assert(pg("SELECT ~ 5") == "SELECT ~ 5") // unary bitwise NOT
  }

  test("function renames and to_char format mapping") {
    assert(pg("SELECT now(), random(), strpos(a, 'x'), string_agg(a, ',') FROM t")
      == "SELECT current_timestamp(), rand(), instr(a, 'x'), listagg(a, ',') FROM t")
    assert(pg("SELECT to_char(d, 'YYYY-MM-DD') FROM t")
      == "SELECT date_format(d, 'yyyy-MM-dd') FROM t")
    assert(pg("SELECT to_char(d, 'HH24:MI:SS') FROM t")
      == "SELECT date_format(d, 'HH:mm:ss') FROM t")
    // non-literal format: left for Spark to reject, not silently changed
    assert(pg("SELECT to_char(d, f) FROM t") == "SELECT to_char(d, f) FROM t")
  }

  test("identity dialects and unknown dialect rejection") {
    assert(toSparkSql("SELECT 1::int", "spark") == "SELECT 1::int")
    val e = intercept[IllegalArgumentException](toSparkSql("SELECT 1", "oracle"))
    assert(e.getMessage.contains("oracle"))
  }

  test("end-to-end: Postgres-flavored transform over a real table") {
    val df = Seq(
      (1L, "Alpha Widget", 19.99, "2024-03-05"),
      (2L, "beta gadget", 5.25, "2024-03-17"),
      (3L, "GAMMA widget", 102.5, "2024-04-01"))
      .toDF("id", "name", "price", "day")
      .selectExpr("id", "name", "price", "CAST(day AS date) AS day")
    val out = g.transformLazy(
      """SELECT "id"::int8 AS id,
        |  to_char(day, 'YYYY-MM') AS month,
        |  (round(price * 100))::int8 AS cents
        |FROM {{src}}
        |WHERE name ~* 'widget' AND name !~ '^beta'
        |ORDER BY id""".stripMargin,
      Map("src" -> df), dialect = "postgres")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "2024-03", 1999L), (3L, "2024-04", 10250L)))
  }

  test("pass-through pins: ILIKE, ||, IS DISTINCT FROM, substring FROM FOR, split_part") {
    val df = Seq(("Alpha", "x"), ("beta", "y")).toDF("a", "b")
    val out = g.transformLazy(
      """SELECT a || '-' || b AS j,
        |  substring(a FROM 1 FOR 2) AS s2,
        |  split_part(a || '_' || b, '_', 2) AS sp
        |FROM {{src}} WHERE a ILIKE 'alp%' AND a IS DISTINCT FROM b
        |ORDER BY a""".stripMargin,
      Map("src" -> df), dialect = "postgres")
      .as[(String, String, String)].collect().toSeq
    assert(out == Seq(("Alpha-x", "Al", "x")))
  }

  test("snowflake: IFF/GETDATE/DATEADD/DATEDIFF/TO_VARCHAR/ZEROIFNULL/NULLIFZERO") {
    def sf(s: String) = toSparkSql(s, "snowflake")
    assert(sf("SELECT IFF(a > 1, 'x', 'y')") == "SELECT if(a > 1, 'x', 'y')")
    assert(sf("SELECT GETDATE()") == "SELECT current_timestamp()")
    assert(sf("SELECT DATEADD(day, 3, d) FROM t")
      == "SELECT timestampadd(day, 3, d) FROM t")
    assert(sf("SELECT DATEADD('day', 3, d) FROM t")
      == "SELECT timestampadd(day, 3, d) FROM t")
    assert(sf("SELECT DATEDIFF(month, a, b) FROM t")
      == "SELECT timestampdiff(month, a, b) FROM t")
    assert(sf("SELECT TO_VARCHAR(x) FROM t") == "SELECT CAST(x AS string) FROM t")
    assert(sf("SELECT TO_VARCHAR(d, 'YYYY-MM-DD') FROM t")
      == "SELECT date_format(d, 'yyyy-MM-dd') FROM t")
    assert(sf("SELECT ZEROIFNULL(x) FROM t") == "SELECT coalesce(x, 0) FROM t")
    assert(sf("SELECT NULLIFZERO(x) FROM t") == "SELECT nullif(x, 0) FROM t")
    assert(sf("SELECT x::number(10,2) FROM t")
      == "SELECT CAST(x AS decimal(10,2)) FROM t")
    // snowflake-only names untouched under postgres
    assert(pg("SELECT IFF(a, 'x', 'y')") == "SELECT IFF(a, 'x', 'y')")
  }

  test("nested rewrites translate through the fixpoint (calls inside :: operands)") {
    def sf(s: String) = toSparkSql(s, "snowflake")
    // IFF sits inside a sum that the :: pass wraps first — the fixpoint
    // re-lex must still reach it
    assert(sf("SELECT sum(IFF(a > 1, 1, 0))::int8 FROM t")
      == "SELECT CAST(sum(if(a > 1, 1, 0)) AS bigint) FROM t")
    assert(sf("SELECT ZEROIFNULL(NULLIFZERO(v)) FROM t")
      == "SELECT coalesce(nullif(v, 0), 0) FROM t")
    assert(pg("SELECT to_char(now(), 'YYYY') ")
      == "SELECT date_format(current_timestamp(), 'yyyy') ")
  }

  test("snowflake end-to-end: a Snowflake-flavored transform executes") {
    val df = Seq((1L, 10.0, "2024-03-05"), (2L, 0.0, "2024-03-20"))
      .toDF("id", "v", "day")
      .selectExpr("id", "v", "CAST(day AS date) AS day")
    val out = g.transformLazy(
      """SELECT id::int8 AS id,
        |  IFF(v > 5, 'hi', 'lo') AS bucket,
        |  ZEROIFNULL(NULLIFZERO(v)) AS v2,
        |  TO_VARCHAR(day, 'YYYY-MM') AS month,
        |  DATEDIFF(day, day, DATEADD(day, 7, day)) AS plus7
        |FROM {{src}} ORDER BY id""".stripMargin,
      Map("src" -> df), dialect = "snowflake")
      .as[(Long, String, Double, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "hi", 10.0, "2024-03", 7L),
      (2L, "lo", 0.0, "2024-03", 7L)))
  }

  test("bigquery: SAFE_CAST/FORMAT_DATE/TIMESTAMP_DIFF/INTERVAL math/types/strings") {
    def bq(s: String) = toSparkSql(s, "bigquery")
    assert(bq("SELECT SAFE_CAST(x AS INT64) FROM t")
      == "SELECT try_cast(x AS bigint) FROM t")
    assert(bq("SELECT FORMAT_DATE('%Y-%m', d) FROM t")
      == "SELECT date_format(d, 'yyyy-MM') FROM t")
    assert(bq("SELECT TIMESTAMP_DIFF(b, a, DAY) FROM t")
      == "SELECT timestampdiff(DAY, a, b) FROM t")
    assert(bq("SELECT DATE_ADD(d, INTERVAL 3 DAY) FROM t")
      == "SELECT (d + INTERVAL 3 DAY) FROM t")
    assert(bq("SELECT DATE_SUB(d, INTERVAL 1 MONTH) FROM t")
      == "SELECT (d - INTERVAL 1 MONTH) FROM t")
    assert(bq("SELECT ARRAY_LENGTH(xs), SAFE_DIVIDE(a, b) FROM t")
      == "SELECT size(xs), try_divide(a, b) FROM t")
    // BigQuery double quotes are STRINGS, not identifiers
    assert(bq("SELECT \"it's\" FROM t") == "SELECT 'it''s' FROM t")
    // redshift aliases the Postgres+DATEADD machinery
    assert(toSparkSql("SELECT GETDATE(), a::int8 FROM t", "redshift")
      == "SELECT current_timestamp(), CAST(a AS bigint) FROM t")
  }

  test("bigquery end-to-end: a BigQuery-flavored transform executes") {
    val df = Seq((1L, "2024-03-05"), (2L, "2024-04-20")).toDF("id", "day")
      .selectExpr("id", "CAST(day AS date) AS day")
    val out = g.transformLazy(
      """SELECT SAFE_CAST(id AS INT64) AS id,
        |  FORMAT_DATE('%Y-%m', day) AS month,
        |  DATE_DIFF(DATE_ADD(day, INTERVAL 7 DAY), day, DAY) AS plus7
        |FROM {{src}} ORDER BY id""".stripMargin,
      Map("src" -> df), dialect = "bigquery")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "2024-03", 7L), (2L, "2024-04", 7L)))
  }

  test("string_agg → listagg executes") {
    val df = Seq((1L, "b"), (1L, "a"), (2L, "c")).toDF("k", "v")
    val out = g.transformLazy(
      "SELECT k, string_agg(v, ',') AS vs FROM {{src}} GROUP BY k ORDER BY k",
      Map("src" -> df), dialect = "postgres")
      .as[(Long, String)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L))
    assert(out.head._2.split(",").sorted.toSeq == Seq("a", "b"))
  }
}
