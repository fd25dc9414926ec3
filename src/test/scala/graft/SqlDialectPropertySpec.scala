package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.sql.SqlDialect.toSparkSql

/** Property pins for the dialect translator:
  *  - IDEMPOTENCE on backslash-free inputs: translating the
  *    translator's own output is a no-op (every rewrite emits a form
  *    that is not itself a rewrite candidate — the fixpoint-convergence
  *    argument, checked mechanically over a generated grammar).
  *    (Backslash-bearing literals are deliberately excluded: the final
  *    standard-conforming-string escape pass is Postgres→Spark, so its
  *    OUTPUT is Spark SQL, not a Postgres input — re-translating it
  *    would re-double, by design.)
  *  - LITERAL PRESERVATION: a quote-free, backslash-free string
  *    literal's content survives translation byte-for-byte.
  *  - TERMINATION: arbitrary printable soup either translates or
  *    throws IllegalArgumentException (unterminated literal) — never
  *    hangs or blows the stack (the fixpoint guard + bounded passes).
  */
object SqlDialectPropertySpec extends Properties("SqlDialect") {

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val atom: Gen[String] = Gen.oneOf(
    ident,
    Gen.choose(0, 999).map(_.toString),
    ident.map(i => s"'$i'"),
    for { a <- ident; b <- ident } yield s"$a.$b")

  private val castType: Gen[String] =
    Gen.oneOf("int8", "text", "float8", "numeric(10,2)", "double precision")

  private val exprG: Gen[String] = for {
    a <- atom
    t <- castType
    form <- Gen.choose(0, 4)
  } yield form match {
    case 0 => s"$a::$t"
    case 1 => s"count($a)::$t"
    case 2 => s"to_char($a, 'YYYY-MM-DD')"
    case 3 => s"($a)::$t"
    case _ => a
  }

  private val predG: Gen[String] = for {
    a <- atom
    p <- ident
    op <- Gen.oneOf("~", "~*", "!~", "!~*", "=", "<>")
  } yield s"$a $op '$p'"

  private val sqlG: Gen[String] = for {
    e1 <- exprG
    e2 <- exprG
    w <- predG
    t <- ident
  } yield s"SELECT $e1 AS x, $e2 AS y FROM $t WHERE $w"

  property("postgres translation is idempotent (backslash-free grammar)") =
    Prop.forAll(sqlG) { s =>
      val once = toSparkSql(s, "postgres")
      toSparkSql(once, "postgres") == once
    }

  property("snowflake translation is idempotent over its call forms") = {
    val sfG: Gen[String] = for {
      a <- atom
      n <- Gen.choose(1, 9)
      part <- Gen.oneOf("day", "month", "year", "dd", "mm")
      form <- Gen.choose(0, 3)
    } yield form match {
      case 0 => s"SELECT IFF($a > 1, 'x', 'y') FROM t"
      case 1 => s"SELECT DATEADD($part, $n, $a) FROM t"
      case 2 => s"SELECT DATEDIFF($part, $a, $a) FROM t"
      case _ => s"SELECT ZEROIFNULL(NULLIFZERO($a)) FROM t"
    }
    Prop.forAll(sfG) { s =>
      val once = toSparkSql(s, "snowflake")
      toSparkSql(once, "snowflake") == once
    }
  }

  property("string literal content survives translation") = {
    val litG = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '-', '_',
      ',', '.', '(', ')', '%', '~', ':'))).map(_.mkString)
    Prop.forAll(litG) { body =>
      toSparkSql(s"SELECT '$body'", "postgres") == s"SELECT '$body'"
    }
  }

  property("arbitrary printable soup terminates (translates or throws IAE)") = {
    val soup = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(" ~*:()[]{}'\"`$\\,.%|=<>!".toList)))
      .map(_.mkString.take(80))
    Prop.forAll(soup) { s =>
      try { toSparkSql(s, "postgres"); toSparkSql(s, "mssql"); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }
  }
}
