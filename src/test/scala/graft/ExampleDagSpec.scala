package graft

import graft.core.{FileRef, TableRef}

/** The reference's flagship example DAG, reproduced natively end-to-end
  * (SURVEY §7.3 minimum slice): load the imdb golden CSV → templated
  * transform (CTAS) → read the result table — asserting the exact
  * top-5-animations rows the reference pipeline produces
  * (example_dags/calculate_popular_movies.py:11-37 on tests/data/imdb_v2.csv).
  */
class ExampleDagSpec extends GraftSuite {

  private val imdb = "/root/reference/python-sdk/tests/data/imdb_v2.csv"

  test("calculate_popular_movies DAG: loadFile → transform → result parity") {
    assume(new java.io.File(imdb).exists())
    // load_file(File(imdb_v2.csv), output_table=Table(...))
    val movies = TableRef("imdb_movies")
    g.loadFile(FileRef(imdb), Some(movies))
    // @aql.transform top_five_animations
    val out = g.transform(
      """SELECT title, rating
        |FROM {{input_table}}
        |WHERE genre1='Animation'
        |ORDER BY Rating desc
        |LIMIT 5""".stripMargin,
      Map("input_table" -> movies),
      output = Some(TableRef("top_animation")))
    val rows = spark.table(out.qualifiedName)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows == Seq(
      ("Toy Story 3 (2010)", 8.3),
      ("Inside Out (2015)", 8.2),
      ("How to Train Your Dragon (2010)", 8.1),
      ("Zootopia (2016)", 8.1),
      ("How to Train Your Dragon 2 (2014)", 7.9)))
    g.dropTable(movies)
    g.dropTable(out)
  }
}
