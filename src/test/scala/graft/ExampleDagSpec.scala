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

  test("same DAG loading the CSV over http:// (calculate_popular_movies.py:29 parity)") {
    assume(new java.io.File(imdb).exists())
    // Serve the golden CSV from a loopback socket to stay hermetic.
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(imdb))
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val movies = TableRef("imdb_movies_http")
      g.loadFile(FileRef(s"http://127.0.0.1:${server.getAddress.getPort}/imdb_v2.csv"),
        Some(movies))
      val top = g.transform(
        "SELECT title, rating FROM {{t}} WHERE genre1='Animation' ORDER BY rating DESC LIMIT 1",
        Map("t" -> movies))
      val r = spark.table(top.qualifiedName).collect()(0)
      assert(r.getString(0) == "Toy Story 3 (2010)" && r.getDouble(1) == 8.3)
      g.dropTable(movies)
      g.cleanup()
    } finally server.stop(0)
  }

  test("sftp:// and gdrive:// raise explicitly (unsupported locations)") {
    intercept[UnsupportedOperationException] {
      g.loadFile(FileRef("sftp://host/path/data.csv"))
    }
    intercept[UnsupportedOperationException] {
      g.loadFile(FileRef("gdrive://folder/data.csv"))
    }
  }
}
