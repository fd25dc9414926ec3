package graft.io

import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Path}

/** Driver-side fetch of remote URL file locations — the Spark analogue of
  * the reference's smart_open-backed HTTP/FTP locations
  * (python-sdk/src/astro/files/locations/http.py:1-40, ftp.py; dispatch
  * files/locations/base.py:17-211). The reference's flagship example DAG
  * loads an https:// CSV (example_dags/calculate_popular_movies.py:29).
  *
  * Bytes are streamed once, on the driver, to a local temp file, then
  * handed to Spark's distributed reader. That matches the reference's data
  * path (smart_open also streams the whole object through one worker) while
  * keeping parsing distributed. Cloud-object-store schemes (s3a://, gs://,
  * wasbs://) are NOT routed here — Hadoop FS reads those natively and in
  * parallel, which is the 100 TB path; this fetcher is for protocol
  * endpoints that have no distributed reader.
  *
  * SFTP and Google Drive (files/locations/sftp.py, google/gdrive.py) need
  * client libraries that are out of scope — they raise explicitly rather
  * than failing opaquely.
  */
object RemoteFetch {

  /** Schemes fetched driver-side. `ftp://` uses the JDK's built-in FTP
    * URLConnection handler. */
  val fetchSchemes: Set[String] = Set("http", "https", "ftp")

  /** Schemes the reference supports that we explicitly do not. */
  val unsupportedSchemes: Set[String] = Set("sftp", "gdrive")

  def scheme(path: String): Option[String] = {
    val i = path.indexOf("://")
    if (i > 0) Some(path.substring(0, i).toLowerCase) else None
  }

  def isRemote(path: String): Boolean =
    scheme(path).exists(s => fetchSchemes(s) || unsupportedSchemes(s))

  /** Last path segment of the URL with query/fragment stripped, so format
    * inference by extension keeps working on the fetched copy. */
  private def fileName(uri: URI): String = {
    val p = Option(uri.getPath).getOrElse("")
    val seg = p.substring(p.lastIndexOf('/') + 1)
    if (seg.nonEmpty) seg else "download"
  }

  private def rejectUnsupported(url: String): Unit =
    scheme(url).foreach { s =>
      if (unsupportedSchemes(s))
        throw new UnsupportedOperationException(
          s"$s:// locations are not supported (need an $s client library); " +
            "fetch the file to a reachable filesystem first")
    }

  /** Open the remote stream with timeouts + redirect handling. */
  private def openStream(
      uri: URI, connectTimeoutMs: Int, readTimeoutMs: Int): (java.io.InputStream, () => Unit) = {
    val conn = uri.toURL.openConnection()
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn match {
      case h: HttpURLConnection =>
        h.setInstanceFollowRedirects(true)
        h.setRequestProperty("Accept", "*/*")
      case _ => ()
    }
    val in = conn.getInputStream
    (in, () => conn match { case h: HttpURLConnection => h.disconnect(); case _ => () })
  }

  /** Stream `url` to a local temp file; returns the local path. Only
    * correct when executors share the driver's filesystem (local master) —
    * cluster deployments must use [[fetchToSharedFs]]/[[fetch]]. */
  def fetchToLocal(
      url: String,
      connectTimeoutMs: Int = 15000,
      readTimeoutMs: Int = 120000): String = {
    rejectUnsupported(url)
    val uri = URI.create(url)
    val dir = Files.createTempDirectory("graft_remote_")
    dir.toFile.deleteOnExit()
    val dest: Path = dir.resolve(fileName(uri))
    val (in, close) = openStream(uri, connectTimeoutMs, readTimeoutMs)
    try Files.copy(in, dest)
    finally { in.close(); close() }
    dest.toFile.deleteOnExit()
    dest.toString
  }

  /** Stream `url` to a Hadoop filesystem path every executor can read —
    * the cluster-correct fetch: a driver-local temp file is invisible to
    * executors, so `spark.read` over it fails off-`local[*]`. The staging
    * root is `spark.graft.remoteStagingDir` if set (any Hadoop FS URI),
    * else `<default FS home>/.graft_remote_staging`; the file lands under
    * a fresh UUID directory and is returned as a fully-qualified URI. */
  def fetchToSharedFs(
      spark: org.apache.spark.sql.SparkSession,
      url: String,
      connectTimeoutMs: Int = 15000,
      readTimeoutMs: Int = 120000): String = {
    rejectUnsupported(url)
    val uri = URI.create(url)
    val hconf = spark.sessionState.newHadoopConf()
    val root = spark.conf.getOption("spark.graft.remoteStagingDir") match {
      case Some(dir) => new org.apache.hadoop.fs.Path(dir)
      case None =>
        val fs = org.apache.hadoop.fs.FileSystem.get(hconf)
        new org.apache.hadoop.fs.Path(fs.getHomeDirectory, ".graft_remote_staging")
    }
    val fs = root.getFileSystem(hconf)
    val dest = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(root,
        "fetch_" + java.util.UUID.randomUUID().toString.take(12)),
      fileName(uri))
    val (in, close) = openStream(uri, connectTimeoutMs, readTimeoutMs)
    val out = fs.create(dest, true)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally {
      out.close(); in.close(); close()
    }
    // best-effort staging GC, mirroring fetchToLocal's deleteOnExit: the
    // per-fetch UUID directory is removed when this JVM exits (Hadoop
    // runs its deleteOnExit set in a shutdown hook), so repeated fetches
    // don't accumulate on the shared filesystem across job runs
    fs.deleteOnExit(dest.getParent)
    fs.makeQualified(dest).toString
  }

  /** Fetch `url` somewhere Spark can read it: local temp on a `local[*]`
    * master (fast, no staging cleanup), shared Hadoop FS otherwise. */
  def fetch(
      spark: org.apache.spark.sql.SparkSession,
      url: String,
      connectTimeoutMs: Int = 15000,
      readTimeoutMs: Int = 120000): String =
    if (spark.sparkContext.master.startsWith("local") &&
      spark.conf.getOption("spark.graft.remoteStagingDir").isEmpty)
      fetchToLocal(url, connectTimeoutMs, readTimeoutMs)
    else fetchToSharedFs(spark, url, connectTimeoutMs, readTimeoutMs)
}
