package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style shard export: documents → deterministic POSIX ustar
  * archives, one `.tar` per shard — the standard handoff format from a
  * curation pipeline to a training dataloader (a WebDataset IS a plain
  * tar of `<key>.<ext>` members read sequentially).
  *
  * Everything is deterministic and spec-derived, so an external engine
  * can certify the writer without parsing tar: members are `<id>.txt`
  * in ascending id order, headers carry fixed mode/uid/gid/mtime, and
  * the archive length obeys the ustar arithmetic exactly —
  * `Σ (512 + 512·⌈bytes/512⌉) + 1024` (one header block per member,
  * content zero-padded to block size, two zero trailer blocks). The
  * contract query hash-matches that formula against the length of the
  * REAL bytes this writer produced.
  *
  * Scale shape: shard assignment is the portable md5 bucket of the id
  * (the hashSplit discipline — stable across runs, partitionings, and
  * engines), each shard assembles independently inside one task
  * (`groupByKey.mapGroups` — the per-partition imperative case the
  * builder guidance reserves mapGroups for), and memory per task is one
  * shard's bytes: pick `nShards` so shards fit the executor, the
  * universal shard-writer constraint. No global sort anywhere — member
  * order is per-shard only.
  *
  * Reference scope: the reference exports tables to csv/json/ndjson/
  * parquet files only (`python-sdk/src/astro/files/types/__init__.py`);
  * training-shard formats are part of the beyond-reference LLM-pipeline
  * surface. */
object TarShards {

  /** Deterministic ustar bytes for `entries` (name, content), in the
    * given order. Names must fit the 100-byte ustar name field. */
  def tarBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, content) =>
      val nameB = name.getBytes("US-ASCII")
      require(nameB.length <= 100, s"tar member name too long: $name")
      val h = new Array[Byte](512)
      System.arraycopy(nameB, 0, h, 0, nameB.length)
      def oct(v: Long, off: Int, len: Int): Unit = {
        // len-1 octal digits + NUL, zero-padded — the classic layout
        val s = java.lang.Long.toOctalString(v)
        val pad = "0" * (len - 1 - s.length) + s
        System.arraycopy(pad.getBytes("US-ASCII"), 0, h, off, len - 1)
        h(off + len - 1) = 0
      }
      oct(0x1a4, 100, 8) // mode 0644
      oct(0, 108, 8) // uid
      oct(0, 116, 8) // gid
      oct(content.length.toLong, 124, 12) // size
      oct(0, 136, 12) // mtime: fixed 0 — byte-reproducible archives
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum field = spaces
      h(156) = '0' // typeflag: regular file
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5) // magic
      h(262) = 0
      h(263) = '0'; h(264) = '0' // version
      var sum = 0L
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = "0" * (6 - cs.length) + cs
      System.arraycopy(csPad.getBytes("US-ASCII"), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(content)
      val rem = content.length % 512
      if (rem != 0) out.write(new Array[Byte](512 - rem))
    }
    out.write(new Array[Byte](1024)) // two zero trailer blocks
    out.toByteArray
  }

  /** Portable shard id of an id column: 60-bit md5 prefix mod nShards —
    * same bucket on any engine. */
  def shardOf(id: org.apache.spark.sql.Column, nShards: Int): org.apache.spark.sql.Column =
    pmod(graft.functions.Sketch.kmvHash(id.cast("string")), lit(nShards.toLong))

  /** Assemble every shard in-memory and report (shard_id, n_docs,
    * payload_bytes, tar_bytes) — tar_bytes is the length of the REAL
    * archive built by [[tarBytes]], which the spec formula replays. */
  def tarShardReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    assemble(docs, idCol, textCol, nShards)
      .map { case (shard, entries) => reportRow(shard, entries, None) }
      .toDF("shard_id", "n_docs", "payload_bytes", "tar_bytes")
  }

  /** Write real `shard-NNNNN.tar` files under `dir` — EAGERLY (the write
    * is an action, not a deferred plan: discarding the returned report
    * still writes every shard, and re-consuming the report cannot
    * re-write). Each archive lands via write-temp + atomic rename, so a
    * retried or speculative task can never leave a torn file. Returns
    * the same report as [[tarShardReport]], materialized. */
  def writeTarShards(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int,
      dir: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = assemble(docs, idCol, textCol, nShards)
      .map { case (shard, entries) => reportRow(shard, entries, Some(dir)) }
      .collect()
    rows.toSeq.toDF("shard_id", "n_docs", "payload_bytes", "tar_bytes")
  }

  private def reportRow(
      shard: Long,
      entries: Seq[(String, Array[Byte])],
      writeDir: Option[String]): (Long, Long, Long, Long) = {
    val tar = tarBytes(entries)
    writeDir.foreach { dir =>
      val p = java.nio.file.Paths.get(dir, f"shard-$shard%05d.tar")
      java.nio.file.Files.createDirectories(p.getParent)
      val tmp = p.resolveSibling(
        p.getFileName.toString + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      java.nio.file.Files.write(tmp, tar)
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    (shard, entries.size.toLong,
      entries.iterator.map(_._2.length.toLong).sum, tar.length.toLong)
  }

  private def assemble(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int): Dataset[(Long, Seq[(String, Array[Byte])])] = {
    require(nShards >= 1, "nShards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(shardOf(col(idCol), nShards).as("__shard"),
        col(idCol).cast("long").as("__id"), col(textCol).as("__text"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val entries = it.toSeq.sortBy(_._2)
          .map { case (_, id, t) =>
            (s"$id.txt", Option(t).getOrElse("").getBytes("UTF-8"))
          }
        (shard, entries)
      }
  }
}
