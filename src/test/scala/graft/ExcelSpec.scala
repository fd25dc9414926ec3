package graft

import graft.core.FileRef

/** xlsx roundtrip through the loadFile/exportToFile facade, plus a
  * cross-check that an external tool (openpyxl via the dev harness) can
  * read our output — structure checked here via an independent re-parse. */
class ExcelSpec extends GraftSuite {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_xlsx").toString

  test("xlsx write → read roundtrip preserves values and types") {
    val dir = tmp()
    val df = Seq(
      (1L, "alpha", 1.5, "x & <y>"),
      (2L, "beta", -2.25, "quote\"d"),
      (3L, "gamma", 0.0, "plain"))
      .toDF("id", "name", "score", "notes")
    g.exportToFile(df, FileRef(s"$dir/out.xlsx"))
    val back = g.loadFile(FileRef(s"$dir/out.xlsx")).orderBy("id")
    assert(back.schema.map(_.dataType.typeName).toSeq == Seq("long", "string", "double", "string"))
    val rows = back.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).getString(3) == "x & <y>")
    assert(rows(1).getString(3) == "quote\"d")
    assert(rows(1).getDouble(2) == -2.25)
  }

  test("xlsx with nulls and all-string columns") {
    val dir = tmp()
    val df = Seq((Some("a"), Some(1)), (None, Some(2)), (Some("c"), None))
      .toDF("s", "n")
    g.exportToFile(df, FileRef(s"$dir/nulls.xlsx"))
    val back = g.loadFile(FileRef(s"$dir/nulls.xlsx")).orderBy("n")
    assert(back.count() == 3)
    assert(back.where("s IS NULL").count() == 1)
    assert(back.where("n IS NULL").count() == 1)
  }

  test("reads an authentic xlsx produced by another tool (shared strings path)") {
    val ref = "/root/reference/python-sdk/tests/data/sample.xlsx"
    assume(new java.io.File(ref).exists())
    val df = g.loadFile(FileRef(ref))
    assert(df.count() > 0)
    assert(df.columns.nonEmpty)
    // the sample fixture family has id/name-style content; just assert
    // values materialize as non-null somewhere
    assert(df.na.drop("all").count() == df.count())
  }

  test("format inference routes .xlsx and .xls to their Excel paths") {
    assert(graft.core.FileFormat.fromPath("/a/b.xlsx") == graft.core.FileFormat.Xlsx)
    assert(graft.core.FileFormat.fromPath("/a/b.xls") == graft.core.FileFormat.Xls)
  }

  test("xls (BIFF8) write → read roundtrip preserves values and types") {
    val dir = tmp()
    val df = Seq(
      (1L, "alpha", 1.5, "x & <y>"),
      (2L, "beta", -2.25, "quote\"d ünïcode"),
      (3L, "gamma", 0.0, "plain"))
      .toDF("id", "name", "score", "notes")
    g.exportToFile(df, FileRef(s"$dir/out.xls"))
    val back = g.loadFile(FileRef(s"$dir/out.xls")).orderBy("id")
    assert(back.schema.map(_.dataType.typeName).toSeq == Seq("long", "string", "double", "string"))
    val rows = back.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).getString(3) == "quote\"d ünïcode")
    assert(rows(1).getDouble(2) == -2.25)
  }

  test("xls SST CONTINUE splits: strings crossing record boundaries survive") {
    val strings = (0 until 200).map(i => s"string body number $i with some filler text")
    val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val dir = tmp()
    // a 64-byte record cap forces many CONTINUE records and mid-string
    // splits with fresh flag bytes — the hairy part of the SST format
    graft.io.ExcelBiff.writeXls(df, s"$dir/split.xls", maxRecordBytes = 64)
    val back = g.loadFile(FileRef(s"$dir/split.xls")).orderBy("id").collect()
    assert(back.length == 200)
    assert(back.map(_.getString(1)).toSeq == strings)
    // wide (UTF-16) strings split the same way
    val wide = (0 until 50).map(i => s"целая строка № $i с юникодом")
    val dfw = wide.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    graft.io.ExcelBiff.writeXls(dfw, s"$dir/wide.xls", maxRecordBytes = 64)
    val backW = g.loadFile(FileRef(s"$dir/wide.xls")).orderBy("id").collect()
    assert(backW.map(_.getString(1)).toSeq == wide)
  }

  test("xls BIFF5 (Excel 5.0/95): byte-string dialect reads") {
    // No BIFF5 writer exists in this century's tooling to fixture from, so
    // synthesize the stream per [MS-XLS]: BOF vers=0x0500, inline LABEL
    // byte strings (cch u16 + 8-bit chars, no SST), NUMBER/RK cells, and
    // an RSTRING (rich-text label whose format runs trail the chars).
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def rec(id: Int, data: Array[Byte]) = le16(id) ++ le16(data.length) ++ data
    def bstr(s: String) = le16(s.length) ++ s.map(_.toByte).toArray
    def label(row: Int, c: Int, s: String) =
      rec(0x0204, le16(row) ++ le16(c) ++ le16(0) ++ bstr(s))
    def rstring(row: Int, c: Int, s: String) = // chars + 1 format run (4B)
      rec(0x00d6, le16(row) ++ le16(c) ++ le16(0) ++ bstr(s) ++ Array[Byte](1, 0, 0, 0))
    def number(row: Int, c: Int, d: Double) = {
      val bits = java.lang.Double.doubleToLongBits(d)
      rec(0x0203, le16(row) ++ le16(c) ++ le16(0) ++
        (0 until 8).map(j => ((bits >> (8 * j)) & 0xff).toByte).toArray)
    }
    def rk(row: Int, c: Int, intVal: Int) = // int-type RK encoding
      rec(0x027e, le16(row) ++ le16(c) ++ le16(0) ++ le32(intVal << 2 | 0x2))
    val sheet =
      rec(0x0809, le16(0x0500) ++ le16(0x0010)) ++
        label(0, 0, "name") ++ label(0, 1, "qty") ++ label(0, 2, "price") ++ label(0, 3, "note") ++
        label(1, 0, "café") ++ rk(1, 1, 7) ++ number(1, 2, 1.25) ++ rstring(1, 3, "rich run") ++
        label(2, 0, "plain") ++ rk(2, 1, -3) ++ number(2, 2, 10.0) ++ label(2, 3, "tail") ++
        rec(0x000a, Array.emptyByteArray)
    def globals(sheetOff: Int) =
      rec(0x0809, le16(0x0500) ++ le16(0x0005)) ++
        rec(0x0085, le32(sheetOff) ++ le16(0) ++
          Array(6.toByte) ++ "Sheet1".map(_.toByte).toArray) ++ // BIFF5 short byte string
        rec(0x000a, Array.emptyByteArray)
    val stream = globals(globals(0).length) ++ sheet
    val dir = tmp()
    val path = s"$dir/biff5.xls"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      graft.io.ExcelBiff.cfbContainer(stream))
    val back = g.loadFile(FileRef(path)).orderBy("qty").collect()
    val cols = g.loadFile(FileRef(path)).columns.toSeq
    assert(cols == Seq("name", "qty", "price", "note"))
    assert(back.map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSeq ==
      Seq(("plain", -3L, 10.0, "tail"), ("café", 7L, 1.25, "rich run")))
  }

  test("xls BIFF4 (Excel 4.0): raw record stream, no CFB container") {
    // Excel 2.x-4.0 .xls files predate compound files: the file IS the
    // worksheet record stream. BIFF3/4 cell layouts match BIFF5 offsets
    // (u16 ixfe), so only the BOF id and container differ.
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def rec(id: Int, data: Array[Byte]) = le16(id) ++ le16(data.length) ++ data
    def bstr(s: String) = le16(s.length) ++ s.map(_.toByte).toArray
    def label(row: Int, c: Int, s: String) =
      rec(0x0204, le16(row) ++ le16(c) ++ le16(0) ++ bstr(s))
    def number(row: Int, c: Int, d: Double) = {
      val bits = java.lang.Double.doubleToLongBits(d)
      rec(0x0203, le16(row) ++ le16(c) ++ le16(0) ++
        (0 until 8).map(j => ((bits >> (8 * j)) & 0xff).toByte).toArray)
    }
    def rk(row: Int, c: Int, intVal: Int) =
      rec(0x027e, le16(row) ++ le16(c) ++ le16(0) ++ le32(intVal << 2 | 0x2))
    val stream =
      rec(0x0409, le16(0x0004) ++ le16(0x0010)) ++
        label(0, 0, "name") ++ label(0, 1, "qty") ++ label(0, 2, "price") ++
        label(1, 0, "old") ++ rk(1, 1, 4) ++ number(1, 2, 2.5) ++
        label(2, 0, "vintage") ++ rk(2, 1, 9) ++ number(2, 2, 0.5) ++
        rec(0x000a, Array.emptyByteArray)
    val dir = tmp()
    val path = s"$dir/biff4.xls"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), stream)
    val back = g.loadFile(FileRef(path)).orderBy("qty").collect()
    assert(g.loadFile(FileRef(path)).columns.toSeq == Seq("name", "qty", "price"))
    assert(back.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("old", 4L, 2.5), ("vintage", 9L, 0.5)))
  }

  test("xls BIFF2 (Excel 2.x): 3-byte cell attributes, INTEGER records") {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def rec(id: Int, data: Array[Byte]) = le16(id) ++ le16(data.length) ++ data
    val attrs = Array[Byte](0, 0, 0) // ixfe/format/font — ignored
    def label2(row: Int, c: Int, s: String) =
      rec(0x0004, le16(row) ++ le16(c) ++ attrs ++
        Array(s.length.toByte) ++ s.map(_.toByte).toArray) // cch is u8
    def integer2(row: Int, c: Int, v: Int) =
      rec(0x0002, le16(row) ++ le16(c) ++ attrs ++ le16(v))
    def number2(row: Int, c: Int, d: Double) = {
      val bits = java.lang.Double.doubleToLongBits(d)
      rec(0x0003, le16(row) ++ le16(c) ++ attrs ++
        (0 until 8).map(j => ((bits >> (8 * j)) & 0xff).toByte).toArray)
    }
    val stream =
      rec(0x0009, le16(0x0002) ++ le16(0x0010)) ++
        label2(0, 0, "k") ++ label2(0, 1, "v") ++
        label2(1, 0, "a") ++ integer2(1, 1, 42) ++
        label2(2, 0, "b") ++ number2(2, 1, 3.25) ++
        rec(0x000a, Array.emptyByteArray)
    val dir = tmp()
    val path = s"$dir/biff2.xls"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), stream)
    val back = g.loadFile(FileRef(path)).orderBy("k").collect()
    assert(back.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 42.0), ("b", 3.25)))
  }

  test("xlsx pattern load unions matching files (resolve_file_path_pattern parity)") {
    val dir = tmp()
    g.exportToFile(Seq((1L, "a")).toDF("k", "s"), FileRef(s"$dir/p1.xlsx"))
    g.exportToFile(Seq((2L, "b"), (3L, "c")).toDF("k", "s"), FileRef(s"$dir/p2.xlsx"))
    val back = g.loadFile(FileRef(s"$dir/p*.xlsx")).orderBy("k").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    intercept[IllegalArgumentException] {
      g.loadFile(FileRef(s"$dir/nomatch*.xlsx"))
    }
  }

  test("xlsx/xls append keeps existing rows (no silent overwrite)") {
    val dir = tmp()
    for (ext <- Seq("xlsx", "xls")) {
      val path = s"$dir/app.$ext"
      g.exportToFile(Seq((1L, "a")).toDF("k", "s"), FileRef(path))
      g.exportToFile(Seq((2L, "b")).toDF("k", "s"), FileRef(path),
        ifExists = graft.core.IfExists.Append)
      val back = g.loadFile(FileRef(path)).orderBy("k").collect()
      assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "b")), s"append lost rows for .$ext")
    }
  }

  test("xls with nulls, RK decode, and empty cells") {
    val dir = tmp()
    val df = Seq((Some("a"), Some(1)), (None, Some(2)), (Some("c"), None))
      .toDF("s", "n")
    g.exportToFile(df, FileRef(s"$dir/nulls.xls"))
    val back = g.loadFile(FileRef(s"$dir/nulls.xls")).orderBy("n")
    assert(back.count() == 3)
    assert(back.where("s IS NULL").count() == 1)
    assert(back.where("n IS NULL").count() == 1)
    // RK decode unit checks via a hand-built record set are covered by the
    // roundtrip (writer emits NUMBER); decode the 4 RK encodings directly:
    // int, int/100, float, float/100
    import graft.io.ExcelBiff
    val m = ExcelBiff.getClass.getDeclaredMethods.find(_.getName.endsWith("decodeRk")).get
    m.setAccessible(true)
    assert(m.invoke(ExcelBiff, Int.box(1234 << 2 | 0x2)) == 1234.0)
    assert(m.invoke(ExcelBiff, Int.box(1234 << 2 | 0x3)) == 12.34)
    val dblBits = java.lang.Double.doubleToLongBits(2.5)
    assert(m.invoke(ExcelBiff, Int.box(((dblBits >>> 32) & 0xfffffffcL).toInt)) == 2.5)
  }

  test("xls BIFF5 write -> read roundtrip (inline LABEL byte strings)") {
    val dir = tmp()
    val df = Seq(
      (1L, "plain", 1.5),
      (2L, "caf\u00e9 \u00fcber", -3.25), // Latin-1 exercises the 8-bit path
      (3L, "", 0.0))
      .toDF("id", "name", "score")
    graft.io.ExcelBiff.writeXls5(df, s"$dir/five.xls")
    val back = graft.io.ExcelBiff.readXls(spark, s"$dir/five.xls")
      .selectExpr("cast(id as bigint) id", "name", "cast(score as double) score")
      .orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(back(1).getString(1) == "caf\u00e9 \u00fcber")
    assert(back.map(_.getDouble(2)).toSeq == Seq(1.5, -3.25, 0.0))
  }

  test("xls BIFF5 write rejects non-Latin-1 text with a clear message") {
    val dir = tmp()
    val df = Seq((1L, "\u4e2d\u6587")).toDF("id", "name")
    val e = intercept[Exception] {
      graft.io.ExcelBiff.writeXls5(df, s"$dir/wide.xls")
    }
    assert(e.getMessage.contains("BIFF8"))
  }

  test("xls BIFF5 write rejects format-limit overflows instead of corrupting") {
    val dir = tmp()
    // 16384 data rows + header = 16385 > the 2^14 BIFF5 row cap
    val tall = spark.range(16384).selectExpr("id", "cast(id as string) s")
    val er = intercept[Exception] {
      graft.io.ExcelBiff.writeXls5(tall, s"$dir/tall.xls")
    }
    assert(er.getMessage.contains("16384 rows"))
    // a LABEL payload past the 2080-byte BIFF2\u20135 record-data cap
    val long = Seq((1L, "x" * 2073)).toDF("id", "s")
    val el = intercept[Exception] {
      graft.io.ExcelBiff.writeXls5(long, s"$dir/long.xls")
    }
    assert(el.getMessage.contains("2072"))
    // at the caps exactly, the file writes and reads back
    val edge = Seq((1L, "y" * 2072)).toDF("id", "s")
    graft.io.ExcelBiff.writeXls5(edge, s"$dir/edge.xls")
    val back = graft.io.ExcelBiff.readXls(spark, s"$dir/edge.xls").collect()
    assert(back.length == 1 && back(0).getString(1).length == 2072)
  }
}
