package graft.io

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal dependency-free XLSX support (OOXML SpreadsheetML: a zip of XML
  * parts, parsed with the JDK's StAX) — closing the reference's Excel
  * format gap (files/types/excel.py) without external libraries.
  *
  * Deliberately driver-side: the reference reads Excel through pandas on
  * one worker too (its own scale ceiling); xlsx is a small-file
  * interchange format, not a lake format. Covers the common shape: first
  * worksheet, header row, shared/inline strings, numeric cells.
  */
object Excel {

  // ---------------------------------------------------------------
  // read
  // ---------------------------------------------------------------

  private def zipEntries(path: String, wanted: Set[String]): Map[String, Array[Byte]] = {
    val in = new ZipInputStream(new FileInputStream(path))
    val out = mutable.Map[String, Array[Byte]]()
    try {
      var e: ZipEntry = in.getNextEntry
      while (e != null) {
        if (wanted.contains(e.getName)) {
          val buf = new ByteArrayOutputStream()
          in.transferTo(buf)
          out(e.getName) = buf.toByteArray
        }
        e = in.getNextEntry
      }
    } finally in.close()
    out.toMap
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = XMLInputFactory.newInstance()
      .createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer[String]()
    var current: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => current = new StringBuilder
            case "t" if current != null => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          current.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += current.toString; current = null
            case _ => ()
          }
        case _ => ()
      }
    }
    out.toIndexedSeq
  }

  private def colIndex(cellRef: String): Int = {
    var i = 0
    var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i) - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** Parse the sheet XML into rows of Option[cell-text], with `t="s"` cells
    * resolved through the shared-strings table. Numbers stay as strings
    * here; typing happens at schema inference. */
  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String]): Seq[Array[Option[String]]] = {
    val r = XMLInputFactory.newInstance()
      .createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val rows = mutable.ArrayBuffer[Array[Option[String]]]()
    var row: mutable.ArrayBuffer[(Int, String)] = null
    var cellCol = -1
    var cellType = ""
    var buf: StringBuilder = null
    var inV = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer[(Int, String)]()
            case "c" if row != null =>
              cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex).getOrElse(cellCol + 1)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            case "v" | "t" if row != null => inV = true; buf = new StringBuilder
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inV =>
          buf.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" if inV =>
              inV = false
              val text = if (cellType == "s") shared(buf.toString.trim.toInt) else buf.toString
              if (cellCol >= 0) row += ((cellCol, text))
            case "row" =>
              if (row.nonEmpty) {
                val width = row.map(_._1).max + 1
                val arr = Array.fill[Option[String]](width)(None)
                row.foreach { case (c, v) => arr(c) = Some(v) }
                rows += arr
              }
              row = null; cellCol = -1
            case _ => ()
          }
        case _ => ()
      }
    }
    rows.toSeq
  }

  /** Read the first worksheet of an xlsx file into a DataFrame with header
    * row + type inference (long / double / string), like the reference's
    * pandas read_excel defaults. */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    val parts = zipEntries(path,
      Set("xl/worksheets/sheet1.xml", "xl/sharedStrings.xml"))
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val sheet = parseSheet(
      parts.getOrElse("xl/worksheets/sheet1.xml",
        throw new IllegalArgumentException(s"$path: no worksheet found")),
      shared)
    require(sheet.nonEmpty, s"$path: empty sheet")
    val header = sheet.head.map(_.getOrElse(""))
    val width = header.length
    val data = sheet.tail.map(r => (0 until width).map(i =>
      if (i < r.length) r(i) else None).toArray)

    def inferType(i: Int): DataType = {
      val vals = data.flatMap(r => r(i))
      if (vals.isEmpty) StringType
      else if (vals.forall(v => v.toLongOption.isDefined)) LongType
      else if (vals.forall(v => v.toDoubleOption.isDefined)) DoubleType
      else StringType
    }

    val types = (0 until width).map(inferType)
    val schema = StructType(header.zip(types).map { case (n, t) => StructField(n, t) }.toIndexedSeq)
    val rows = data.map { r =>
      Row.fromSeq((0 until width).map { i =>
        r(i).map { v =>
          types(i) match {
            case LongType   => v.toLong
            case DoubleType => v.toDouble
            case _          => v
          }
        }.orNull
      })
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  // ---------------------------------------------------------------
  // write
  // ---------------------------------------------------------------

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Write a DataFrame to a single xlsx file (driver-side collect — export
    * sizing matches the reference's single-stream Excel writer). Numeric
    * columns become numeric cells; everything else inline strings. */
  def writeXlsx(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val rows = df.collect()
    val isNum = schema.fields.map(f => f.dataType.isInstanceOf[NumericType])

    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def rowXml(cells: Seq[(Any, Boolean)], rowIdx: Int): Unit = {
      sheet.append(s"""<row r="${rowIdx + 1}">""")
      cells.zipWithIndex.foreach { case ((v, numeric), _) =>
        if (v != null) {
          if (numeric) sheet.append(s"<c><v>$v</v></c>")
          else sheet.append(s"""<c t="inlineStr"><is><t>${xmlEscape(v.toString)}</t></is></c>""")
        } else sheet.append("<c/>")
      }
      sheet.append("</row>")
    }
    rowXml(schema.fieldNames.toSeq.map(n => (n: Any, false)), 0)
    rows.zipWithIndex.foreach { case (r, i) =>
      rowXml((0 until schema.length).map(j => (r.get(j), isNum(j))), i + 1)
    }
    sheet.append("</sheetData></worksheet>")

    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", workbookRels)
      put("xl/worksheets/sheet1.xml", sheet.toString)
    } finally zos.close()
  }
}
