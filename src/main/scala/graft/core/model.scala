package graft.core

import java.util.concurrent.ThreadLocalRandom

/** Qualifier for a table: (schema, database) pair, either may be absent.
  * Mirrors the reference's `Metadata` (python-sdk/src/astro/table.py:18-34);
  * in Spark both collapse onto the two-level `database.table` namespace.
  */
final case class Metadata(schema: Option[String] = None, database: Option[String] = None) {
  def isEmpty: Boolean = schema.isEmpty && database.isEmpty
}

/** Pointer to a table (not the data itself) — the Spark-native analogue of
  * the reference's `BaseTable`/`Table`/`TempTable`
  * (python-sdk/src/astro/table.py:37-251).
  *
  * `temp` tables get auto-generated names with the `_tmp_` prefix and are
  * tracked by [[graft.GraftSession]] for end-of-run [[graft.ops.Cleanup]],
  * matching the reference's TempTable lifecycle (table.py:68-94,202-210).
  */
final case class TableRef(
    name: String,
    metadata: Metadata = Metadata(),
    temp: Boolean = false) {

  /** Fully-qualified two-level identifier for Spark SQL / catalog calls. */
  def qualifiedName: String = metadata.schema match {
    case Some(s) => s"${SqlIdentifiers.quoteIfNeeded(s)}.${SqlIdentifiers.quoteIfNeeded(name)}"
    case None    => SqlIdentifiers.quoteIfNeeded(name)
  }

  /** Lineage URI, parity with the reference's Airflow Dataset URI
    * (table.py:237-251) — informational only. */
  def uri: String = s"graft://spark?table=$name" +
    metadata.schema.map(s => s"&schema=$s").getOrElse("")
}

object TableRef {
  /** Max generated name length, parity with table.py:14 (62). */
  val MaxTableNameLength = 62
  /** Temp-table prefix, parity with table.py:15. */
  val TempPrefix = "_tmp_"

  /** Auto-named temp table, parity with table.py:79-94 (random lowercase). */
  def temp(metadata: Metadata = Metadata()): TableRef = {
    val rnd = ThreadLocalRandom.current()
    val suffix = (1 to (MaxTableNameLength - TempPrefix.length))
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    TableRef(TempPrefix + suffix, metadata, temp = true)
  }

  /** Like the reference's `Table.__new__` (table.py:230-235): an unnamed or
    * `_tmp_`-prefixed table is implicitly temp. */
  def apply(name: String): TableRef =
    new TableRef(name, Metadata(), temp = name.startsWith(TempPrefix))
}

/** Supported file formats — the reference's FileType registry
  * (python-sdk/src/astro/files/types/). NDJSON is JSON-lines (Spark's json
  * reader default); JSON is a whole-document array (multiLine). */
sealed abstract class FileFormat(val sparkFormat: String)
object FileFormat {
  case object Csv extends FileFormat("csv")
  case object Json extends FileFormat("json")
  case object Ndjson extends FileFormat("json")
  case object Parquet extends FileFormat("parquet")
  case object Orc extends FileFormat("orc")
  case object Text extends FileFormat("text")
  /** Spark 4 built-in XML datasource (needs a rowTag option). */
  case object Xml extends FileFormat("xml")
  /** Driver-side OOXML path (graft.io.Excel), no Spark datasource. */
  case object Xlsx extends FileFormat("xlsx")
  /** Driver-side legacy BIFF8 path (graft.io.ExcelBiff). */
  case object Xls extends FileFormat("xls")

  /** Infer from path extension, parity with files/types/__init__.py
    * `create_file_type` dispatch-by-suffix. */
  def fromPath(path: String): FileFormat = {
    val p = path.toLowerCase.stripSuffix("/")
    val base = p.substring(p.lastIndexOf('/') + 1)
    val ext = base.substring(base.lastIndexOf('.') + 1)
    ext match {
      case "csv" | "tsv"     => Csv
      case "json"            => Json
      case "ndjson" | "jsonl" => Ndjson
      case "parquet" | "pq"  => Parquet
      case "orc"             => Orc
      case "txt" | "text"    => Text
      case "xml"             => Xml
      case "xlsx"            => Xlsx
      // Legacy BIFF8 .xls (files/types/xls.py, read via pandas/xlrd in
      // the reference) — dependency-free CFB+BIFF8 parser in ExcelBiff.
      case "xls"             => Xls
      case _                 => Parquet // directories / extension-less paths
    }
  }
}

/** Pointer to file(s): path (may be a glob / directory), optional explicit
  * format, reader/writer options. Mirrors `File`
  * (python-sdk/src/astro/files/base.py:19-251); Spark handles glob
  * expansion natively where the reference listed prefixes per location
  * (files/locations/ local|s3|gcs|…). */
final case class FileRef(
    path: String,
    format: Option[FileFormat] = None,
    options: Map[String, String] = Map.empty) {
  def resolvedFormat: FileFormat = format.getOrElse(FileFormat.fromPath(path))
  /** Parity with File.is_pattern (files/base.py:109-115): a path with no
    * suffix (and no explicit type) is a pattern/directory. */
  def isPattern: Boolean =
    format.isEmpty && !path.substring(path.lastIndexOf('/') + 1).contains('.')
}

/** if_exists policy for loads/CTAS (load_file.py: "replace" | "append"). */
sealed trait IfExists
object IfExists {
  case object Replace extends IfExists
  case object Append extends IfExists
  def fromString(s: String): IfExists = s.toLowerCase match {
    case "replace" => Replace
    case "append"  => Append
    case other     => throw new IllegalArgumentException(s"if_exists must be replace|append, got $other")
  }
}

/** Column-name capitalization policy
  * (constants.py:93, applied utils/dataframe.py:17-33). */
sealed trait ColumnsCapitalization
object ColumnsCapitalization {
  case object Original extends ColumnsCapitalization
  case object Lower extends ColumnsCapitalization
  case object Upper extends ColumnsCapitalization
}

/** Merge conflict strategies (constants.py:91 MergeConflictStrategy). */
sealed trait ConflictStrategy
object ConflictStrategy {
  case object Ignore extends ConflictStrategy
  case object Update extends ConflictStrategy
  case object Exception extends ConflictStrategy
}

/** Raised by merge(if_conflicts=exception) when source keys collide with
  * target — the Spark stand-in for the uniqueness constraint the reference
  * pre-installs (databases/base.py:201-209). */
final class MergeConflictException(msg: String) extends RuntimeException(msg)

/** Pre-/post-queries run around a statement (session variables, pragmas…)
  * — parity with QueryModifier (python-sdk/src/astro/query_modifier.py:7-29). */
final case class QueryModifier(
    preQueries: Seq[String] = Nil,
    postQueries: Seq[String] = Nil)

/** Identifier hygiene, port of the reference's injection guard
  * (databases/snowflake.py:1107-1155 is_valid_snow_identifier). Unquoted
  * identifiers must match `[A-Za-z_][A-Za-z0-9_$]*`; anything else is
  * backtick-quoted for Spark SQL (with embedded backticks doubled). */
object SqlIdentifiers {
  private val Unquoted = "^[A-Za-z_][A-Za-z0-9_$]*$".r

  def isValidUnquoted(name: String): Boolean = Unquoted.matches(name)

  def quoteIfNeeded(name: String): String =
    if (isValidUnquoted(name)) name
    else "`" + name.replace("`", "``") + "`"

  /** Render a parameter value as a safe SQL literal
    * (parity: databases/base.py:848-856 parameterize_variable). */
  def literal(v: Any): String = v match {
    case null            => "NULL"
    case None            => "NULL"
    case Some(x)         => literal(x)
    // Spark SQL treats backslash as an escape inside string literals (unlike
    // ANSI), so a value ending in \ or containing \' would otherwise break
    // out of the quoted literal — escape backslashes first, then quotes.
    case s: String       => "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
    case b: Boolean      => if (b) "TRUE" else "FALSE"
    case n: Int          => n.toString
    case n: Long         => n.toString
    case n: Short        => n.toString
    case n: Byte         => n.toString
    case d: Double       => d.toString
    case f: Float        => f.toString
    case bd: BigDecimal  => bd.toString
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case seq: Seq[_]     => seq.map(literal).mkString("(", ", ", ")")
    case other =>
      throw new IllegalArgumentException(s"Unsupported SQL parameter type: ${other.getClass}")
  }
}
