package graft.sql

import graft.core.{SqlIdentifiers, TableRef}

/** Jinja-lite `{{name}}` renderer, parity with the reference's
  * `translate_jinja_to_sqlalchemy_template`
  * (python-sdk/src/astro/sql/operators/base_decorator.py:240-272) +
  * identifier resolution
  * (databases/base.py:804-833 get_sqlalchemy_template_table_identifier_and_parameter).
  *
  * `{{name}}` bound to a [[TableRef]] renders as a safe (quoted-if-needed)
  * table identifier; bound to any other value it renders as an escaped SQL
  * literal — the Spark analogue of `:param` binding. Unknown placeholders
  * raise, matching the reference's Jinja StrictUndefined behavior.
  */
object SqlTemplate {
  private val Placeholder = raw"\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\}".r

  def render(template: String, bindings: Map[String, Any]): String =
    Placeholder.replaceAllIn(template, m => {
      val key = m.group(1)
      val v = bindings.getOrElse(key,
        throw new IllegalArgumentException(s"Unbound template parameter: {{$key}}"))
      val rendered = v match {
        case t: TableRef => t.qualifiedName
        case other       => SqlIdentifiers.literal(other)
      }
      java.util.regex.Matcher.quoteReplacement(rendered)
    })

  /** Placeholder names referenced by a template (for validation / lineage). */
  def placeholders(template: String): Set[String] =
    Placeholder.findAllMatchIn(template).map(_.group(1)).toSet
}
