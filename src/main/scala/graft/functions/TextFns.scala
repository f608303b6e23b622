package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text-analysis and dedup
  * operators. Everything is built from Spark's higher-order functions over
  * arrays — no UDFs, fully distributed, and (crucially for the oracle gate)
  * expressible with identical integer/IEEE arithmetic in DuckDB.
  */
object TextFns {
  /** Modulus for all polynomial rolling hashes (fits comfortably so that
    * `h*31 + c` never overflows a signed 64-bit intermediate).
    */
  final val HashMod = 1000000007L

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic polynomial rolling hash of a string:
    * left fold of `h*31 + codepoint (mod HashMod)` — the document
    * fingerprint primitive, evaluated by the codegen'd [[StringHash]]
    * kernel (was an interpreted three-lambda HOF fold). DuckDB twin:
    * [[stringHashSql]] — bit-identical over the ASCII corpus.
    */
  def stringHash(s: Column): Column =
    org.apache.spark.sql.graftbridge.SqlBridge.column(
      StringHash(org.apache.spark.sql.graftbridge.SqlBridge.expression(s)))

  /** The interpreted HOF formulation of [[stringHash]] — kept ONLY as the
    * executable spec of the arithmetic: parity tests compare the codegen
    * kernels against this independent implementation (and the oracle gate
    * compares both against DuckDB).
    */
  private[graft] def stringHashRef(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L), (h, c) => (h * 31 + c) % HashMod)

  /** DuckDB twin of [[stringHash]]. */
  def stringHashSql(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($expr, ''),
       |    c -> CAST(unicode(c) AS BIGINT))),
       |  (a, b) -> (a * 31 + b) % ${HashMod})""".stripMargin

  /** Word n-gram shingles (space-joined) from a token array. */
  def shingles(tok: Column, n: Int): Column =
    transform(sequence(lit(0), size(tok) - n),
      i => concat_ws(" ", (1 to n).map(j => element_at(tok, i + j)): _*))

  /** Count of tokens present in a stopword list. */
  def stopwordCount(tok: Column, stopwords: Seq[String]): Column =
    size(filter(tok, t => t.isin(stopwords.map(x => x: Any): _*)))

  def stopwordCountSql(tokExpr: String, stopwords: Seq[String]): String = {
    val lst = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($tokExpr, t -> list_contains($lst, t)))"
  }
}
