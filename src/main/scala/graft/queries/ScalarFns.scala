package graft.queries

import graft.sources.Tables
import graft.util.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families F1–F6 (SURVEY §2.8). The reference has no scalar
  * function catalog (arbitrary Java lambdas only); our engine exposes
  * Spark's built-in, codegen'd catalog — one oracle-pinned query per family
  * over real columns. No UDFs anywhere: everything stays inside whole-stage
  * codegen.
  */
object ScalarFns {

  /** F1 — string functions on customer. */
  private def f1(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").select(
      col("c_custkey"),
      upper(col("c_mktsegment")).as("seg_upper"),
      length(col("c_name")).as("name_len"),
      substring(col("c_name"), 10, 9).as("name_tail"),
      split(col("c_name"), "#").getItem(1).as("name_num"),
      concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string"))
        .as("seg_key"))
      .orderBy(col("c_custkey"))

  private val f1Sql =
    """SELECT c_custkey,
      |  upper(c_mktsegment) AS seg_upper,
      |  length(c_name) AS name_len,
      |  substr(c_name, 10, 9) AS name_tail,
      |  string_split(c_name, '#')[2] AS name_num,
      |  concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** F2 — date/time functions on orders. */
  private def f2(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("o_year"),
      month(col("o_orderdate")).as("o_month"),
      dayofmonth(col("o_orderdate")).as("o_day"),
      unix_timestamp(date_trunc("month", col("o_orderdate")))
        .as("month_start_epoch"),
      datediff(col("o_orderdate"), lit("1995-01-01")).as("days_since_95"))
      .orderBy(col("o_orderkey"))

  private val f2Sql =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS o_year,
      |  month(o_orderdate) AS o_month,
      |  day(o_orderdate) AS o_day,
      |  CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_epoch,
      |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** F3 — math functions on lineitem. Transcendentals (ln) are quantized
    * via [[Det.qround]] — Spark (libm via JVM) and DuckDB (C libm) can
    * differ in the last ulp.
    */
  private def f3(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      Det.discPrice(col("l_extendedprice"), col("l_discount"))
        .cast("double").as("disc_price"),
      abs(col("l_discount") - 0.05).as("abs_disc_delta"),
      Det.qround(log(col("l_extendedprice")), 6).as("ln_price"),
      (col("l_quantity") * col("l_quantity")).as("qty_sq"),
      sqrt(col("l_quantity")).as("qty_sqrt"))
      // Full-row total order: (l_orderkey, l_linenumber) has duplicates in
      // the synthetic data, and engine tie orders diverge at scale (sf1
      // finding — see the same note on Substrate R1). The keys must
      // DETERMINE every output column: ln_price pins l_extendedprice and
      // qty_sq pins l_quantity (hence qty_sqrt), so rows tied on all five
      // keys are identical rows.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("disc_price"),
        col("ln_price"), col("qty_sq"))

  private val f3Sql =
    s"""SELECT l_orderkey, l_linenumber,
       |  CAST(${Det.discPriceSql} AS DOUBLE) AS disc_price,
       |  abs(l_discount - 0.05) AS abs_disc_delta,
       |  ${Det.qroundSql("ln(l_extendedprice)", 6)} AS ln_price,
       |  l_quantity * l_quantity AS qty_sq,
       |  sqrt(l_quantity) AS qty_sqrt
       |FROM lineitem
       |ORDER BY l_orderkey, l_linenumber, disc_price, ln_price, qty_sq""".stripMargin

  /** F4 — array functions on the embedding column. The dot product is a
    * sequential left fold in both engines (Spark `aggregate` HOF; DuckDB
    * `list_reduce`) over exactly-widened floats → bit-identical doubles.
    */
  private def f4(s: SparkSession, dir: String): DataFrame = {
    val asDouble = transform(col("embedding"), x => x.cast("double"))
    val dotSelf = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    Tables(s, dir, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).as("n_dim"),
      dotSelf.as("norm_sq"),
      aggregate(asDouble, lit(0.0), (acc, x) => acc + x).as("elem_sum"),
      element_at(col("embedding"), 1).cast("double").as("first_elem"))
      .orderBy(col("vec_id"))
  }

  private val f4Sql =
    """SELECT vec_id,
      |  len(embedding) AS n_dim,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(list_zip(embedding, embedding),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
      |    (a, b) -> a + b) AS norm_sq,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE))),
      |    (a, b) -> a + b) AS elem_sum,
      |  CAST(embedding[1] AS DOUBLE) AS first_elem
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** F5 — JSON extraction from events.props. */
  private def f5(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy(col("event_id"))

  private val f5Sql =
    """SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  /** F6 — map functions: build a token→count map per document
    * (map_from_arrays), then explode it back to rows. The map is the
    * engine-surface under test; exploding + sorting makes the output
    * deterministic and oracle-able despite map internal ordering.
    */
  private def f6(s: SparkSession, dir: String): DataFrame = {
    val counted = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(map_from_arrays(collect_list(col("token")),
        collect_list(col("cnt"))).as("tok_map"))
    counted.select(col("doc_id"), explode(col("tok_map")))
      .withColumnRenamed("key", "token").withColumnRenamed("value", "cnt")
      .orderBy(col("doc_id"), col("token"))
  }

  private val f6Sql =
    """SELECT doc_id, token, COUNT(*) AS cnt FROM (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY doc_id, token ORDER BY doc_id, token""".stripMargin

  /** F7 — binary functions over the blob column (text-cast bytes, the X7
    * multimodal convention): octet length, MD5 / SHA-256 content digests,
    * base64 of a 12-byte prefix — the scalar catalog a binary-column
    * pipeline needs (digest-keyed dedup like X66, content-addressed
    * storage paths, wire-format spot checks). All codegen'd built-ins.
    *
    * Oracle parity: DuckDB 1.0's digest functions take VARCHAR only and
    * hash its UTF-8 bytes — exactly the bytes `text.cast("binary")` hashes
    * on the Spark side; the base64 prefix is substr-then-encode in DuckDB
    * (char offset == byte offset over the ASCII corpus — the
    * [[graft.functions.TextKernels]] assumption).
    */
  private def f7(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      length(col("text").cast("binary")).as("byte_len"),
      md5(col("text").cast("binary")).as("md5_hex"),
      sha2(col("text").cast("binary"), 256).as("sha256_hex"),
      base64(substring(col("text").cast("binary"), 1, 12)).as("b64_prefix"))
      .orderBy(col("doc_id"))

  private val f7Sql =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS byte_len,
      |  md5(text) AS md5_hex,
      |  sha256(text) AS sha256_hex,
      |  to_base64(encode(substr(text, 1, 12))) AS b64_prefix
      |FROM documents ORDER BY doc_id""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("fn_string", f1, Some(f1Sql)),
    Q("fn_binary", f7, Some(f7Sql)),
    Q("fn_date", f2, Some(f2Sql)),
    Q("fn_math", f3, Some(f3Sql)),
    Q("fn_array", f4, Some(f4Sql)),
    Q("fn_json", f5, Some(f5Sql)),
    Q("fn_map", f6, Some(f6Sql)),
  )
}
