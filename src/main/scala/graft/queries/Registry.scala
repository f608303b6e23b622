package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: the Spark implementation plus (when
  * SQL-expressible) its DuckDB twin. Column names and row order must match
  * between the two — the driver sorts columns by name and hash-compares
  * values (SURVEY §7.4), so every query ends with a total ORDER BY over a
  * unique key, on both sides.
  */
case class Q(key: String,
             fn: (SparkSession, String) => DataFrame,
             oracle: Option[String])

object Registry {
  lazy val all: Seq[Q] =
    Substrate.qs ++ ScalarFns.qs ++ GraphQueries.qs ++ IterQueries.qs ++
      UserGraphQueries.qs ++ NetworkQueries.qs ++ TextQueries.qs ++
      DedupQueries.qs ++ SimQueries.qs ++ StreamQueries.qs ++
      PipelineQueries.qs ++ TemporalQueries.qs ++ FeatureQueries.qs

  lazy val byKey: Map[String, Q] = {
    // Loud duplicate guard (round 14 — a `graph_summarize` re-registration
    // was silently last-wins-shadowed by this Map for a whole verify
    // cycle): a duplicate key means one implementation is dead code and
    // the oracle is checking the OTHER one.
    val dup = all.groupBy(_.key).collect { case (k, qs) if qs.size > 1 => k }
    require(dup.isEmpty,
      s"duplicate registry keys: ${dup.mkString(", ")}")
    all.map(q => q.key -> q).toMap
  }
}
