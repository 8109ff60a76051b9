package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All verifiable queries, grouped by area. */
  def allDefs: Seq[QueryDef] =
    q.Relational.defs ++ q.Relational2.defs ++ q.Text.defs ++ q.Dedup.defs ++
      q.Vectors.defs ++ q.Engine.defs ++ q.Media.defs ++ q.Pipeline2.defs ++
      q.Pipeline3.defs ++ q.Engine2.defs ++ q.Pipeline4.defs ++ q.Engine3.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.defs.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each entry is
    * self-contained: a declared fixture `setup` (DDL gates) runs before the
    * measured query, so callers need no ordering knowledge. The bench alone
    * uses [[allDefs]] to time setup and query separately. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { d =>
      d.name -> { (s: SparkSession, dir: String) =>
        d.setup.foreach(_(s, dir)); d.run(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
