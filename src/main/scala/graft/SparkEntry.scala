package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module QueryDef lists; every entry with an oracle
  * participates in the DuckDB hash-compare gate, the rest get rows>0.
  */
object SparkEntry {

  /** All implemented queries, one per SURVEY.md §2 operator/capability. */
  def defs: Seq[QueryDef] =
    graft.queries.Tpch.defs ++ graft.queries.Analytics.defs ++
      graft.operators.CoreOps.defs ++
      graft.operators.KvsOps.defs ++ graft.operators.EventOps.defs ++
      graft.operators.JoinOps.defs ++
      graft.llm.Dedup.defs ++ graft.llm.TextOps.defs ++
      graft.llm.TrainPrep.defs ++ graft.llm.Curate.defs ++
      graft.llm.AnnOps.defs ++ graft.llm.MultiModal.defs ++
      graft.sources.Ingest.defs ++ graft.sources.CmdFarm.defs ++
      graft.core.Checkpoint.defs ++
      graft.algos.Iterative.defs ++ graft.algos.Graph.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    graft.queries.Tpch.defs.head.fn(spark, d)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
