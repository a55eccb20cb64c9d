package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{GraphQueries, ImageQueries, Relational, TemporalQueries, TextPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Each `queries` entry is one operator from the SURVEY §2 inventory
  * (or a pipeline extension); entries with a DuckDB-equivalent SQL also
  * appear in `oracleSql` and are hash-checked by the driver at sf0.01.
  */
object SparkEntry {

  private val all: List[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Relational.entries ++ TextPipeline.entries ++ ImageQueries.entries ++
      TemporalQueries.entries ++ GraphQueries.entries

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary — scan, filter, agg, sort. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q, _) => name -> q }.toMap

  def oracleSql: Map[String, String] =
    all.collect { case (name, _, Some(sql)) => name -> sql }.toMap

  /** Oracles whose SQL inlines deterministic fitted parameters
    * recomputed from the given sf directory (IVF centroids, PCA μ/W)
    * — generated at Verify time so the literals match the data the
    * gate actually ran on. Disjoint from [[oracleSql]] keys. A
    * non-empty `only` restricts building (each entry costs a fit). */
  def dataOracleSql(spark: SparkSession, dir: String,
                    only: Set[String] = Set.empty): Map[String, String] =
    TextPipeline.dataOracles
      .filter { case (name, _) => only.isEmpty || only(name) }
      .flatMap { case (name, build) =>
        try Some(name -> build(spark, dir))
        catch { case e: Throwable =>
          System.err.println(s"[oracle] $name fit failed: ${e.getMessage}"); None
        }
      }
}
