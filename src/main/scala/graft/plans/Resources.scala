package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** B3/B4 — the control-plane resource lookups the reference performs at
  * context creation (RunningContext.CreateAsync):
  *
  *   B3 `.get ingestion resources` → rows of (resource type, storage URI),
  *      filtered to the TempStorage rows = the staging containers
  *      (reference: RunningContext.cs:141-149)
  *   B4 `.show query service uri` → one scalar engine query URI
  *      (reference: RunningContext.cs:97-100)
  *
  * Like PartitionPolicy (B1/B2), both are small-DataFrame pipelines over a
  * JSON document, so the same logic serves a config file, a secrets store
  * dump, or an inline fixture. The frames are metadata-scale (a handful of
  * rows) — the explode/filter shapes mirror the KQL the reference issues.
  */
object Resources {

  val resourcesSchema: StructType = StructType(Seq(
    StructField("Resources", ArrayType(StructType(Seq(
      StructField("ResourceTypeName", StringType),
      StructField("StorageRoot", StringType))))),
    StructField("QueryServiceUri", StringType)))

  /** The resources document → (resource_type, storage_root) rows. */
  def parseResources(spark: SparkSession, resourcesJson: String): DataFrame =
    spark.range(1).select(lit(resourcesJson).as("doc"))
      .select(from_json(col("doc"), resourcesSchema).as("r"))
      .select(explode(col("r.Resources")).as("res"))
      .select(col("res.ResourceTypeName").as("resource_type"),
        col("res.StorageRoot").as("storage_root"))

  /** B3: the staging containers — TempStorage rows only, stable order. */
  def stagingContainers(spark: SparkSession, resourcesJson: String): DataFrame =
    parseResources(spark, resourcesJson)
      .filter(col("resource_type") === "TempStorage")
      .orderBy("storage_root")

  /** B4: the scalar engine query URI. */
  def queryServiceUri(spark: SparkSession, resourcesJson: String): String =
    spark.range(1).select(lit(resourcesJson).as("doc"))
      .select(from_json(col("doc"), resourcesSchema).as("r"))
      .select(col("r.QueryServiceUri"))
      .collect()(0).getString(0)

  /** A built-in fixture document (the shape `.get ingestion resources`
    * returns: several TempStorage roots — the round-robin spread targets —
    * plus queue resources the pre-forge engine ignores).
    */
  val fixtureJson: String =
    """{"Resources": [
      |  {"ResourceTypeName": "TempStorage", "StorageRoot": "https://acct0.blob.example/ingest-staging-0"},
      |  {"ResourceTypeName": "TempStorage", "StorageRoot": "https://acct1.blob.example/ingest-staging-1"},
      |  {"ResourceTypeName": "TempStorage", "StorageRoot": "https://acct2.blob.example/ingest-staging-2"},
      |  {"ResourceTypeName": "SecuredReadyForAggregationQueue", "StorageRoot": "https://acct0.queue.example/ready-0"},
      |  {"ResourceTypeName": "FailedIngestionsQueue", "StorageRoot": "https://acct0.queue.example/failed-0"}
      |], "QueryServiceUri": "https://engine.example/v1/query"}""".stripMargin
}
