package graft.plans

/** Env-var-driven engine settings, name-compatible with the reference's
  * `RunSettings.FromEnvironmentVariables` (Settings/RunSettings.cs:27-74)
  * and defaults (Settings/BlobSettings.cs:31-35).
  */
case class GraftSettings(
    etlAction: String,            // "PrePartition" | "Split"
    format: String,               // "txt" | "csv"
    inputCompression: String,     // "None" | "GZip" | "Zip"
    outputCompression: String,    // "None" | "GZip"
    hasHeaders: Boolean,
    maxMbPerShard: Int,
    sourcePath: String,
    destinationPath: String) {
  require(Set("PrePartition", "Split")(etlAction), s"unknown EtlAction $etlAction")
  require(Set("None", "GZip", "Zip")(inputCompression), s"bad InputCompression")
  require(Set("None", "GZip")(outputCompression), s"bad OutputCompression")
  def maxBytesPerShard: Long = maxMbPerShard.toLong * 1024 * 1024
}

object GraftSettings {
  /** Reference defaults: Format=txt, compression None, 200 MB shards. */
  def fromEnv(env: Map[String, String] = sys.env): GraftSettings =
    GraftSettings(
      etlAction = env.getOrElse("EtlAction", "PrePartition"),
      format = env.getOrElse("Format", "txt"),
      inputCompression = env.getOrElse("InputCompression", "None"),
      outputCompression = env.getOrElse("OutputCompression", "None"),
      hasHeaders = env.get("HasHeaders").exists(_.toBoolean),
      maxMbPerShard = env.get("MaxMbPerShard").map(_.toInt).getOrElse(200),
      sourcePath = env.getOrElse("SourcePath", ""),
      destinationPath = env.getOrElse("DestinationPath", ""))
}
