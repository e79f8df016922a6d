package graft

import org.apache.spark.sql.SparkSession

/** The at-scale session profile (r13, VERDICT r12 item 5) — the
  * 100-TB playbook's prose (PLANS.md "Config posture") as one
  * machine-readable conf set, selectable by `SPARK_GRAFT_CONF=cluster`
  * in every driver main (Bench / Verify / Explain share the expansion
  * through [[HarnessConf]]).
  *
  * Two regimes, one codebase:
  *
  *  - **Bench tier (default, no env)**: AQE off (measured r5: 50–200 ms
  *    of driver replanning per query-stage barrier at MB scale),
  *    shuffle.partitions=32 with per-key presizing (PartitionPolicy),
  *    64m broadcast threshold on the single 128 GiB host.
  *  - **Cluster profile (this object)**: what the same library ships
  *    with on a multi-executor cluster, where every one of those
  *    trade-offs flips — barriers amortize over seconds-long stages,
  *    partition counts follow data volume, and broadcast budgets
  *    follow per-executor memory.
  *
  * The graded plans must NOT depend on the regime: broadcasts and
  * partitioning are explicit in the operator code, AQE only re-splits
  * and coalesces. `ClusterProfileSpec` executes every registered
  * query under both regimes and asserts identical results, and the
  * hash gate can run fully under the profile via
  * `SPARK_GRAFT_CONF=cluster runMain graft.Verify …` (PLANS.md r13
  * log records the sf0.1 preflight under the profile).
  *
  * Every entry is a session-level `spark.sql.*` conf on purpose: the
  * profile can be applied to a `SparkSession.newSession()` without a
  * JVM or context restart, which is also how the parity spec isolates
  * it. Cluster-manager settings (executor memory/cores, dynamic
  * allocation) are deployment-specific and belong in spark-submit
  * conf, not here.
  */
object ClusterProfile {

  val entries: Seq[(String, String)] = Seq(
    // AQE back on: skew-join splitting and runtime SMJ→BHJ
    // re-selection are worth whole stages at TB scale (the bench
    // tier's 50–200 ms barrier cost is noise there).
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    // Target shuffle partition size: middle of the 64–256 MB band the
    // playbook sizes for; AQE coalesces the static width below down
    // to this, so the static number only needs to be "wide enough".
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128m",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256m",
    // Static shuffle width: a cluster-scale default (Spark's own 200)
    // rather than the single-host 32; with coalescing on, overshooting
    // costs task-launch overhead only, undershooting costs spills.
    // At a real 100 TB job this is sized ≈ shuffled-bytes / 128 MB.
    "spark.sql.shuffle.partitions" -> "200",
    // Broadcast budget follows PER-EXECUTOR memory, not the 128 GiB
    // host: 32m fits comfortably in a 4–8 GiB executor alongside
    // shuffle buffers. Dim tables (region/nation/codebooks) stay far
    // below it at any corpus size.
    "spark.sql.autoBroadcastJoinThreshold" -> "32m",
    // Scan split size: bound per-task input so a 100 TB directory
    // becomes ~400k well-sized tasks instead of fewer huge ones.
    "spark.sql.files.maxPartitionBytes" -> "256m",
  )

  /** The profile as a SPARK_GRAFT_CONF-syntax string. */
  def conf: String = entries.map { case (k, v) => s"$k=$v" }.mkString(",")

  /** Apply to a builder (driver mains) — same entries, one source. */
  def apply(builder: SparkSession.Builder): SparkSession.Builder = {
    entries.foreach { case (k, v) => builder.config(k, v) }
    builder
  }
}
