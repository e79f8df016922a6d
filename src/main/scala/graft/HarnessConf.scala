package graft

import org.apache.spark.sql.SparkSession

/** Shared harness-session configuration for the three driver mains
  * (Bench / Verify / Explain).
  *
  * The drivers must agree on BOTH halves of the session-conf story,
  * or the hash gate and plan dumps certify different plans than the
  * bench times (ADVICE r7 — Bench honored the sweep hook, Verify and
  * Explain did not):
  *
  *  - `SPARK_GRAFT_CONF="k=v,k=v"` overrides any session conf — the
  *    experiment hook for global sweeps. Comma is the entry
  *    separator, so list-valued confs can't be set here; a segment
  *    without '=' fails loudly instead of a MatchError.
  *  - The per-key PartitionPolicy presizing is DISABLED whenever that
  *    env pins `spark.sql.shuffle.partitions`: a global sweep is
  *    exactly the experiment the per-key policy would silently
  *    defeat.
  */
object HarnessConf {

  /** Apply the SPARK_GRAFT_CONF overrides to a session builder. */
  def applyEnv(builder: SparkSession.Builder): SparkSession.Builder = {
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(',').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => builder.config(k, v)
        case _ => sys.error(s"SPARK_GRAFT_CONF entry without '=': '$kv'")
      }
    })
    builder
  }

  /** Is the per-key shuffle presizing in force for this process? One
    * definition, so Bench (timing), Verify (hash gate), and Explain
    * (plan dumps) always flip together. */
  def policyActive: Boolean = !sys.env.get("SPARK_GRAFT_CONF")
    .exists(_.contains("spark.sql.shuffle.partitions"))
}
