package graft.queries

/** Central query registry. Each family object contributes its defs; SparkEntry
  * and Bench derive their maps from here so the three stay in sync. */
object Registry {
  def all: Seq[QueryDef] =
    Relational.defs ++ Events.defs ++ Nested.defs ++ DataPipeline.defs ++
      Physics.defs ++ Ops.defs ++ Weights.defs ++ Analytics.defs

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  def benchSet: Seq[QueryDef] = all.filter(_.bench)

  /** Collapse whitespace so the SQL survives JSON round-trips cleanly. */
  private def normalize(sql: String): String =
    sql.trim.replaceAll("\\s+", " ")
}
