package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** The orchestration layer: a DAG of named stages materializing parquet
  * checkpoints, with completed outputs skipped on re-run — the law/luigi
  * task-graph behavior reduced to its engine-relevant core (SURVEY §3;
  * reference task caching: content-addressed law targets, state passed
  * exclusively through files).
  *
  * Each stage writes only what it produced (diff columns, SURVEY §2.4) and
  * downstream stages re-assemble via UpdateMerge — so a failed pipeline
  * resumes from the last completed checkpoint, and a changed stage only
  * invalidates its own subtree (delete its checkpoint dir).
  *
  * Scale notes: checkpoints default to snappy parquet with file sizing
  * left to AQE; pass `buckets > 0` to write bucketed-by-key tables so the
  * downstream diff merge is a co-partitioned join without a shuffle.
  */
final class Pipeline(spark: SparkSession, root: String) {

  private def done(name: String): Boolean =
    Files.exists(Paths.get(s"$root/$name/_SUCCESS"))

  private def versionFile(name: String) = Paths.get(s"$root/$name/_GRAFT_VERSION")

  /** Run `build` unless a completed checkpoint exists; return the
    * checkpointed frame either way.
    *
    * `version` is the content-awareness hook (the reference's law targets
    * are content-addressed by task parameters): pass any string that
    * changes when the stage's code or config changes (a config hash, a
    * git revision, a bumped literal) and a checkpoint written under a
    * DIFFERENT version is invalidated and rebuilt instead of silently
    * reused. The empty default keeps _SUCCESS-only semantics for
    * exploratory use. */
  def stage(name: String, version: String = "")(build: => DataFrame): DataFrame =
    stageChecked(name, version, checkFinite = false)(build)

  /** [[stage]] with the reference's finite-output task guard
    * (`check_finite_output`, law.cfg:75-78): when `checkFinite` is set,
    * the freshly-built checkpoint is audited for NaN/±Inf in every float
    * column (one aggregation over the just-written files) BEFORE it is
    * returned — a corrupt stage fails its own run instead of poisoning
    * every consumer. Already-completed checkpoints are not re-audited. */
  def stageChecked(name: String, version: String = "", checkFinite: Boolean = false)(
      build: => DataFrame): DataFrame = {
    val stale = version.nonEmpty && done(name) && {
      val vf = versionFile(name)
      !Files.exists(vf) || new String(Files.readAllBytes(vf), "UTF-8") != version
    }
    if (stale) invalidate(name)
    if (!done(name)) {
      build.write.mode("overwrite").parquet(s"$root/$name")
      if (checkFinite)
        try graft.core.Integrity.assertFinite(spark.read.parquet(s"$root/$name"))
        catch { case e: IllegalArgumentException => invalidate(name); throw e }
      if (version.nonEmpty)
        Files.write(versionFile(name), version.getBytes("UTF-8")): Unit
    }
    spark.read.parquet(s"$root/$name")
  }

  /** Stage variant expanded once per shift: `stageShifted("select",
    * shifts)(s => ...)` materializes `select/shift=<name>` per shift —
    * the reference's shift-aware task families. */
  def stageShifted(name: String, shifts: Seq[Shift], version: String = "")(
      build: Shift => DataFrame): Map[String, DataFrame] =
    shifts.map { s =>
      s.name -> stage(s"$name/shift=${s.name}", version)(build(s))
    }.toMap

  /** Drop a stage's checkpoint (and thereby force downstream rebuilds on
    * next run — caller controls subtree invalidation). */
  def invalidate(name: String): Unit = {
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
    }
    rm(new java.io.File(s"$root/$name"))
  }
}
