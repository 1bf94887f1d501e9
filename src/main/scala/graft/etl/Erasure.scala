package graft.etl

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subject-erasure cascade over a written OMOP parquet warehouse: remove
  * every row belonging to the given persons from every table that
  * carries a `person_id` column (domains, eras, costs, the person table
  * itself, and the person id-map), and report per-table removed counts.
  *
  * The reference has no erasure path (its reruns are truncate-reload);
  * a privacy-law deletion request against a standing warehouse needs
  * one. This is the DELETE-with-predicate (§2.7 M3) mutation expressed
  * functionally: per table, read → anti-join → eager localCheckpoint →
  * overwrite. The checkpoint materializes the survivors BEFORE the
  * overwrite touches the directory (Spark refuses to overwrite a path
  * it is lazily reading), so a mid-write crash can lose at most one
  * table's files, never produce a half-filtered view of a table it
  * already committed.
  *
  * Scale shape: the subject set is a broadcast anti-join probe (an
  * erasure request is human-sized; for bulk erasure pass a DataFrame
  * and the join degrades gracefully to shuffle), and each table is one
  * scan + one write — no global coordination across tables. Checkpoint
  * blocks are ContextCleaner-reclaimed as each table's frame goes out
  * of scope.
  *
  * Tables WITHOUT a person_id column are untouched by design: after the
  * cascade, a visit_map row for an erased person retains only an opaque
  * (source uuid → int) pair whose person link died with the
  * visit_occurrence rows — keep it (id-map stability for re-runs) or
  * extend the cascade through visit ids if even that pair must go.
  */
object Erasure {

  /** Erase by literal subject ids. */
  def erasePersons(spark: SparkSession, outDir: String,
                   personIds: Seq[Long]): DataFrame = {
    require(personIds.nonEmpty, "no person ids to erase")
    import spark.implicits._
    erasePersons(spark, outDir, personIds.toDF("person_id"))
  }

  /** Erase by a subject-id frame (column `person_id`). */
  def erasePersons(spark: SparkSession, outDir: String,
                   subjects: DataFrame): DataFrame = {
    import spark.implicits._
    val subj = broadcast(subjects.select(col("person_id")).distinct())
    val tables = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).sorted
    val report = tables.flatMap { t =>
      val path = s"$outDir/$t"
      // non-parquet artifacts (e.g. the validation json) skip silently
      Try(spark.read.parquet(path)).toOption.flatMap { df =>
        if (!df.columns.contains("person_id")) None
        else {
          val before = df.count()
          val kept = df.join(subj, Seq("person_id"), "left_anti")
            .localCheckpoint(true)
          kept.write.mode("overwrite").parquet(path)
          Some((t, before, before - kept.count()))
        }
      }
    }
    report.toSeq.toDF("table", "rows_before", "rows_removed")
  }
}
