package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO semantics (SQL:2016 / Delta-style upsert) composed from
  * ONE full-outer join — the lakehouse snapshot-refresh primitive, the
  * stateless companion to [[Scd2]] (which keeps validity history where
  * MERGE produces the new snapshot):
  *
  *   - WHEN MATCHED AND <cond>  THEN DELETE   (checked first, as the
  *     first matched clause in SQL MERGE — a row satisfying both the
  *     delete and update conditions is deleted)
  *   - WHEN MATCHED             THEN UPDATE SET ...
  *   - WHEN NOT MATCHED         THEN INSERT ...
  *   - WHEN NOT MATCHED BY SOURCE: retained unchanged (the default)
  *
  * In the joined frame the caller's conditions/assignments see target
  * columns as `t_<name>` and source columns as `s_<name>` — the
  * explicit disambiguation a generic merge needs.
  *
  * Scale shape: exactly one shuffle on the merge key (or a broadcast
  * join when the source batch is small — AQE decides); assignments are
  * codegen'd column expressions, so the whole merge is one
  * WholeStageCodegen pass over the join. The caller must supply a
  * source with UNIQUE keys (SQL MERGE raises on multi-match; dedupe
  * upstream with e.g. last-writer-wins).
  */
object MergeInto {

  /** @param matchedDeleteWhen condition over `s_*`/`t_*` columns; a
    *        matched row satisfying it is dropped from the result
    * @param matchedUpdate     (targetColumn -> assignment) for matched
    *        rows that survive the delete clause; unlisted columns keep
    *        their target value
    * @param notMatchedInsert  (targetColumn -> assignment) for source
    *        rows with no target match; unlisted columns become NULL
    * @param notMatchedInsertWhen optional condition gating the insert
    *        clause (`WHEN NOT MATCHED AND cond THEN INSERT`); unmatched
    *        source rows failing it are dropped. Gating inserts on e.g.
    *        `s_op <> 'd'` makes re-applying the same batch a no-op —
    *        the idempotence a retried refresh job needs. */
  def mergeInto(target: DataFrame, source: DataFrame, key: String,
      matchedDeleteWhen: Option[Column] = None,
      matchedUpdate: Seq[(String, Column)] = Nil,
      notMatchedInsert: Seq[(String, Column)] = Nil,
      notMatchedInsertWhen: Option[Column] = None): DataFrame = {
    val t = target.columns.foldLeft(target)(
      (d, c) => d.withColumnRenamed(c, s"t_$c"))
    val s = source.columns.foldLeft(source)(
      (d, c) => d.withColumnRenamed(c, s"s_$c"))
    val j = t.join(s, col(s"t_$key") === col(s"s_$key"), "full_outer")
    val isMatched = col(s"t_$key").isNotNull && col(s"s_$key").isNotNull
    val targetOnly = col(s"s_$key").isNull
    val del = matchedDeleteWhen.getOrElse(lit(false))
    val ins = notMatchedInsertWhen.getOrElse(lit(true))
    val updMap = matchedUpdate.toMap
    val insMap = notMatchedInsert.toMap
    val outCols = target.columns.toSeq.map { c =>
      when(targetOnly, col(s"t_$c"))
        .when(isMatched, updMap.getOrElse(c, col(s"t_$c")))
        .otherwise(insMap.getOrElse(c, lit(null))).as(c)
    }
    val keep = when(targetOnly, lit(true))
      .when(isMatched, !coalesce(del, lit(false)))
      .otherwise(coalesce(ins, lit(false)))
    j.where(keep).select(outCols: _*)
  }
}
