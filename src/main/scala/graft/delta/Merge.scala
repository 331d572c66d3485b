package graft.delta

/** MERGE INTO clause forms (reference: the kernel exposes the
  * building blocks — file-granular rewrite via add/remove pairs,
  * transaction/mod.rs — and delta-spark defines the clause semantics;
  * this mirrors the Delta MERGE contract: clauses are evaluated in
  * order, first whose condition holds wins for a given row).
  *
  * Conditions and value expressions are Spark SQL strings over the
  * aliased relations `t` (target) and `s` (source), e.g.
  * `"t.k = s.k"`, `Map("v" -> "s.v + t.v")`.
  */
sealed trait MergeClause

object MergeClause {

  /** WHEN MATCHED [AND condition] THEN UPDATE SET col -> expr. */
  final case class MatchedUpdate(
      condition: Option[String],
      set: Map[String, String]) extends MergeClause

  /** WHEN MATCHED [AND condition] THEN DELETE. */
  final case class MatchedDelete(
      condition: Option[String]) extends MergeClause

  /** WHEN NOT MATCHED [AND condition] THEN INSERT (col -> expr over
    * `s`). Target columns absent from `values` become NULL.
    */
  final case class NotMatchedInsert(
      condition: Option[String],
      values: Map[String, String]) extends MergeClause

  /** WHEN NOT MATCHED BY SOURCE [AND condition] THEN UPDATE SET —
    * target rows with no source match. Conditions/exprs see `t` only.
    */
  final case class NotMatchedBySourceUpdate(
      condition: Option[String],
      set: Map[String, String]) extends MergeClause

  /** WHEN NOT MATCHED BY SOURCE [AND condition] THEN DELETE. */
  final case class NotMatchedBySourceDelete(
      condition: Option[String]) extends MergeClause
}
