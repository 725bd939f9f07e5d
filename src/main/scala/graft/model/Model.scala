package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** A model = named derived table with declared materialization, mirroring
  * the reference's dbt node (`dbt_project.yml:28-53`): a pure
  * transformation over its upstream models/sources plus a materializer.
  *
  * `transform` receives the resolved upstream DataFrames by name; Catalyst
  * sees the fully composed plan for view-materialized chains, so pruning
  * and pushdown cross model boundaries for free (the Spark equivalent of
  * dbt's view layering).
  */
final case class Model(
    name: String,
    deps: Seq[String],
    materialization: Materialization = Materialization.View,
    contract: Option[Contract] = None,
    customSchema: Option[String] = None)(
    val transform: Map[String, DataFrame] => DataFrame)

/** Materialization strategies (reference: view / table / incremental
  * `fct_economic_indicators.sql:3-6` / snapshot
  * `snapshots/snap_gdp_history.sql:4-11`).
  */
sealed trait Materialization
object Materialization {

  /** Unmaterialized — downstream models compose the logical plan. */
  case object View extends Materialization

  /** Full-refresh parquet table (CREATE TABLE AS equivalent). */
  case object Table extends Materialization

  /** Schema-drift policy for incremental appends
    * (`fct_economic_indicators.sql:5` `on_schema_change`).
    */
  sealed trait OnSchemaChange
  object OnSchemaChange {

    /** dbt default: the target schema is frozen; new upstream columns are
      * dropped, removed ones fail the append loudly.
      */
    case object Ignore extends OnSchemaChange

    /** `append_new_columns`: new upstream columns widen the target (old
      * rows read back null-filled); removed columns stay, null-filled on
      * new rows. Implemented with mixed-schema parquet files + mergeSchema
      * reads — no rewrite of existing data, so widening is O(1) at any
      * table size.
      */
    case object AppendNewColumns extends OnSchemaChange
  }

  /** High-watermark append with upsert key: only rows with
    * `watermarkCol > max(existing)` are processed, then anti-joined on
    * `uniqueKey` before append (dbt incremental + unique_key semantics,
    * `fct_economic_indicators.sql:28-31`). Late back-period revisions are
    * deliberately skipped — the snapshot captures those (SURVEY §7.4.8).
    */
  final case class Incremental(
      uniqueKey: String,
      watermarkCol: String,
      onSchemaChange: OnSchemaChange = OnSchemaChange.Ignore) extends Materialization

  /** SCD Type-2 history with `check` strategy on `checkCols` and hard-
    * delete invalidation (`snap_gdp_history.sql`): changed rows close the
    * current version and insert a new one; disappeared keys are closed.
    */
  final case class Snapshot(key: String, checkCols: Seq[String]) extends Materialization
}

/** Enforced model contract (reference `contract={'enforced': true}` +
  * column constraints, `_marts__models.yml:9-60`): schema equality checked
  * before writing; not-null/unique checked as data assertions (Spark has
  * no native constraints).
  */
final case class Contract(
    schema: StructType,
    notNull: Seq[String] = Nil,
    uniqueKeys: Seq[Seq[String]] = Nil)

final case class ContractViolation(model: String, detail: String)
    extends RuntimeException(s"contract violation in $model: $detail")
