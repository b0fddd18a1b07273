package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** Window helpers for the engine's documented bounded-frame windows.
  *
  * Several operators deliberately run a window over a table that is
  * bounded by construction (a band table with tens of rows, a bucket
  * scaffold with `numBuckets` rows, a duration spine) — single-task by
  * design, never over raw data. An unpartitioned `Window.orderBy(...)`
  * carries the same plan but makes `WindowExec` print a
  * "No Partition Defined" warning per execution, which drowns the
  * bench tail in noise and hides any FUTURE warning that would be a
  * real finding. `bounded` pins the same single-partition semantics
  * through a constant partition key, which WindowExec accepts
  * silently: every intentional bounded window routes through here, so
  * a WindowExec warning in a bench tail is a defect again.
  *
  * Spark 4's `EliminateWindowPartitions` optimizer rule would fold the
  * constant key away (restoring the warning), so the engine's session
  * builders (Bench / Verify / TestSpark) exclude that rule via
  * `spark.sql.optimizer.excludedRules` — the plan cost is identical
  * (one partition either way); only the warning signal differs.
  */
object Windows {

  /** Single-partition window over a deliberately bounded table:
    * identical semantics (and default frame) to
    * `Window.orderBy(order*)`, minus the per-execution warning. */
  def bounded(order: Column*): WindowSpec =
    Window.partitionBy(lit(1)).orderBy(order: _*)

  /** Single-partition unordered window (whole-table totals over a
    * bounded frame): `Window.partitionBy(lit(1))`. */
  def boundedAll: WindowSpec = Window.partitionBy(lit(1))
}
