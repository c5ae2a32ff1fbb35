package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.PolyHash

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("SELECT
  * graft_polyhash(text) ...")` works. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (see
  * Verify/Bench) — the DataFrame API path does not require it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_polyhash expects exactly 1 argument, got ${children.length}")
        PolyHash(children.head)
      }))
  }
}
