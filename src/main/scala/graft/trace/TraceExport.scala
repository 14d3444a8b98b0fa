package graft.trace

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import scala.collection.mutable

/** Op-trace export — parity with the reference's only output artifact
  * (/root/reference/src/main.rs:17-25: a JSON array of op records
  * {index, module, dependency, op, op_content:{name}}, schema per
  * src/op.rs:49-63 TransOp {src,dst,len}, :92-105 VecOp
  * {complexity, type:"elementwise"}, :146-162 CrossPOp
  * {k,m,n,complexity,type:"crossproduct"}).
  *
  * Where the reference hand-builds its dependency DAG
  * (outer_product.rs:171-367), Spark already HAS the DAG — the physical
  * plan. This utility walks `df.queryExecution.executedPlan` bottom-up,
  * numbers nodes topologically (children before parents, matching the
  * reference's Tik counter, util.rs:1-19), and maps each node to the
  * closest reference op type:
  *  - scans and exchanges (data movement)        -> TransOp-shaped
  *  - joins (pairwise combination)               -> CrossPOp-shaped
  *  - everything else (per-row/aggregate compute) -> VecOp-shaped
  * `src = -1` keeps the reference's "main memory" convention for scans;
  * sizes come from plan statistics where available (len/complexity in
  * bytes rather than the reference's element counts).
  */
object TraceExport {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** The op list of a query's physical plan, as JSON objects. */
  def opList(df: DataFrame): Seq[String] = {
    val ops = mutable.Buffer[String]()

    def sizeOf(p: SparkPlan): Long =
      p.logicalLink.map(_.stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong).getOrElse(-1L)

    def visit(p: SparkPlan): Int = p match {
      // unwrap AQE shells so the trace shows the real operator DAG
      case a: AdaptiveSparkPlanExec => visit(a.inputPlan)
      case q: QueryStageExec => visit(q.plan)
      case _ => visitNode(p)
    }

    def visitNode(p: SparkPlan): Int = {
      val deps = p.children.map(visit)
      val id = ops.length
      val name = p.nodeName
      val depStr = deps.mkString("[", ", ", "]")
      val size = sizeOf(p)
      val (module, op) = name match {
        case n if n.contains("Join") =>
          (id.toString,
            s"""{"k": -1, "m": -1, "n": -1, "complexity": $size, "type": "crossproduct"}""")
        case n if n.contains("Scan") || p.children.isEmpty =>
          // any source leaf (file scan, Range generator, local relation)
          // is the reference's memory→mapper load: src = -1 = main memory
          ("global", s"""{"src": -1, "dst": $id, "len": $size}""")
        case n if n.contains("Exchange") || n.contains("Broadcast") =>
          ("global", s"""{"src": ${deps.headOption.getOrElse(-1)}, "dst": $id, "len": $size}""")
        case _ =>
          (id.toString, s"""{"complexity": $size, "type": "elementwise"}""")
      }
      ops += s"""{"index": $id, "module": "${esc(module)}", "dependency": $depStr, """ +
        s""""op": $op, "op_content": {"name": "${esc(name)}"}}"""
      id
    }

    visit(df.queryExecution.executedPlan)
    ops.toSeq
  }

  /** Pretty JSON array, the reference's file shape (main.rs:22). */
  def toJson(df: DataFrame): String =
    opList(df).mkString("[\n  ", ",\n  ", "\n]")

  /** Human-readable one-line-per-op form (reference format_op, main.rs:19). */
  def formatOps(df: DataFrame): String =
    opList(df).mkString("\n")
}
