package graft

import graft.trace.TraceExport
import org.scalatest.funsuite.AnyFunSuite

/** TraceExport emits the reference's op-record schema (EP3 parity):
  * topological ids, dependency edges pointing backwards, and the three
  * op shapes (trans / elementwise / crossproduct). */
class TraceExportSpec extends AnyFunSuite {
  import TestSpark._

  test("op list is topologically numbered with backward deps") {
    val df = SparkEntry.queries("r3_region_customers")(spark, sf0001)
    val ops = TraceExport.opList(df)
    assert(ops.nonEmpty)
    ops.zipWithIndex.foreach { case (op, i) =>
      assert(op.contains(s""""index": $i"""), s"op $i misnumbered: $op")
      val deps = "\\d+".r.findAllIn(op.split("\"dependency\": ")(1).split("]")(0)).map(_.toInt)
      deps.foreach(d => assert(d < i, s"dep $d not before op $i"))
    }
  }

  test("join query contains scan (trans), join (crossproduct) and agg (elementwise) ops") {
    val json = TraceExport.toJson(
      SparkEntry.queries("r3_region_customers")(spark, sf0001))
    assert(json.contains(""""src": -1"""))          // scans from main memory
    assert(json.contains(""""type": "crossproduct"""")) // joins
    assert(json.contains(""""type": "elementwise""""))  // aggregates
    assert(json.contains(""""op_content""""))
  }
}
