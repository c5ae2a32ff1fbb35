package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchFormatSpec extends AnyFunSuite {

  test("compact line points reps_in at the run's actual out file and is valid shape") {
    val line = Bench.compactLine(12.345,
      Seq("slow_query" -> 10.0, "fast_query" -> 2.345),
      totalQueries = 5, sfDir = "/data/sf0.1", outFile = "/tmp/custom_bench.json")
    // the r5 advice regression: a hardcoded "BENCH_LOCAL.json" here
    // sent readers of a captured tail to a file the run never wrote
    assert(line.contains("\"reps_in\":\"/tmp/custom_bench.json\""))
    assert(!line.contains("BENCH_LOCAL"))
    assert(line.contains("\"queries_total\":5") && line.contains("\"queries_omitted\":3"))
    assert(line.contains("\"slow_query\":10.000"))
  }
}
