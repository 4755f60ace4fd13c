package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The bench handshake is the one artifact the driver parses from a bounded
  * stdout tail window (~2000 chars). These tests pin the final-line contract
  * without starting a SparkSession: the rendered line must stay under the
  * budget for the real query set and must be valid JSON in both the rounded
  * and the fallback form.
  */
class BenchSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  // Realistic per-query timings: a skewed mix like the observed bench
  // (median ~0.4 s, one ~18 s outlier) so value widths match production.
  private def fakeResults: Map[String, Double] =
    SparkEntry.queries.keys.zipWithIndex.map { case (name, i) =>
      name -> (if (i == 0) 17.654321987 else 0.1 + (i % 40) * 0.123456789)
    }.toMap

  test("final line fits the driver tail window for the full query set") {
    val line = Bench.renderFinal(fakeResults, "/root/testdata/sf0.1")
    assert(line.length <= Bench.FinalLineBudget,
      s"final bench line is ${line.length} chars, budget ${Bench.FinalLineBudget}")
    assert(!line.contains("\n"))
  }

  test("final line is valid JSON with the contract fields") {
    val node = mapper.readTree(Bench.renderFinal(fakeResults, "/root/testdata/sf0.1"))
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("value").isNumber)
    assert(node.get("load1") != null && node.get("load1").isNumber,
      "bench JSON must carry the ambient load average")
    assert(node.get("sf").asText() == "/root/testdata/sf0.1")
    // With today's 74 queries the rounded form fits, so per-query detail
    // must survive into the final line.
    val qs = node.get("queries")
    assert(qs != null && qs.size() == SparkEntry.queries.size)
  }

  test("fallback summary is valid JSON and under budget when queries overflow") {
    // Enough synthetic queries that even the rounded form cannot fit.
    val many = (1 to 300).map(i => f"q$i%03d_synthetic_overflow_name" -> 1.234).toMap
    val line = Bench.renderFinal(many, "/root/testdata/sf0.1")
    assert(line.length <= Bench.FinalLineBudget)
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("detail").asText() == "bench_out.json")
  }

  test("full-precision render is valid JSON and carries every query") {
    val node = mapper.readTree(Bench.renderFull(fakeResults, "/root/testdata/sf0.1"))
    assert(node.get("queries").size() == SparkEntry.queries.size)
  }
}
