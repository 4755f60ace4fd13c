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

  test("per-query detail survives at 90 queries (short-key tier)") {
    // The real gate plus synthetic x-family queries, gate-style names:
    // detail must survive the budget via one of the compression tiers,
    // not collapse to the totals-only summary.
    val extra = (1 to (90 - SparkEntry.queries.size))
      .map(i => f"x$i%d_synthetic_gate_growth" -> 1.23456)
    val ninety = fakeResults ++ extra
    assert(ninety.size == 90)
    val line = Bench.renderFinal(ninety, "/root/testdata/sf0.1")
    assert(line.length <= Bench.FinalLineBudget)
    val node = mapper.readTree(line)
    val qs = node.get("queries")
    assert(qs != null && qs.size() == 90, "per-query detail was dropped at 90 queries")
    // short-key tier must be self-describing and collision-free
    if (node.get("keys") != null && node.get("keys").asText() == "short") {
      assert(qs.has("e1") || qs.has(Bench.shortKey(fakeResults.keys.head)))
    }
  }

  test("short keys are collision-free for the real gate and map back uniquely") {
    val names = SparkEntry.queries.keys.toSeq
    val shorts = names.map(Bench.shortKey)
    assert(shorts.distinct.size == names.size,
      s"short-key collision: ${shorts.diff(shorts.distinct).distinct}")
  }

  test("short-key collision disables the short tier, never emits ambiguous keys") {
    val colliding = Map("q1_alpha" -> 1.0, "q1_beta" -> 2.0) ++
      (1 to 200).map(i => f"z${i}_long_enough_to_overflow_the_rounded_tiers" -> 1.23456)
    val line = Bench.renderFinal(colliding, "/root/testdata/sf0.1")
    assert(line.length <= Bench.FinalLineBudget)
    val node = mapper.readTree(line)
    // with shorts disabled and 202 long names, only the summary fits
    assert(node.get("keys") == null)
    assert(node.get("queries") == null || node.get("queries").size() == colliding.size)
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
