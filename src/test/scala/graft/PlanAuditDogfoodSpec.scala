package graft

import graft.runtime.PlanAudit

/** The engine audits ITSELF: a cross-section of production-shaped
  * registered rows (scan/agg, model builds, dedup, ANN exact modes,
  * text analysis, joins) must carry no high-severity scale finding.
  * The known, documented exception is the reference's own global
  * ROW_NUMBER quirk (q_w2_global_id and the model-2 family) — the
  * faithful port W2 mandates, with `Ids.scaleSafeId` shipped as the
  * alternative — which is asserted to FLAG, proving the audit sees
  * through the engine's own plans rather than rubber-stamping them.
  */
class PlanAuditDogfoodSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val cleanRows = Seq(
    "q_rel_pricing_summary", // pushdown + partial agg
    "q_model_daily",         // model 1 end-to-end (broadcast joins)
    "q_ext_exact_dedup",     // fingerprint groupBy
    "q_a1_dual_count",       // dual count agg
    "q_j2_left_single",      // dim join
    "q_ext_langid",          // text analysis scan
    "q_ext_frag_skip",       // zone-map pruned fragment read
    "q_u1_pivot_union"       // metric pivot
  )

  test("production rows carry no high-severity scale findings") {
    cleanRows.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val rep = PlanAudit.audit(df)
      assert(rep.highSeverity.isEmpty, s"$name:\n${rep.render}")
    }
  }

  test("the documented W2 global-window quirk is SEEN by the audit") {
    val df = SparkEntry.queries("q_w2_global_id")(spark, dir)
    val rep = PlanAudit.audit(df)
    assert(rep.findings.exists(_.kind == "single-partition-window"),
      s"the audit must flag the reference's global ROW_NUMBER:\n${rep.render}")
  }

  test("q_w2_scale_safe: the shipped alternative has NO single-partition window") {
    val df = SparkEntry.queries("q_w2_scale_safe")(spark, dir)
    val rep = PlanAudit.audit(df)
    assert(!rep.findings.exists(_.kind == "single-partition-window"),
      s"the scale-safe id must not globally sort:\n${rep.render}")
    assert(rep.highSeverity.isEmpty, s"q_w2_scale_safe:\n${rep.render}")
  }
}
