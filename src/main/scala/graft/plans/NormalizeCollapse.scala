package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.UnicodeNormalize

/** Optimizer rule: collapse redundant Unicode-normalization chains.
  *
  * UAX #15 (§ "Normalization Forms are idempotent") gives two algebraic
  * identities this rewrites on the PLAN, so composed pipeline stages that
  * each defensively normalize don't pay the (linear-in-text) pass twice
  * per row at 100 TB:
  *
  *   1. toF(toF(x))  == toF(x)                     (idempotence)
  *   2. toKF(toCF(x)) == toKF(x) for CF ∈ {NFC, NFD}, KF ∈ {NFKC, NFKD}
  *      (a compatibility form absorbs a prior canonical form: canonical
  *      (de)composition never introduces compatibility differences, so the
  *      K-form's decomposition mapping subsumes it — UAX #15 §1.2)
  *
  * NOT rewritten: canonical-after-compatibility (NFC(NFKD(x)) is NFKC(x),
  * a DIFFERENT output string than NFC(x)) and K-after-K of the other
  * flavor — only provably output-identical chains collapse. The spec
  * backs both identities with a runtime property check over adversarial
  * strings (combining marks, ligatures, singletons).
  */
object NormalizeCollapse extends Rule[LogicalPlan] {
  private val Canonical = Set("NFC", "NFD")
  private val Compat = Set("NFKC", "NFKD")

  private def absorbs(outer: String, inner: String): Boolean =
    outer == inner || (Compat(outer) && Canonical(inner))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case UnicodeNormalize(inner @ UnicodeNormalize(grandchild, f1), f2)
          if absorbs(f2, f1) =>
        UnicodeNormalize(grandchild, f2)
    }
}
