package graft

/** Marker for DESIGNED refusals — admission-gate exceptions whose firing is
  * the specified behavior of a sized operator, not a failure (r16 verdict
  * task 3: the 100× record's `errors` field carried the simhash pair-volume
  * gate's refusal for a round, so `errors != {}` stopped signalling
  * breakage).
  *
  * A gate that predicts its cost from a cheap sizing aggregate and throws
  * BEFORE doing the work (pair-volume enumeration caps, wedge-shuffle spill
  * budgets) mixes this in; [[Bench]] then routes the face to the artifact's
  * `refused` field (sizing string preserved) and reserves `errors` for real
  * failures. A thrown non-gate exception never carries this trait and still
  * lands in `errors` — BenchPhasesSpec pins both routes.
  */
trait DesignedRefusal extends Throwable
