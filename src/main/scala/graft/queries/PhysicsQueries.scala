package graft.queries

/** Physics-formula operators (brine density/viscosity, rampup schedule)
  * mapped onto the test tables (filled in batch 3). */
object PhysicsQueries {
  val qs: Seq[Q] = Seq.empty
}
