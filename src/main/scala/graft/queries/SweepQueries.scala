package graft.queries

/** Parameter-sweep / hashing / array-shape operators mapped onto the test
  * tables (filled in batch 3). */
object SweepQueries {
  val qs: Seq[Q] = Seq.empty
}
