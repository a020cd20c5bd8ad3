package graft.queries

/** LLM-pipeline extension operators (dedup, similarity search, text
  * analysis, multimodal plumbing) over documents/embeddings
  * (filled in batch 4). */
object ExtQueries {
  val qs: Seq[Q] = Seq.empty
}
