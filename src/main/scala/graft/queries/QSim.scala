package graft.queries

/** Similarity search (placeholder — filled in next milestone). */
object QSim { val all: Seq[Q] = Seq() }
