package graft.queries

/** Text analysis + dedup (placeholder — filled in next milestone). */
object QText { val all: Seq[Q] = Seq() }
