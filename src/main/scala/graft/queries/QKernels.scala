package graft.queries

/** Linear-algebra kernels (placeholder — filled in next milestone). */
object QKernels { val all: Seq[Q] = Seq() }
