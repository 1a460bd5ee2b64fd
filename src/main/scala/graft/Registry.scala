package graft

import graft.operators._

/** The full declared operator inventory (SURVEY.md §2) in a stable,
  * insertion-ordered sequence. Names are the driver's correctness keys —
  * never rename a declared query.
  */
object Registry {
  val all: Seq[Q] =
    Scans.all ++
      Projections.all ++
      Aggregations.all ++
      Joins.all ++
      Windows.all ++
      SortSet.all ++
      SemiStructured.all ++
      TextOps.all ++
      Similarity.all ++
      EventOps.all ++
      Extensibility.all ++
      Multimodal.all ++
      Extras.all ++
      Sinks.all ++
      Subqueries.all ++
      DataQuality.all ++
      TpchShapes.all ++
      Round2Ops.all ++
      Round3Ops.all ++
      Round3cOps.all ++
      Round3dOps.all ++
      Round3eOps.all ++
      Round4Ops.all ++
      Round5Ops.all ++
      Round5bOps.all ++
      Round5cOps.all ++
      Round5dOps.all ++
      Round5eOps.all ++
      Round5fOps.all ++
      Round5gOps.all ++
      Round5hOps.all ++
      Round5iOps.all ++
      Round5jOps.all ++
      Round5kOps.all ++
      Round5lOps.all ++
      Round5mOps.all ++
      Round5nOps.all ++
      Round5oOps.all ++
      Round5pOps.all ++
      Round5qOps.all ++
      Round5rOps.all ++
      Round5sOps.all ++
      Round5tOps.all ++
      Round5uOps.all ++
      Round5vOps.all ++
      Round5wOps.all ++
      Round5xOps.all ++
      Round5yOps.all ++
      Round5zOps.all ++
      Round5aaOps.all ++
      Round5abOps.all ++
      Round5acOps.all ++
      Round5adOps.all ++
      Round5aeOps.all ++
      Round5afOps.all ++
      Round5agOps.all ++
      Round6Ops.all ++
      Round6bOps.all ++
      Round6cOps.all ++
      Round6dOps.all ++
      Round6eOps.all ++
      Round6fOps.all ++
      Round6gOps.all ++
      Round6hOps.all ++
      Round6iOps.all ++
      Round6jOps.all ++
      Round7Ops.all ++
      Round7bOps.all ++
      Round7cOps.all ++
      Round7dOps.all ++
      Round7eOps.all ++
      Round7fOps.all ++
      Round7gOps.all ++
      Round7hOps.all ++
      Round7iOps.all ++
      Round7jOps.all ++
      Round7kOps.all ++
      Round7lOps.all ++
      Round7mOps.all ++
      Round7nOps.all ++
      Round7oOps.all ++
      Round7pOps.all ++
      Round7qOps.all ++
      Round7rOps.all ++
      Round7sOps.all ++
      Round7tOps.all ++
      Round7uOps.all ++
      Round7vOps.all ++
      Round7wOps.all ++
      Round8Ops.all ++
      Round9Ops.all ++
      Round10Ops.all ++
      Round11Ops.all ++
      Round11bOps.all

  // Uniqueness invariants, enforced at first use so EVERY entry point
  // (Verify, Bench, tests, lints, the gate) trips on a violation — the
  // r8/r9 verdicts' numeric-prefix hygiene criterion, retired as a
  // class: full names must be unique (the driver's correctness key) and
  // so must the `q_<family>_<number>` prefix (the human/waiver/PERF
  // shorthand, which ambiguous prefixes silently mis-address).
  locally {
    val dupNames = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dupNames.isEmpty, s"duplicate query names: ${dupNames.mkString(", ")}")
    val prefix = "^(q_[a-z0-9]+_[0-9]+)_".r
    val dupPrefixes = all.map(_.name)
      .groupBy(n => prefix.findFirstMatchIn(n).map(_.group(1)).getOrElse(n))
      .collect { case (p, ns) if ns.size > 1 => s"$p: ${ns.mkString("/")}" }
    require(dupPrefixes.isEmpty,
      s"colliding numeric prefixes: ${dupPrefixes.mkString("; ")}")
  }

  def byName(name: String): Q =
    all.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"no declared query named $name"))
}
