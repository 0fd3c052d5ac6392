package graft.dsl

import scala.collection.mutable

/** Driver-side table-dependency graph algorithms (reference: utils.py:6-141).
  * These order TABLES for flushing, never rows — they stay on the driver
  * regardless of data scale.
  */
object GraphUtils {

  /** Kahn's algorithm with alphabetic tie-break for determinism
    * (utils.py:6-54). `edges(child) = parents the child depends on`;
    * parents sort first.
    */
  def topologicalSort(nodes: Set[String], deps: Map[String, Set[String]]): Seq[String] = {
    val remaining = mutable.SortedSet.empty[String] ++ nodes
    val pending = mutable.Map.empty[String, mutable.Set[String]]
    nodes.foreach { n =>
      pending(n) = mutable.Set.empty ++ deps.getOrElse(n, Set.empty).intersect(nodes)
    }
    val out = mutable.ArrayBuffer.empty[String]
    while (remaining.nonEmpty) {
      val ready = remaining.filter(n => pending(n).isEmpty)
      if (ready.isEmpty)
        throw new IllegalStateException(
          s"dependency cycle among tables: ${remaining.mkString(", ")}")
      val n = ready.head // SortedSet → alphabetic tie-break
      out += n
      remaining -= n
      pending.values.foreach(_ -= n)
    }
    out.toSeq
  }

  /** Weakly-connected components, deterministically ordered by smallest
    * member (utils.py:57-141). Used to scope flush/evict cycles.
    */
  def weaklyConnectedComponents(
      nodes: Set[String], deps: Map[String, Set[String]]): Seq[Set[String]] = {
    val adj = mutable.Map.empty[String, mutable.Set[String]]
    nodes.foreach(n => adj(n) = mutable.Set.empty)
    deps.foreach { case (child, parents) =>
      parents.intersect(nodes).foreach { p =>
        if (nodes.contains(child)) { adj(child) += p; adj(p) += child }
      }
    }
    val seen = mutable.Set.empty[String]
    val comps = mutable.ArrayBuffer.empty[Set[String]]
    nodes.toSeq.sorted.foreach { start =>
      if (!seen.contains(start)) {
        val comp = mutable.Set.empty[String]
        val stack = mutable.Stack(start)
        while (stack.nonEmpty) {
          val n = stack.pop()
          if (!seen.contains(n)) {
            seen += n; comp += n
            adj(n).foreach(m => if (!seen.contains(m)) stack.push(m))
          }
        }
        comps += comp.toSet
      }
    }
    comps.toSeq.sortBy(_.min)
  }
}
