package graft

import graft.search.Search
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-6 operators — the invariants the row oracle
  * can't see: overlap handling and plan shape for the positional-index
  * phrase search, and edge semantics of the new curation ops. */
class Round6Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- phrase search -------------------------------------------------

  private def phraseDocs = Seq(
    (1L, "a b a b a b"),        // overlapping "a b a" at 0 and 2
    (2L, "a a b a"),            // "a b a" once at position 1
    (3L, "b a b"),              // no match ("a b a" needs a at p, b, a)
    (4L, "x y z"),              // no phrase terms at all
  ).toDF("doc_id", "text")

  test("phraseSearch counts overlapping occurrences at exact positions") {
    val r = Search.phraseSearch(phraseDocs, "doc_id", "text", Seq("a", "b", "a"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((1L, 2L, 0L), (2L, 1L, 1L)),
      s"got ${r.toSeq}")
  }

  test("phraseSearch single-term phrase degenerates to token match") {
    val r = Search.phraseSearch(phraseDocs, "doc_id", "text", Seq("b"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((1L, 3L, 1L), (2L, 1L, 2L), (3L, 2L, 0L)))
  }

  test("phraseSearch filters postings to phrase terms before any join") {
    // the scan side of each join must be a filtered posting list, so
    // no full-corpus generator output crosses a shuffle unfiltered —
    // asserted STRUCTURALLY (collected Filter/Join nodes), not by
    // substring-matching the plan rendering
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val q = Search.phraseSearch(phraseDocs, "doc_id", "text", Seq("a", "b"))
    val optimized = q.queryExecution.optimizedPlan
    // every join is an equi-join with a condition — no cross product
    val joins = optimized.collect { case j: Join => j }
    assert(joins.nonEmpty && joins.forall(_.condition.isDefined),
      s"every join needs a condition:\n$optimized")
    // both phrase terms appear as tok = <literal> equality filters
    val tokLiterals = optimized.collect { case f: Filter =>
      f.condition.collect {
        case EqualTo(a: AttributeReference, Literal(v, _)) if a.name == "tok" =>
          String.valueOf(v)
        case EqualTo(Literal(v, _), a: AttributeReference) if a.name == "tok" =>
          String.valueOf(v)
      }
    }.flatten.toSet
    assert(Set("a", "b").subsetOf(tokLiterals),
      s"each phrase term must filter a posting scan, got $tokLiterals:\n$optimized")
  }
}
