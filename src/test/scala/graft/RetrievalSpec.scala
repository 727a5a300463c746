package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, VectorOps}

/** Hybrid RRF fusion over the real sf0.001 fixture: the fused score
  * must be exactly the integer-grid RRF of the emitted component
  * ranks, the vector component must agree with knnExact, ranking must
  * be dense per query with the documented tiebreak, and both
  * single-system and dual-system hits must occur (the fusion is
  * genuinely combining two lists, not echoing one).
  */
class RetrievalSpec extends SparkSpec {

  private val grid = 1099511627776L

  test("hybridRrf: score is the exact integer-grid RRF of the emitted ranks") {
    val rows = Retrieval.hybridRrf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lex = if (r.isNullAt(4)) None else Some(r.getLong(4))
      val vec = if (r.isNullAt(5)) None else Some(r.getLong(5))
      val want = lex.map(x => grid / (Retrieval.RrfK + x)).getOrElse(0L) +
        vec.map(x => grid / (Retrieval.RrfK + x)).getOrElse(0L)
      assert(r.getLong(3) === want, s"row $r")
      assert(lex.nonEmpty || vec.nonEmpty, s"row $r has no source rank")
    }
  }

  test("hybridRrf: vector components agree with knnExact; ranking is dense and tiebroken") {
    val rows = Retrieval.hybridRrf(spark, sfDir).collect()
    val exact = VectorOps.knnExact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.filterNot(_.isNullAt(5)).foreach { r =>
      assert(exact((r.getLong(0), r.getLong(2))) === r.getLong(5), s"row $r")
    }
    // per query: ranks dense 1..n, ordered by (score desc, doc_id asc)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to rs.length).toSeq, s"query $q")
      val key = sorted.map(r => (-r.getLong(3), r.getLong(2))).toSeq
      assert(key === key.sorted, s"query $q order")
      assert(rs.length <= Retrieval.RrfTopK)
    }
    // fusion genuinely merges: hits from one system only AND from both
    assert(rows.exists(r => !r.isNullAt(4) && !r.isNullAt(5)))
    assert(rows.exists(r => r.isNullAt(4) ^ r.isNullAt(5)))
    // the lexical self-hit is excluded
    assert(!rows.exists(r => r.getLong(0) == r.getLong(2)))
  }

  test("clusterCards: per-cluster top terms come from member docs, jlh-ordered") {
    val cards = Retrieval.clusterCards(spark, sfDir).collect()
    assert(cards.nonEmpty)
    val members = VectorOps.ivfAssign(spark, sfDir).collect()
      .map(r => r.getLong(0) -> s"cluster_${r.getAs[Int]("assigned_label")}")
    val clusterOf = members.toMap
    // every assigned cluster that has any non-null-text member emits cards
    cards.groupBy(_.getString(0)).foreach { case (cl, rs) =>
      assert(members.exists(_._2 == cl), s"unknown cluster $cl")
      assert(rs.length <= graft.operators.TextOps.SigTermsTopK)
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to rs.length).toSeq)
      val key = sorted.map(r => (-r.getDouble(5), r.getString(2))).toSeq
      assert(key === key.sorted, s"cluster $cl order")
    }
    // each card's term occurs in at least one member doc of its cluster
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    cards.foreach { r =>
      val cl = r.getString(0); val term = r.getString(2)
      val hit = docs.exists { case (id, text) =>
        clusterOf.get(id).contains(cl) && text.split(" ").contains(term)
      }
      assert(hit, s"term '$term' not found in cluster $cl members")
    }
  }
}
