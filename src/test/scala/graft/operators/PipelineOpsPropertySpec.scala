package graft.operators

import graft.SparkSpec
import graft.functions.VocabOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the training-pipeline operators: invariants that
  * must hold for ANY corpus, not just the oracle instance. Each property
  * runs a modest number of Spark jobs, so minSuccessful is kept small —
  * the point is randomized shapes (skew, empty groups, singleton classes),
  * not volume.
  */
class PipelineOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  test("MixtureSample: picked mass never exceeds budget; picked set is a priority prefix") {
    val gen = for {
      n <- Gen.choose(1, 80)
      toks <- Gen.listOfN(n, Gen.choose(1L, 50L))
      nGroups <- Gen.choose(1, 4)
      budget <- Gen.choose(0L, 400L)
    } yield (toks, nGroups, budget)
    check(Prop.forAll(gen) { case (toks, nGroups, budget) =>
      val rows = toks.zipWithIndex.map { case (t, i) =>
        (i.toLong, s"g${i % nGroups}", t, (i.toLong * 48271L + 11L) % 2147483648L)
      }.toDF("id", "grp", "ntok", "prio")
      val budgets = (0 until nGroups).map(g => (s"g$g", budget)).toDF("grp", "budget")
      val out = MixtureSample.tokenBudgetSample(rows, "grp", "ntok", "prio", budgets, "grp", "budget")
        .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("ntok"),
          r.getAs[Long]("prio"), r.getAs[Boolean]("picked")))
      out.groupBy(_._1).forall { case (_, g) =>
        val pickedMass = g.filter(_._4).map(_._2).sum
        // prefix property: every picked row's priority precedes every
        // unpicked row's priority... except rows AFTER the boundary that
        // would individually still fit are NOT reconsidered (strict prefix)
        val maxPicked = g.filter(_._4).map(_._3).maxOption.getOrElse(Long.MinValue)
        val minUnpicked = g.filterNot(_._4).map(_._3).minOption.getOrElse(Long.MaxValue)
        pickedMass <= budget && maxPicked < minUnpicked
      }
    })
  }

  test("TrainShuffle: positions are a dense 1..n permutation per shard for any id set") {
    val gen = for {
      ids <- Gen.nonEmptyListOf(Gen.choose(0L, 1000000L)).map(_.distinct)
      shards <- Gen.choose(1, 6)
      seed <- Gen.choose(0L, 100000L)
    } yield (ids, shards, seed)
    check(Prop.forAll(gen) { case (ids, shards, seed) =>
      val out = TrainShuffle.shuffleShards(ids.toDF("id"), "id", shards, seed)
        .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      val dense = out.groupBy(_._1).forall { case (_, g) =>
        g.map(_._2).sorted.toSeq == (1L to g.length).toSeq
      }
      dense && out.length == ids.length
    })
  }

  test("VocabOps: selected mass always covers the basis-point target exactly-greedily") {
    val gen = for {
      nWords <- Gen.choose(1, 40)
      counts <- Gen.listOfN(nWords, Gen.choose(1, 30))
      bp <- Gen.oneOf(0, 2500, 8000, 9500, 10000)
    } yield (counts, bp)
    check(Prop.forAll(gen) { case (counts, bp) =>
      val tokens = counts.zipWithIndex.flatMap { case (c, i) => Seq.fill(c)(s"w$i") }
        .toDF("word")
      val out = VocabOps.coverageVocab(tokens, "word", bp)
        .collect().map(r => (r.getLong(1), r.getBoolean(2)))
      val total = out.map(_._1).sum
      val target = (total * bp + 9999) / 10000
      val selMass = out.filter(_._2).map(_._1).sum
      // covers the target, and greedily: dropping the smallest selected
      // word's count must fall below the target (minimality up to the
      // class-granular greedy rule)
      val minSel = out.filter(_._2).map(_._1).minOption.getOrElse(0L)
      selMass >= target && (selMass == 0 || selMass - minSel < target)
    })
  }

  test("connectedComponents == union-find on arbitrary random graphs") {
    def refCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val gen = for {
      n <- Gen.choose(2, 60)          // node-id space
      m <- Gen.choose(1, 120)         // edge count
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield es.filter(e => e._1 != e._2)
    check(Prop.forAll(gen) { es =>
      es.isEmpty || {
        val out = graft.functions.GraphOps
          .connectedComponents(es.toDF("src", "dst"), "src", "dst")
          .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
        out == refCC(es)
      }
    })
  }

  test("bpeEncode: pieces respell the word and match the LTR reference for any merges") {
    def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
      var syms = word.map(_.toString)
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.Buffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toIndexedSeq
      }
      syms
    }
    val sym = Gen.oneOf("a", "b", "c")
    val gen = for {
      words <- Gen.listOfN(20, Gen.choose(1, 8)
        .flatMap(k => Gen.listOfN(k, sym).map(_.mkString))).map(_.distinct)
      nm <- Gen.choose(1, 4)
      merges <- Gen.listOfN(nm, Gen.zip(
        Gen.oneOf("a", "b", "c", "ab", "bc"), Gen.oneOf("a", "b", "c", "ca")))
    } yield (words, merges.filter { case (l, r) => l != r })
    check(Prop.forAll(gen) { case (words, merges) =>
      words.isEmpty || merges.isEmpty || {
        val m = merges.zipWithIndex.map { case ((l, r), i) => (i + 1, l, r) }
          .toDF("step", "lhs", "rhs")
        val out = VocabOps.bpeEncode(words.toDF("word"), "word", m)
          .collect().map(r => r.getAs[String]("word") -> r.getSeq[String](1)).toMap
        words.forall { w =>
          out(w) == refEncode(w, merges) && out(w).mkString == w
        }
      }
    })
  }
}
