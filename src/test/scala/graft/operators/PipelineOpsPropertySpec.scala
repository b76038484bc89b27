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
}
