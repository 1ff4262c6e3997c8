package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ExactCols.{hmodJvm, P}
import graft.queries.Dedup

/** Pins the q24/q115/q206 oracle chain (`cappedPairCtes` — clone
  * collapse, 256-member clone-group cap, 256-rep band-bucket cap,
  * rep-level LSH, exact jaccard, expansion) against the REAL
  * [[Dedup.nearDupPairs]] front door on corpora where both caps
  * genuinely FIRE — the r10 lesson ("every 'cap is a no-op at gate
  * sf' comment is a latent sf failure") turned into a test. The
  * replay below is a line-for-line JVM transliteration of the oracle
  * SQL (hmodJvm ≡ the md5-15-hex hash both engines share), so
  * Spark ≡ replay here plus oracle-SQL ≡ replay by construction
  * gives Spark ≡ oracle in the cap-firing regime the gate sfs never
  * reach. */
class CappedOracleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val CAP = Dedup.LshConfig().maxBucketSize // 256
  private val NH = 8
  private val BANDS = 4

  private def toks(t: String): Vector[String] =
    t.split(" ", -1).filter(_.nonEmpty).toVector

  /** JVM replay of the capped, clone-collapsed oracle CTE chain. */
  private def replay(docs: Seq[(Long, String)]): Set[(Long, Long, Double)] = {
    val shingleable = docs.filter { case (_, t) => toks(t).size >= 3 }
    val gidOf: Map[Long, Long] = shingleable.groupBy(_._2).iterator.flatMap {
      case (_, ds) =>
        val g = ds.map(_._1).min
        ds.map(d => d._1 -> g)
    }.toMap
    val members: Map[Long, Seq[Long]] = gidOf.toSeq.groupBy(_._2)
      .map { case (g, ms) => g -> ms.map(_._1).sorted.take(CAP) }
    val sh: Map[Long, Set[String]] = shingleable
      .filter { case (id, _) => gidOf(id) == id }
      .map { case (id, t) =>
        id -> toks(t).sliding(3).map(_.mkString(" ")).toSet
      }.toMap
    val mh: Map[Long, Vector[Long]] = sh.map { case (id, ss) =>
      id -> (0 until NH).map { j =>
        ss.iterator.map(s => ((2L * j + 1) * hmodJvm(s) + (j.toLong * j + 7)) % P).min
      }.toVector
    }
    val bands = mh.toSeq.flatMap { case (id, m) =>
      (0 until BANDS).map(b => (b, s"${m(2 * b)}_${m(2 * b + 1)}", id))
    }
    val cand = bands.groupBy(x => (x._1, x._2)).values.flatMap { g =>
      val ids = g.map(_._3).sorted.take(CAP) // band-bucket cap, keep-lowest
      for (i <- ids.indices; k <- i + 1 until ids.size) yield (ids(i), ids(k))
    }.toSet
    val rp = cand.flatMap { case (a, b) =>
      val j = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      if (j >= 0.5) Some((a, b, j)) else None
    }
    val cross = rp.flatMap { case (ga, gb, j) =>
      for (xa <- members(ga); xb <- members(gb))
        yield (math.min(xa, xb), math.max(xa, xb), j)
    }
    val intra = members.values.flatMap { ms =>
      for (i <- ms.indices; k <- i + 1 until ms.size) yield (ms(i), ms(k), 1.0)
    }
    (cross ++ intra).toSet
  }

  private def sparkPairs(df: DataFrame): Set[(Long, Long, Double)] =
    Dedup.nearDupPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("band-bucket cap fires: 300 distinct texts, identical shingles") {
    // trailing spaces make the TEXTS distinct (300 singleton clone
    // groups) while the token streams — hence shingles, minhash, band
    // signatures — are identical: all 300 reps land in ONE bucket per
    // band and the 256 cap genuinely truncates.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows = (0L until 300L).map(i => (i, base + " " * (i.toInt + 1)))
    val got = sparkPairs(df(rows))
    val want = replay(rows)
    assert(got == want)
    // the cap fired: 256·255/2 pairs, not 300·299/2
    assert(got.size == 256 * 255 / 2)
    assert(got.size < 300 * 299 / 2)
    // deterministic keep-lowest: every surviving id is < 256
    assert(got.forall { case (a, b, _) => a < 256 && b < 256 })
  }

  test("clone-member cap fires: 300 exact clones of one text") {
    val base = "one two three four five six seven eight nine ten"
    val rows = (0L until 300L).map(i => (i, base))
    val got = sparkPairs(df(rows))
    val want = replay(rows)
    assert(got == want)
    assert(got.size == 256 * 255 / 2) // intra only, capped
    assert(got.forall { case (a, b, j) => a < 256 && b < 256 && j == 1.0 })
  }

  test("image route: both caps fire and bound the pair surface") {
    // the q117 oracle's cap replay, evidenced on the Spark side where
    // the caps genuinely fire. 300 exact clones → ONE clone group →
    // member cap keeps the 256 lowest ids, intra = C(256,2) at
    // hamming 0 (no rep pair: a single rep). 300 whitespace variants
    // (distinct texts, identical tokens ⇒ identical aHash) → every
    // block bucket holds 300 reps → block cap keeps the 256 lowest,
    // rp = C(256,2) at hamming 0, each gid a singleton.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def pairs(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
      import spark.implicits._
      graft.queries.Media.imageNearDupPairs(rows.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val clones = pairs((0L until 300L).map(i => (i, base)))
    assert(clones.size == 256 * 255 / 2)
    assert(clones.forall { case (a, b, h) => a < 256 && b < 256 && h == 0L })
    val variants = pairs((0L until 300L).map(i => (i, base + " " * (i.toInt + 1))))
    assert(variants.size == 256 * 255 / 2)
    assert(variants.forall { case (a, b, h) => a < 256 && b < 256 && h == 0L })
  }

  test("cross expansion through clone groups matches the replay") {
    // two DISTINCT-text clone groups with identical token streams
    // (trailing space) — guaranteed band collision, so the rep-pair →
    // member-expansion path provably executes; plus an unrelated doc
    val a = "the quick brown fox jumps over the lazy dog today"
    val rows = (0L until 5L).map(i => (i, a)) ++
      (10L until 15L).map(i => (i, a + " ")) ++
      Seq((20L, "entirely unrelated content about spark catalyst plans"))
    val got = sparkPairs(df(rows))
    val want = replay(rows)
    assert(got == want)
    // cross pairs span the two groups; intra pairs fill each group
    assert(got.count { case (x, y, _) => x < 5 && y >= 10 } == 25)
    assert(got.size == 25 + 2 * (5 * 4 / 2))
  }
}
