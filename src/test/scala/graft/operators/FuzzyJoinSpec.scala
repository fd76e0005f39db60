package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, max}
import graft.SparkSpec

class FuzzyJoinSpec extends AnyFunSuite with SparkSpec {

  private def pairs(values: Seq[String]): Set[(String, String, Long)] = {
    val sess = spark
    import sess.implicits._
    FuzzyJoin
      .editDistance1Pairs(values.toDF("v"), "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
  }

  /** Driver-side brute force with a plain-Scala Levenshtein. */
  private def reference(values: Seq[String]): Set[(String, String, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        )
      d(a.length)(b.length)
    }
    val distinct = values.distinct
    (for {
      x <- distinct; y <- distinct
      if x < y && lev(x, y) <= 1
    } yield (x, y, lev(x, y).toLong)).toSet
  }

  test("finds substitution, insertion, and deletion pairs; skips distance 2") {
    val vs = Seq("cat", "bat", "cart", "ca", "dog", "dig", "dg", "xyz", "kitten")
    assert(pairs(vs) == reference(vs))
    assert(pairs(vs).contains(("bat", "cat", 1L))) // substitution
    assert(pairs(vs).contains(("cart", "cat", 1L))) // insertion (code order)
    assert(pairs(vs).contains(("ca", "cat", 1L))) // deletion
    assert(!pairs(vs).exists { case (a, b, _) => Set(a, b) == Set("cart", "ca") }) // distance 2
  }

  test("repeated characters: coinciding deletion keys still yield one pair") {
    val vs = Seq("aaa", "aa", "aab", "ab")
    assert(pairs(vs) == reference(vs))
  }

  test("matches brute force on a randomized near-collision pool") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(40)(rnd.alphanumeric.take(6).mkString)
    val mutated = base.map { s =>
      val i = rnd.nextInt(s.length)
      s.updated(i, ('a' + rnd.nextInt(26)).toChar)
    }
    val vs = base ++ mutated
    assert(pairs(vs) == reference(vs))
  }

  test("identical strings are deduplicated, not self-paired") {
    assert(pairs(Seq("same", "same", "same")) == Set.empty)
  }

  test("empty input and empty strings are handled") {
    assert(pairs(Seq.empty) == Set.empty)
    // "" pairs with every 1-char string (one insertion)
    assert(pairs(Seq("", "a", "b", "xy")) == reference(Seq("", "a", "b", "xy")))
  }

  test("depth-2: matches brute force at distance <= 2, including unicode") {
    val sess = spark
    import sess.implicits._
    def cpLev(a: String, b: String): Int = {
      val x = a.codePoints().toArray; val y = b.codePoints().toArray
      val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1)
        )
      d(x.length)(y.length)
    }
    val rnd = new scala.util.Random(13)
    val base = Seq.fill(30)(rnd.alphanumeric.take(7).mkString)
    val twoEdits = base.map { s =>
      val (i, j) = (rnd.nextInt(s.length), rnd.nextInt(s.length))
      s.updated(i, ('a' + rnd.nextInt(26)).toChar).updated(j, ('a' + rnd.nextInt(26)).toChar)
    }
    val vs = (base ++ twoEdits ++ Seq("ab", "ba", "🦀ab", "ab🦀", "café", "cage")).distinct
    val got = FuzzyJoin
      .editDistancePairs(vs.toDF("v"), "v", maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = (for {
      a <- vs; b <- vs
      if a < b && cpLev(a, b) <= 2
    } yield (a, b, cpLev(a, b).toLong)).toSet
    assert(got == want)
    assert(got.contains(("ab", "ba", 2L))) // transposition = 2 edits, shares depth-2 keys
  }

  test("maxKeyDf is a no-op when every key is under the cap") {
    val sess = spark
    import sess.implicits._
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(40)(rnd.alphanumeric.take(6).mkString)
    val vs = base ++ base.map { s =>
      val i = rnd.nextInt(s.length)
      s.updated(i, ('a' + rnd.nextInt(26)).toChar)
    }
    val df = vs.toDF("v")
    val capped = FuzzyJoin
      .editDistance1Pairs(df, "v", maxKeyDf = Some(50))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(capped == pairs(vs))
    assert(capped == reference(vs))
  }

  test("maxKeyDf bounds a 10^4-string hot deletion key and keeps cold-key pairs exact") {
    val sess = spark
    import sess.implicits._
    // Skew fixture: every hot string is `core` with ONE char inserted.
    // core cycles 'a'..'j' (no repeated runs), insert chars are CJK —
    // disjoint alphabets, so any two hot strings share EXACTLY one
    // deletion key: core itself (deleting the insert from each). That
    // one key has multiplicity 10^4 — the uncapped self-join would
    // expand C(10^4, 2) ≈ 5·10^7 candidates and verify each with a
    // 60-char levenshtein; the cap drops the key before the join.
    val core = (0 until 60).map(i => ('a' + i % 10).toChar).mkString
    val hot = for {
      p <- 0 to core.length // 61 insert positions
      c <- (0 until 165).map(i => (0x4e00 + i).toChar) // 165 insert chars
    } yield core.substring(0, p) + c + core.substring(p)
    assert(hot.size == 10065 && hot.distinct.size == hot.size)
    // Planted cold-key pairs: each base+digit pair shares only its own
    // df=2 deletion key, far under the cap — these must survive intact.
    val planted = Seq("zebraQ", "quartz", "marble", "copper", "silver")
      .flatMap(b => Seq(b + "1", b + "2"))
    val df = (hot ++ planted).toDF("v")

    // the cap's structural guarantee: after pruning, no key's
    // multiplicity exceeds the cap, so candidates per key ≤ C(cap, 2)
    val names = df.select(col("v").cast("string").as("name")).distinct()
    val dfs = FuzzyJoin
      .deletionNeighborhood(names)
      .groupBy("k")
      .count()
    assert(dfs.agg(max("count")).head.getLong(0) == hot.size.toLong) // core key is hot
    assert(
      dfs.filter(col("count") <= 50).agg(max("count")).head.getLong(0) <= 2L
    ) // every cold key in this fixture has df ≤ 2

    val got = FuzzyJoin
      .editDistance1Pairs(df, "v", maxKeyDf = Some(50))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val wantPlanted = Seq("zebraQ", "quartz", "marble", "copper", "silver")
      .map(b => (b + "1", b + "2", 1L))
      .toSet
    // cold-key pairs exact; hot-key-only pairs (same-position insert
    // substitutions, whose ONLY shared key is core) are the documented
    // miss the cap trades for boundedness
    assert(got == wantPlanted)
  }

  test("unicode: deletion keys and levenshtein both count CODE POINTS, astral plane included") {
    // 🦀 is a surrogate pair in UTF-16: a char-based deletion would
    // split it and a char-based distance would count it as 2 edits;
    // Spark's substring/length/levenshtein are all code-point based,
    // so the blocking and the verify must agree on that unit
    def cpLev(a: String, b: String): Int = {
      val x = a.codePoints().toArray; val y = b.codePoints().toArray
      val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1)
        )
      d(x.length)(y.length)
    }
    val vs = Seq("café", "cafe", "caf", "🦀ab", "🦀b", "ab", "xé", "xz")
    val want = (for {
      a <- vs.distinct; b <- vs.distinct
      if a < b && cpLev(a, b) <= 1
    } yield (a, b, cpLev(a, b).toLong)).toSet
    assert(pairs(vs) == want)
    // the astral-plane pair is present iff both units are code points
    assert(pairs(vs).contains(("🦀ab", "🦀b", 1L)))
  }
}
