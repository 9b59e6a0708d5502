package graft

import org.apache.spark.sql.functions._

/** Scale rehearsal for the round-12 widening operators — the
  * GuardRehearse discipline pointed at the two new ops whose cost
  * grows with a GRAPH, not a table: measure a deterministic synthetic
  * series and record the exponents in BASELINE.md.
  *
  * Modes:
  *  - `pagerank <n>` — [[graft.operators.Analytics.pageRank]] over a
  *    deterministic multiplicative-hash graph with 10·n edges, n
  *    nodes, one 1%-degree hub (the skew a dup graph actually has);
  *    10 iterations; reports edges/sec and the hub's final rank.
  *  - `assoc <n>` — [[graft.operators.Analytics.associationRules]]
  *    over n baskets × ~8 items from a 100k item space with a planted
  *    hot pair in every 16th basket; minSupport scales with n so the
  *    rule relation stays output-bounded.
  * Prints one JSON line per run. */
object WideningRehearse {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: WideningRehearse <mode> <n>")
    val (mode, n) = (args(0), args(1).toLong)
    val spark = GraftSession.forMain(s"graft-widening-rehearse-$mode")
    import graft.operators.Analytics
    mode match {
      case "pagerank" =>
        val m = 10L * n
        // multiplicative-hash endpoints; every 100th edge hits node 0
        val edges = spark.range(m).select(
          (col("id") % n).as("a"),
          when(col("id") % 100 === 0, lit(0L))
            .otherwise((col("id") * 2654435761L) % n).as("b"))
        val nodes = spark.range(n).select(col("id"))
        val ((hub, total), sec) = time {
          val r = Analytics.pageRank(edges, nodes, "id", iters = 10)
          val agg = r.agg(sum(col("rank_micro")).as("t"),
            max(when(col("id") === 0L, col("rank_micro"))).as("h"))
            .head()
          (agg.getLong(1), agg.getLong(0))
        }
        println(f"""{"mode":"pagerank","n_nodes":$n,"n_edges":$m,""" +
          f""""sec":$sec%.3f,"edges_per_sec":${(10 * m / sec).toLong},""" +
          f""""hub_rank_micro":$hub,"total_mass_micro":$total}""")
      case "assoc" =>
        // ~8 items per basket; hot pair (1,2) planted in every 16th
        val rows = spark.range(n * 8).select(
          expr("id div 8").as("bk"),
          when(col("id") % 128 === 0, lit(1L))
            .when(col("id") % 128 === 1, lit(2L))
            .otherwise((col("id") * 2654435761L) % 100000L).as("it"))
        val minSupport = math.max(2L, n / 1000L)
        val ((rules, hot), sec) = time {
          val r = Analytics.associationRules(rows, "bk", "it", minSupport)
          val agg = r.agg(count(lit(1)).as("n"),
            max(when(col("item_a") === 1L && col("item_b") === 2L,
              col("n_ab"))).as("hot"))
            .head()
          (agg.getLong(0), if (agg.isNullAt(1)) -1L else agg.getLong(1))
        }
        println(f"""{"mode":"assoc","n_baskets":$n,"min_support":""" +
          f"""$minSupport,"sec":$sec%.3f,"n_rules":$rules,""" +
          f""""hot_pair_support":$hot}""")
      case "pagerank_dense" =>
        // round-13 ask #5: edges ∝ N with a PLANTED NEAR-CLIQUE emitted
        // the way the census actually receives one — through the K206
        // degree cap (each family member chains to its 16 rank
        // successors), so the rehearsal measures the operator on the
        // graph shape the guards guarantee, not a fantasy clique
        val family = math.max(16L, n / 100L) // 1% of nodes, one dup family
        val bg = spark.range(5L * n).select(
          (col("id") % n).as("a"),
          ((col("id") * 2654435761L) % n).as("b"))
        val capped = spark.range(family * 16L).select(
          expr("id div 16").as("m"), (col("id") % 16L + 1L).as("k"))
          .filter(expr("m + k") < family)
          .select(col("m").as("a"), expr("m + k").as("b"))
        val edges = bg.unionByName(capped).filter(col("a") =!= col("b"))
        val nodes = spark.range(n).select(col("id"))
        val ((fam, total), sec) = time {
          val r = Analytics.pageRank(edges, nodes, "id", iters = 10)
          val agg = r.agg(sum(col("rank_micro")).as("t"),
            sum(when(col("id") < family, col("rank_micro"))).as("f"))
            .head()
          (agg.getLong(1), agg.getLong(0))
        }
        val m = 5L * n + family * 16L
        println(f"""{"mode":"pagerank_dense","n_nodes":$n,""" +
          f""""n_edges":$m,"family":$family,"sec":$sec%.3f,""" +
          f""""edges_per_sec":${(10 * m / sec).toLong},""" +
          f""""family_mass_micro":$fam,"total_mass_micro":$total}""")
      case "assoc_capped" =>
        // basket-cap BINDING: every 1000th basket is a 500-item crawler
        // cart (over the 100 cap -> dropped pre-join); the hot pair
        // stays planted in normal baskets so the output is asserted
        val normal = spark.range(n * 8).select(
          expr("id div 8").as("bk"),
          when(col("id") % 128 === 0, lit(1L))
            .when(col("id") % 128 === 1, lit(2L))
            .otherwise((col("id") * 2654435761L) % 100000L).as("it"))
        val giants = spark.range((n / 1000L + 1L) * 500L).select(
          (expr("id div 500") * 1000L + n).as("bk"),
          (col("id") % 500L + 200000L).as("it"))
        val rows = normal.unionByName(giants)
        val minSupport = math.max(2L, n / 1000L)
        val ((rules, giantLeak), sec) = time {
          val r = Analytics.associationRules(rows, "bk", "it", minSupport)
          val agg = r.agg(count(lit(1)).as("n"),
            count(when(col("item_a") >= 200000L, 1)).as("g")).head()
          (agg.getLong(0), agg.getLong(1))
        }
        println(f"""{"mode":"assoc_capped","n_baskets":$n,""" +
          f""""min_support":$minSupport,"sec":$sec%.3f,""" +
          f""""n_rules":$rules,"giant_basket_rules":$giantLeak}""")
      case "triples_capped" =>
        // q263 under the same binding cap: giant baskets dropped, the
        // planted triple (1,2,3) in every 32nd basket must survive
        val normal = spark.range(n * 8).select(
          expr("id div 8").as("bk"),
          when(col("id") % 256 === 0, lit(1L))
            .when(col("id") % 256 === 1, lit(2L))
            .when(col("id") % 256 === 2, lit(3L))
            .otherwise((col("id") * 2654435761L) % 100000L).as("it"))
        val giants = spark.range((n / 1000L + 1L) * 500L).select(
          (expr("id div 500") * 1000L + n).as("bk"),
          (col("id") % 500L + 200000L).as("it"))
        val rows = normal.unionByName(giants)
        val minSupport = math.max(2L, n / 1000L)
        val ((triples, hot), sec) = time {
          val r = Analytics.frequentTriples(rows, "bk", "it", minSupport)
          val agg = r.agg(count(lit(1)).as("n"),
            max(when(col("item_a") === 1L && col("item_b") === 2L &&
              col("item_c") === 3L, col("n_abc"))).as("hot")).head()
          (agg.getLong(0), if (agg.isNullAt(1)) -1L else agg.getLong(1))
        }
        println(f"""{"mode":"triples_capped","n_baskets":$n,""" +
          f""""min_support":$minSupport,"sec":$sec%.3f,""" +
          f""""n_triples":$triples,"hot_triple_support":$hot}""")
      case "bootstrap" =>
        // q252 at fan-out: B=32 Poisson replicates over n rows × 8
        // groups — the exchange carries (group, b) partials only
        val rows = spark.range(n).select(
          (col("id") % 8).cast("string").as("g"),
          col("id").as("rid"),
          ((col("id") * 2654435761L) % 1000L).cast("double").as("v"))
        val (nOut, sec) = time {
          Analytics.bootstrapCi(rows, "g", "rid", col("v"), reps = 32)
            .count()
        }
        println(f"""{"mode":"bootstrap","n_rows":$n,"reps":32,""" +
          f""""sec":$sec%.3f,"rows_per_sec":${(n / sec).toLong},""" +
          f""""n_groups_out":$nOut}""")
      case "sketch" =>
        // keyed relation with a planted mega-bucket: 1% of rows share
        // one key, the rest spread over n/10 keys — the band-relation
        // shape the pair-budget guard scans
        val rows = spark.range(n).select(
          when(col("id") % 100 === 0, lit(-1L))
            .otherwise((col("id") * 2654435761L) % (n / 10)).as("k"))
          .localCheckpoint(true,
            org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val (exact, exactSec) = time {
          rows.groupBy(col("k")).agg(count(lit(1)).as("c"))
            .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)))
            .head().getLong(0)
        }
        val (est, skSec) = time {
          graft.operators.TextDedup
            .pairEstimateSketchHashed(rows,
              pmod(col("k") * 2654435761L, lit(2147483647L)))
            .head().getLong(2)
        }
        val err = math.abs(est - exact) * 1000000L / math.max(exact, 1L)
        println(f"""{"mode":"sketch","n_rows":$n,"pairs_exact":$exact,""" +
          f""""pairs_est":$est,"err_ppm":$err,"exact_sec":$exactSec%.3f,""" +
          f""""sketch_sec":$skSec%.3f}""")
      case "bt" =>
        // q277/q278 at corpus scale: n matches over 256 items with a
        // Zipf-ish winner skew — the corpus rolls up ONCE to the
        // ≤ items² pair relation; the 4 MM rounds price items, not
        // matches, so the exponent should read ~linear-in-n scan cost
        val items = 256L
        val matches = spark.range(n).select(
          // winner biased low, loser uniform, never equal
          (pmod(col("id") * 2654435761L, lit(items * items)) / items)
            .cast("long").as("wRaw"),
          pmod(col("id") * 40503L, lit(items)).as("lRaw"))
          .select(
            least(col("wRaw") % items, pmod(col("wRaw"), lit(17L)) * 15L)
              .cast("string").as("w"),
            col("lRaw").cast("string").as("l"))
          .filter(col("w") =!= col("l"))
        val ((nItems, topW), sec) = time {
          val r = graft.operators.Analytics
            .bradleyTerry(matches, "w", "l", iters = 4)
          val agg = r.agg(count(lit(1)), max(col("strength_micro"))).head()
          (agg.getLong(0), agg.getLong(1))
        }
        val (nPairs, wrSec) = time {
          graft.operators.Analytics.winRateMatrix(matches, "w", "l").count()
        }
        println(f"""{"mode":"bt","n_matches":$n,"n_items":$nItems,""" +
          f""""sec":$sec%.3f,"matches_per_sec":${(n / sec).toLong},""" +
          f""""top_strength_micro":$topW,"winrate_pairs":$nPairs,""" +
          f""""winrate_sec":$wrSec%.3f}""")
      case other => sys.error(s"unknown mode: $other")
    }
    spark.stop()
  }
}
