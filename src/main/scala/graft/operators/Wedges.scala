package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-oriented two-hop wedge enumeration — the skew-proof
  * alternative to the naive mid-node adjacency self-join (Σdeg² ordered
  * pairs, all keyed on the mid node, one hub melts its partition).
  *
  * Orientation (the triangle-counting trick of Chiba–Nishizeki '85 /
  * Suri–Vassilvitskii WWW'11, pointed at wedges): each undirected edge
  * points from its lower (deg, id) endpoint to the higher. Under that
  * order out-degree is O(√m), so every wedge {p, center, q} lands in
  * exactly ONE of three equi-joins, once:
  *   - out–out: both edges leave the center — the join is on the center
  *     but out-degree is O(√m), skew-proof regardless of hub degree;
  *   - directed 2-path a→b→c: fan is indeg·outdeg ≤ indeg·O(√m);
  *   - in–in: both edges enter the center — C(indeg, 2) pairs, which is
  *     exactly the intrinsic answer mass (no exact algorithm emits less).
  * Halves total fan-out vs the naive join and bounds two of the three
  * joins independently of hub degree.
  *
  * Shared by [[graft.queries.Warehouse]] q138 (census-selected path) and
  * `ScaleProbe`'s warehouse probe — one kernel, so a tie-break or join
  * fix propagates to both by construction. */
object Wedges {

  /** The symmetric two-hop pair relation of an undirected graph: for
    * every wedge p–center–q emits BOTH (p, q) and (q, p), as columns
    * (a, b). Self-pairs p = q are never produced (orientation makes the
    * three cases' endpoints distinct); 1-hop neighbors are NOT included
    * — union the symmetric edge relation in if reach wants them.
    *
    * `adj`: one row per undirected edge as (u, v) with u < v.
    * `deg`: (a, deg) — the symmetric degree of every endpoint.
    * `deg` is localCheckpointed here (consumed by two joins); pass it
    * raw. */
  def orientedTwoHop(adj: DataFrame, deg: DataFrame): DataFrame = {
    val dc = deg.select(col("a"), col("deg")).localCheckpoint(false)
    val ori = adj
      .join(dc.select(col("a").as("u"), col("deg").as("du")), Seq("u"))
      .join(dc.select(col("a").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("x"), col("v").as("y")))
          .otherwise(struct(col("v").as("x"), col("u").as("y"))).as("e"))
      .select(col("e.x").as("a"), col("e.y").as("b"))
      .localCheckpoint(false) // consumed by all three wedge cases
    val outOut = ori.join(ori.select(col("a"), col("b").as("c")), Seq("a"))
      .filter(col("b") < col("c"))
      .select(col("b").as("p"), col("c").as("q"))
    val dirPath = ori // a→b→c: ord(a) < ord(b) < ord(c) ⇒ endpoints differ
      .join(ori.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .select(col("a").as("p"), col("c").as("q"))
    val inIn = ori.select(col("b").as("m"), col("a").as("p"))
      .join(ori.select(col("b").as("m"), col("a").as("q")), Seq("m"))
      .filter(col("p") < col("q"))
      .select(col("p"), col("q"))
    val wedges = outOut.unionAll(dirPath).unionAll(inIn)
    wedges.select(col("p").as("a"), col("q").as("b"))
      .unionAll(wedges.select(col("q").as("a"), col("p").as("b")))
  }
}
