package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate Neighborhood Function by FLAJOLET-MARTIN REGISTER
  * MERGING along edges (Palmer/Gibbons/Faloutsos, "ANF: a fast and
  * scalable tool for data mining in massive graphs", KDD'02) — the
  * 100 TB path for N(d) at d ≫ 2 that exact pair materialization
  * (Σdegᵈ candidate explosion) structurally cannot walk.
  *
  * Every node carries k FM registers: register j starts with ONE bit
  * set at position ρ(h(node, j)) where ρ is the index of the lowest
  * set bit of a deterministic 64-bit hash — bit i fires with
  * probability 2^-(i+1). One SUPERSTEP ORs every node's registers
  * with its neighbors': after d supersteps register j of node v is
  * exactly the union of the initial registers of every node within d
  * hops, so the index of its lowest ZERO bit estimates log₂ of the
  * d-neighborhood size. The estimate is 2^(mean lowest-zero index
  * over the k trials) / 0.77351 (the FM bias constant); standard
  * error ≈ 0.78/√k of log₂N.
  *
  * LAYOUT: the k registers ride as k BIGINT COLUMNS of one row per
  * node, not k rows — a superstep is then ONE edges⋈registers
  * equi-join plus one node-keyed aggregate of k codegen'd `bit_or`s,
  * shuffling edge-scaled ROWS once (the row-per-trial layout this
  * replaced shuffled k× the rows for the same bytes and ran the
  * aggregate k× wider). d supersteps cost d such passes regardless of
  * how large the d-hop neighborhoods grow — the exact form's cost IS
  * the neighborhoods. Registers are localCheckpointed per superstep
  * by the caller (the q287 frontier discipline) so lineage stays
  * flat. Everything is deterministic — xxhash64 seeds the registers,
  * so two runs agree bitwise; only the final 2^x/0.77351 goes through
  * doubles.
  */
object AnfSketch {

  /** FM bias correction (Flajolet & Martin 1985: E[2^R] ≈ φ·n). */
  private val Phi = 0.77351

  private def maskCols(k: Int): Seq[String] = (0 until k).map(j => s"m$j")

  /** Initial registers: one row per node, k one-bit masks. ρ comes
    * from the lowest set bit L = h & −h (log₂ of a power of two is
    * exact in doubles); h = 0 and the sign bit map to the 62 cap —
    * probability 2⁻⁶³ events that must not crash or flip signs. */
  def initRegisters(nodes: DataFrame, k: Int): DataFrame =
    nodes
      .select(
        col("node") +: (0 until k).map(j => xxhash64(col("node"), lit(j)).as(s"h$j")): _*
      )
      .select(
        col("node") +: (0 until k).map { j =>
          expr(
            s"""shiftleft(1L, CASE
                  WHEN h$j = 0 THEN 62
                  WHEN (h$j & -h$j) < 0 THEN 62
                  ELSE CAST(log2(CAST(h$j & -h$j AS DOUBLE)) AS INT)
                END)"""
          ).as(s"m$j")
        }: _*
      )

  /** One superstep: every node ORs its registers with its neighbors'.
    * `edges` must already contain both directions for an undirected
    * reach. One edge-scaled shuffle on node. */
  def superstep(regs: DataFrame, edges: DataFrame): DataFrame = {
    val k = regs.columns.count(_.startsWith("m"))
    val ms: Seq[Column] = maskCols(k).map(col)
    regs
      .unionByName(
        regs
          .join(edges, regs("node") === edges("src"))
          .select(edges("dst").as("node") +: ms: _*)
      )
      .groupBy("node")
      .agg(
        expr(s"bit_or(m0)").as("m0"),
        maskCols(k).drop(1).map(m => expr(s"bit_or($m)").as(m)): _*
      )
  }

  /** Per-node neighborhood-size estimate from the current registers:
    * lowest-zero-bit index per trial, averaged, debiased. Output
    * columns: node, est (double). Pure projection — no shuffle. */
  def estimate(regs: DataFrame): DataFrame = {
    val k = regs.columns.count(_.startsWith("m"))
    // saturation: initRegisters caps the bit index at 62, so a fully
    // saturated register is Long.MaxValue (bits 0..62), for which
    // (~m)&(m+1) is Long.MinValue — log2 of a negative is NULL, which
    // would silently NULL the node's whole estimate. The lowest zero
    // bit of that register is 63; -1 (bit 63 somehow set too) caps at
    // 64. Both are 2⁻⁶³-probability guards that must degrade to the
    // cap, never to NULL.
    val bSum = maskCols(k)
      .map(m =>
        s"""(CASE WHEN $m = -1 THEN 64
                  WHEN $m = ${Long.MaxValue}L THEN 63
                  ELSE CAST(log2(CAST((~$m) & ($m + 1) AS DOUBLE)) AS INT) END)"""
      )
      .mkString(" + ")
    regs.select(
      col("node"),
      (pow(lit(2.0), expr(bSum).cast("double") / lit(k)) / lit(Phi)).as("est")
    )
  }
}
