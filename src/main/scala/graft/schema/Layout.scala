package graft.schema

/** Entity layout facts shared across stages (reference:
  * `bronze_funcs.py:10-19`, `generate_asset_silver.py:22-45`,
  * `generate_bond_info_silver.py:22-36`,
  * `generate_deal_details_silver.py:24-30`).
  */
object Layout {

  /** Row-identity columns per entity (`bronze_funcs.py:10-14`). */
  val primaryCols: Map[String, Seq[String]] = Map(
    "assets" -> Seq("AL1", "AL2"),
    "bond_info" -> Seq("BL1", "BL2"),
    "deal_details" -> Seq("ed_code", "PoolCutOffDate"),
  )

  /** Forced name of the first CSV header cell (`bronze_funcs.py:16-19`). */
  val initialCol: Map[String, String] = Map(
    "assets" -> "AL1",
    "bond_info" -> "BL1",
  )

  /** Amortisation tapes are truncated to the first 121 columns
    * (`bronze_funcs.py:83-86`). */
  val amortisationMaxCols = 121

  /** SCD2 bookkeeping columns added in bronze (`bronze_funcs.py:129-141`). */
  val scd2Cols: Seq[String] = Seq("valid_from", "valid_to", "iscurrent", "checksum")

  /** Vertical topic partitioning of the asset tape
    * (`generate_asset_silver.py:30-44`): AL index ranges per topic
    * table; primaries are ed_code, part, AL1..AL5. */
  val assetTopics: Seq[(String, Range)] = Seq(
    "lease_info" -> (6 until 50),
    "lease_features" -> (50 until 74),
    "interest_rate" -> (74 until 83),
    "financial_info" -> (83 until 98),
    "performance_info" -> (98 until 133),
    "collateral_info" -> (133 until 154),
  )
  val assetPrimaryRange: Range = 1 until 6

  /** Bond topic split (`generate_bond_info_silver.py:30-35`);
    * primaries are ed_code, part, BL1, BL2. */
  val bondTopics: Seq[(String, Range)] = Seq(
    "bond_info" -> (3 until 19),
    "transaction_info" -> (19 until 25),
    "tranche_info" -> (25 until 51),
  )

  def assetPrimaries(cols: Seq[String]): Seq[String] =
    Seq("ed_code", "part") ++ assetPrimaryRange.map(i => s"AL$i").filter(cols.contains)

  def bondPrimaries(cols: Seq[String]): Seq[String] =
    Seq("ed_code", "part", "BL1", "BL2").filter(c =>
      cols.contains(c) || c == "ed_code" || c == "part")

  def topicCols(prefix: String, r: Range, cols: Seq[String]): Seq[String] =
    r.map(i => s"$prefix$i").filter(cols.contains)
}
