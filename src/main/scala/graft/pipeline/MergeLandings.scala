package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Harmonize

/** The merge-landings entry point (SURVEY §3-adjacent,
  * `/root/reference/R/merge-landings.R:36-163`): the three survey
  * generations are version-tagged and union'd by name (missing columns
  * → null, J14), then `merge_versions` unifies the columns that drifted
  * across Kobo form revisions — coalesce chains over the slash-named
  * raw columns, a free-text fallback for the "why no fishing" answer,
  * and the drop list. Everything is a single wide projection: no
  * shuffle, codegen'd, schema-drift handled at plan time.
  */
object MergeLandings {

  /** Version-tag and union the three preprocessed generations
    * (`merge-landings.R:90-105`). */
  def tagAndUnion(v1: DataFrame, v2: DataFrame, v3: DataFrame): DataFrame =
    Harmonize.unionByNameAll(Seq(
      v1.withColumn("survey_version", lit("v1")),
      v2.withColumn("survey_version", lit("v2")),
      v3.withColumn("survey_version", lit("v3"))))

  /** `merge_versions` (`merge-landings.R:124-163`). Column names are
    * the reference's raw Kobo paths (slashes and Tetum text included) —
    * they are data, not identifiers, so no renaming happens before the
    * unification the reference prescribes. */
  def mergeVersions(df: DataFrame): DataFrame =
    df
      .withColumn("fuel_L", coalesce(
        col("`trip_group/Total_litru_mina_hir_e_ebe_gastu_ba_peska`"),
        col("`trip_group/fuel_used_L`")))
      .withColumn("habitat_no_boat", substring(coalesce(
        col("`trip_group/habitat_no_boat`"),
        col("`trip_group/Habitat_no_boat`")), 1, 1))
      .withColumn("trip_group/habitat_boat", coalesce(
        col("`trip_group/habitat_boat`"), col("habitat_no_boat")))
      .withColumn("reason_no_fishing",
        when(col("`Tanba_sa_la_iha_ro_o_peskador_`") === "seluk__hakerek",
          col("`Seluk_hakerek_manualmente`"))
          .otherwise(col("`Tanba_sa_la_iha_ro_o_peskador_`")))
      .withColumn("reason_no_activity",
        coalesce(col("reason_for_zero_boats"), col("reason_no_fishing")))
      .withColumnRenamed("trip_group/habitat_boat", "trip_group/habitat")
      .drop("habitat_no_boat",
        "trip_group/Total_litru_mina_hir_e_ebe_gastu_ba_peska",
        "trip_group/fuel_used_L",
        "trip_group/habitat_no_boat",
        "trip_group/Habitat_no_boat",
        "Tanba_sa_la_iha_ro_o_peskador_",
        "Seluk_hakerek_manualmente",
        "reason_for_zero_boats",
        "reason_no_fishing",
        "_bamboo_dataset_id") // all-NA in every generation (reference note)
}
