package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CMC (century-month-code) date math — the DHS encoding for every date in
  * the corpus (months since January 1900; ref doc/Data_Format.md: dates
  * "appear as coded integers … and CMC-coded columns"). The reference
  * stores these as text and leaves conversion to the user; a warehouse user
  * needs the codec constantly, so the engine ships it as column functions.
  *
  * cmc = (year − 1900) · 12 + month   (month 1..12)
  */
object DhsDates {

  /** CMC integer from year and month columns. */
  def toCmc(year: Column, month: Column): Column =
    ((year - 1900) * 12 + month).cast("int")

  /** Calendar year of a CMC code. */
  def cmcYear(cmc: Column): Column = (lit(1900) + floor((cmc - 1) / 12)).cast("int")

  /** Calendar month (1..12) of a CMC code. */
  def cmcMonth(cmc: Column): Column = (((cmc - 1) % 12) + 1).cast("int")

  /** First day of the CMC month as a date. */
  def cmcToDate(cmc: Column): Column =
    make_date(cmcYear(cmc), cmcMonth(cmc), lit(1))

  /** CMC from a date/timestamp column. */
  def dateToCmc(d: Column): Column = toCmc(year(d), month(d))

  /** Completed age in years at `atCmc` for a birth CMC (the DHS age
    * derivation: floor of elapsed months / 12).
    */
  def ageAtCmc(birthCmc: Column, atCmc: Column): Column =
    floor((atCmc - birthCmc) / 12).cast("int")
}
