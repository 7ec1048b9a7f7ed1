package graft.ingest

import java.time.{Clock, LocalDate, ZoneId}

/** Trading-day resolution (SURVEY.md §2.1 S2; reference
  * `dags/lib/eod_data_downloader.py:26-31,45,84-88`): walk back up to
  * `lookbackDays` calendar days from "today in America/New_York" and take
  * the first day for which the source reports data.
  *
  * The data probe is injected (`hasData`) because the engine does not do
  * network IO: in this repo it is "does the bronze path for that date
  * contain files" or "does the synthetic generator have rows"; in a live
  * deployment it would wrap the REST call. A probe that THROWS counts as
  * no-data-continue, mirroring the reference's request-failure handling
  * (`eod_data_downloader.py:39-42`).
  */
object TradingDay {

  val ExchangeTz: ZoneId = ZoneId.of("America/New_York")
  val DefaultLookbackDays = 10

  /** Today as the exchange sees it (clock injectable for tests). */
  def todayInExchangeTz(clock: Clock = Clock.system(ExchangeTz)): LocalDate =
    LocalDate.now(clock.withZone(ExchangeTz))

  /** First day in [today, today−1, …, today−lookback+1] with data, or
    * None when the whole window is dry (the reference fails the run). */
  def resolve(today: LocalDate, lookbackDays: Int = DefaultLookbackDays)
             (hasData: LocalDate => Boolean): Option[LocalDate] =
    (0 until lookbackDays).iterator
      .map(today.minusDays(_))
      .find(d => try hasData(d) catch { case _: Exception => false })
}
