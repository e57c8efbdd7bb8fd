package graft.bank

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed, seeded synthetic bank-data generator — the Spark-native
  * re-expression of the reference's `BankDataGenerator`
  * (/root/reference/newaugsver_clean.py:84-493).
  *
  * The reference builds rows one-by-one on a single process with
  * stateful RNG + uniqueness sets. That cannot scale; here every field
  * is a pure function of (seed, row id) derived via `xxhash64`, so:
  *   - generation is `spark.range(n)` + one narrow projection
  *     (embarrassingly parallel, any row count, no driver memory),
  *   - the same (seed, id) always yields the same row (resumable,
  *     test-stable),
  *   - uniqueness of PayeeID/OrganizationIdentifier falls out of
  *     deriving them from the globally-unique row id rather than from a
  *     driver-side "used" set (newaugsver_clean.py:233-249's retry loops
  *     are unnecessary when the key space is partitioned by id).
  *
  * Distribution semantics mirror the reference (org codes M/D/P,
  * M ⇒ EFT, CHK ⇒ blank banking, D-operation records usually carry an
  * end date, etc.) so generated data passes [[BankRules.all]].
  */
object BankDataGen {

  /** Uniform pseudo-random double in [0,1) from (seed, id, tag). */
  private def rnd(seed: Long, tag: String): Column =
    (pmod(xxhash64(col("id"), lit(seed), lit(tag)), lit(1000000L)).cast("double") / 1000000.0)

  /** Pick from values with equal probability. */
  private def pick(seed: Long, tag: String, values: Seq[String]): Column = {
    val idx = pmod(xxhash64(col("id"), lit(seed), lit(tag)), lit(values.size.toLong))
    values.zipWithIndex.foldLeft(lit(values.head)) { case (acc, (v, i)) =>
      when(idx === i.toLong, lit(v)).otherwise(acc)
    }
  }

  /** n-digit numeric string, first digit nonzero. */
  private def digitsCol(seed: Long, tag: String, n: Int): Column = {
    val h = abs(xxhash64(col("id"), lit(seed), lit(tag)))
    val span = math.pow(10, n - 1).toLong
    (pmod(h, lit(span * 9L)) + span).cast("string")
  }

  private val firstNames = Seq("James", "Mary", "Robert", "Patricia", "John",
    "Jennifer", "Michael", "Linda", "David", "Elizabeth", "William", "Barbara")
  private val lastNames = Seq("Smith", "Johnson", "Williams", "Brown", "Jones",
    "Garcia", "Miller", "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez")
  private val companies = Seq("Acme Pharma Inc.", "Globex Bio", "Initech Health",
    "Umbrella Labs", "Stark Medical", "Wayne Biotech", "Cyberdyne Care",
    "Tyrell Genomics", "Oscorp Therapeutics", "Vandelay Health")
  private val cities = Seq("Springfield", "Riverton", "Fairview", "Kingsport",
    "Maplewood", "Cedar Falls", "Oakdale", "Brookhaven", "Lakewood", "Ashland")
  private val states = Seq("AL", "CA", "CO", "FL", "GA", "IL", "MA", "NY", "OH",
    "TX", "VA", "WA")
  private val titles = Seq("Director", "Manager", "Analyst", "Controller",
    "Coordinator", "Specialist", "Officer", "Administrator")

  /** Generate `rows` valid bank records. `startId` offsets the id
    * range (ids are `[startId, startId + rows)`), so shards of one
    * logical file can be generated independently and tests can probe
    * high-id behavior directly. */
  def generate(spark: SparkSession, rows: Long, seed: Long = 42L,
               asOfDate: String = "2026-01-15",
               numPartitions: Int = 0, startId: Long = 0L): DataFrame = {
    val base0 = if (numPartitions > 0) spark.range(startId, startId + rows, 1, numPartitions)
                else spark.range(startId, startId + rows)
    val df = base0.toDF("id")

    val oc = pick(seed, "oc", Seq("M", "D", "P"))
    val prefix = when(oc === "M", "MF").when(oc === "D", "DS").otherwise("PC")
    // id-derived base-36 tail keeps PayeeID unique without coordination
    // AND within the 9-char rule max at any scale: 2-char prefix +
    // 7 base-36 chars covers 36^7 ≈ 7.8e10 ids at exactly 9 chars.
    val orgId = concat(prefix, lpad(conv(col("id"), 10, 36), 7, "0"))
    val pm = when(oc === "M", lit("EFT")).otherwise(pick(seed, "pm", Seq("EFT", "CHK")))
    val isEft = pm === "EFT"
    val recOp = pick(seed, "rec", Seq("A", "A", "A", "D"))
    val tinType = pick(seed, "tt", Seq("EIN", "SSN"))
    val startDate = lit(asOfDate)
    val endDate = when(recOp === "D",
        date_format(date_add(to_date(startDate), (rnd(seed, "ed") * 90).cast("int")), "yyyy-MM-dd"))
      .otherwise(
        when(rnd(seed, "ed2") < 0.15,
          date_format(date_add(to_date(startDate), ((rnd(seed, "ed3") * 335) + 30).cast("int")), "yyyy-MM-dd"))
        .otherwise(lit("")))

    df.select(
      col("id"),
      recOp.as("RecordOperation"),
      oc.as("OrganizationCode"),
      orgId.as("PayeeID"),
      orgId.as("OrganizationIdentifier"),
      pick(seed, "on", companies).as("OrganizationName"),
      when(tinType === "EIN", pick(seed, "on", companies))
        .otherwise(concat(pick(seed, "fn", firstNames), lit(" "), pick(seed, "ln", lastNames)))
        .as("OrganizationLegalName"),
      digitsCol(seed, "tin", 9).as("OrganizationTIN"),
      tinType.as("OrganizationTINType"),
      when(oc === "M", pick(seed, "pn0", Seq("", "P", "NP")))
        .otherwise(pick(seed, "pn", Seq("P", "NP"))).as("ProfitNonprofit"),
      when(rnd(seed, "npi0") < 0.2, lit("")).otherwise(digitsCol(seed, "npi", 10))
        .as("OrganizationNPI"),
      pm.as("PaymentMode"),
      when(isEft, digitsCol(seed, "rtn", 9)).otherwise(lit("")).as("RoutingTransitNumber"),
      when(isEft, digitsCol(seed, "acct", 6)).otherwise(lit("")).as("AccountNumber"),
      when(isEft, pick(seed, "at", Seq("CHKING", "SAVING"))).otherwise(lit(""))
        .as("AccountType"),
      startDate.as("EffectiveStartDate"),
      endDate.as("EffectiveEndDate"),
      when(oc === "M", pick(seed, "ac0", Seq("COR", ""))).otherwise(lit("PMT"))
        .as("AddressCode"),
      concat(digitsCol(seed, "a1", 3), lit(" "), pick(seed, "a1n", lastNames), lit(" St"))
        .as("AddressLine1"),
      when(rnd(seed, "a20") < 0.5, concat(lit("Suite "), digitsCol(seed, "a2", 3)))
        .otherwise(lit("")).as("AddressLine2"),
      pick(seed, "city", cities).as("CityName"),
      pick(seed, "st", states).as("State"),
      digitsCol(seed, "zip", 5).as("PostalCode"),
      pick(seed, "cc", Seq("AO", "DO")).as("ContactCode"),
      pick(seed, "cfn", firstNames).as("ContactFirstName"),
      pick(seed, "cln", lastNames).as("ContactLastName"),
      when(oc.isInCollection(Seq("D", "P")) && rnd(seed, "ct0") < 0.7,
        pick(seed, "ct", titles)).otherwise(lit("")).as("ContactTitle"),
      concat(lit("("), digitsCol(seed, "ph1", 3), lit(") "), digitsCol(seed, "ph2", 3),
        lit("-"), digitsCol(seed, "ph3", 4)).as("ContactPhone"),
      when(rnd(seed, "fx0") < 0.5,
        concat(digitsCol(seed, "fx1", 3), lit("-"), digitsCol(seed, "fx2", 3),
          lit("-"), digitsCol(seed, "fx3", 4))).otherwise(lit("")).as("ContactFax"),
      when(rnd(seed, "op0") < 0.5,
        concat(digitsCol(seed, "op1", 3), lit("-"), digitsCol(seed, "op2", 3),
          lit("-"), digitsCol(seed, "op3", 4))).otherwise(lit("")).as("ContactOtherPhone"),
      concat(lower(pick(seed, "em1", firstNames)), lit("."),
        lower(pick(seed, "em2", lastNames)), lit("@example.com")).as("ContactEmail"))
  }

  /** Inject an invalid value into specific rows — the reference's
    * `--invalid-values Col:idx=value` / `Col:value` injection
    * (DM_bankfile_validate_pipeline.py:3113 run_invalid_values_scenario).
    * Requires the `id` column produced by [[generate]]. */
  def withInvalid(df: DataFrame, column: String, value: String,
                  rowIds: Seq[Long] = Nil): DataFrame = {
    val hit = if (rowIds.isEmpty) lit(true) else col("id").isInCollection(rowIds)
    df.withColumn(column, when(hit, lit(value)).otherwise(col(column)))
  }

  /** Duplicate specific rows (run_duplicate_row_scenario :2636). */
  def withDuplicatedRows(df: DataFrame, rowIds: Seq[Long]): DataFrame =
    df.union(df.where(col("id").isInCollection(rowIds)))

  /** Convert empty-string fields to real NULLs — the generator's
    * `--blank-as-null` flag (newaugsver_clean.py:475-479,605). The
    * rule engine treats both identically (Checks.blank). */
  def withNullBlanks(df: DataFrame): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == org.apache.spark.sql.types.StringType)
        d.withColumn(c, when(col(c) === "", lit(null)).otherwise(col(c)))
      else d
    }

  /** Append synthetic extra columns — the `--extra-columns` upload
    * scenario (newaugsver_clean.py save_to_formats :526-528 writes
    * "Extra_<name>_<row>"). SchemaCheck flags them as ExtraColumn. */
  def withExtraColumns(df: DataFrame, names: Seq[String]): DataFrame =
    names.foldLeft(df) { (d, n) =>
      d.withColumn(n, concat(lit(s"Extra_${n}_"), col("id").cast("string")))
    }
}
