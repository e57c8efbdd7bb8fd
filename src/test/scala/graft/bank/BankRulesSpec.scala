package graft.bank

import graft.SparkSpec
import graft.validate.Validator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replays the reference's invalid-value injection scenarios against
  * BankRules (tests/test_* in /root/reference encode the expected
  * verdicts; we assert the same field mutations trigger the same
  * rules). */
class BankRulesSpec extends SparkSpec {

  // cache() doubles as a plan barrier — without it every errorsFor call
  // re-inlines the generator expressions into all ~68 rules (slow
  // Catalyst compile); with it the rules see a flat InMemoryRelation.
  private lazy val base20: DataFrame =
    BankDataGen.generate(spark, 20, seed = 11).cache()

  private def gen(n: Long = 20): DataFrame =
    if (n == 20) base20 else BankDataGen.generate(spark, n, seed = 11).cache()

  private def errorsFor(df: DataFrame): Map[Long, Seq[String]] = {
    import spark.implicits._
    Validator.validate(df, BankRules.all)
      .select(col("id"), col(Validator.ErrorsCol))
      .as[(Long, Seq[String])].collect().toMap
  }

  test("generated data is fully valid") {
    val v = Validator.validate(gen(500), BankRules.all)
    assert(v.where(!col(Validator.ValidCol)).count() == 0)
  }

  test("blank AccountNumber with EFT context is rejected (test_accountnumber_blank_eft_required)") {
    val df = BankDataGen.withInvalid(
      BankDataGen.withInvalid(gen(), "PaymentMode", "EFT"),
      "AccountNumber", "")
    val errs = errorsFor(df)
    assert(errs.values.forall(_.contains(
      "AccountNumber is required for M, D and P records with payment type as EFT")))
  }

  test("lowercase/special AccountType values rejected (test_accounttype_value_rules_eft_combined)") {
    val base = BankDataGen.withInvalid(gen(), "PaymentMode", "EFT")
    for (bad <- Seq("checking", "savings", "$%$%$%$%", "CHECK")) {
      val errs = errorsFor(BankDataGen.withInvalid(base, "AccountType", bad, Seq(0L)))
      assert(errs(0L).contains("AccountType must be CHKING or SAVING"), s"value: $bad")
    }
  }

  test("CHK payment mode requires blank banking fields (test_chk_banking_fields_should_be_blank_combined)") {
    val df = BankDataGen.withInvalid(
      BankDataGen.withInvalid(gen(), "PaymentMode", "CHK", Seq(1L)),
      "RoutingTransitNumber", "123456789", Seq(1L))
    val errs = errorsFor(df)
    assert(errs(1L).exists(_.startsWith("RoutingTransitNumber must be blank")))
  }

  test("RoutingTransitNumber format violations (test_routingnumber_invalid_characters, _leading ok)") {
    val base = BankDataGen.withInvalid(gen(), "PaymentMode", "EFT")
    val bad = errorsFor(BankDataGen.withInvalid(base, "RoutingTransitNumber", "12345ABCD", Seq(0L)))
    assert(bad(0L).contains("RoutingTransitNumber must be 9 digits"))
    // leading zeros are 9 digits — format rule passes
    val zeros = errorsFor(BankDataGen.withInvalid(base, "RoutingTransitNumber", "000000001", Seq(0L)))
    assert(!zeros(0L).contains("RoutingTransitNumber must be 9 digits"))
  }

  test("TIN/TINType/ProfitNonprofit rules (test_organization_tin_profit_rules_combined)") {
    val errs = errorsFor(Seq(
      ("OrganizationTIN", "12#456789", "OrganizationTIN must be 9 digits"),
      ("OrganizationTINType", "@#$", "Invalid OrganizationTinType for non-R records"),
      ("OrganizationTINType", "XZXZ", "Invalid OrganizationTinType for non-R records"),
      ("ProfitNonprofit", "FVGHJK", "ProfitNonprofit must be P or NP"))
      .zipWithIndex
      .foldLeft(gen()) { case (df, ((c, v, _), i)) =>
        BankDataGen.withInvalid(df, c, v, Seq(i.toLong)) })
    assert(errs(0L).contains("OrganizationTIN must be 9 digits"))
    assert(errs(1L).contains("Invalid OrganizationTinType for non-R records"))
    assert(errs(2L).contains("Invalid OrganizationTinType for non-R records"))
    assert(errs(3L).contains("ProfitNonprofit must be P or NP"))
  }

  test("NPI must be 10 digits, first nonzero (test_organizationnpi_*)") {
    val errs = errorsFor(
      BankDataGen.withInvalid(
        BankDataGen.withInvalid(gen(), "OrganizationNPI", "12@3456789", Seq(0L)),
        "OrganizationNPI", "5", Seq(1L)))
    assert(errs(0L).contains("OrganizationNPI must be 10 digits"))
    assert(errs(1L).contains("OrganizationNPI must be 10 digits"))
  }

  test("contact over-max-length and numeric-name rules (test_contact_fields_over_max_length_dp_combined)") {
    val errs = errorsFor(Seq(
      ("ContactFirstName", "ContactFirstNameExceedingMaximumAllowedLengthValue"),
      ("ContactLastName", "ContactLastNameExceedingAllowedMaximumLengthValue"),
      ("ContactTitle", "ContactTitleExceedingMaximumAllowedLength"),
      ("ContactPhone", "123ABC4567"),
      ("ContactEmail", ("a" * 95) + "@example.com"))
      .zipWithIndex
      .foldLeft(gen()) { case (df, ((c, v), i)) =>
        BankDataGen.withInvalid(df, c, v, Seq(i.toLong)) })
    assert(errs(0L).contains("ContactFirstName exceeds 20 characters"))
    assert(errs(1L).contains("ContactLastName exceeds 25 characters"))
    assert(errs(2L).contains("ContactTitle exceeds 23 characters"))
    assert(errs(3L).contains("ContactPhone has invalid format"))
    assert(errs(4L).contains("ContactEmail exceeds 99 characters"))
  }

  test("numeric contact names rejected (test_contactfirstname_invalid_numeric)") {
    val errs = errorsFor(BankDataGen.withInvalid(gen(), "ContactFirstName", "12345", Seq(0L)))
    assert(errs(0L).contains("ContactFirstName contains invalid characters"))
  }

  test("date rules: format, order, deactivated-needs-end (test_effective*date_*)") {
    val base = gen()
    val badFmt = errorsFor(BankDataGen.withInvalid(base, "EffectiveStartDate", "2026/01/01", Seq(0L)))
    assert(badFmt(0L).contains("EffectiveStartDate must be a valid YYYY-MM-DD date"))
    val badCal = errorsFor(BankDataGen.withInvalid(base, "EffectiveEndDate", "2026-02-31", Seq(0L)))
    assert(badCal(0L).contains("EffectiveEndDate must be a valid YYYY-MM-DD date"))
    val before = errorsFor(BankDataGen.withInvalid(base, "EffectiveEndDate", "2020-01-01", Seq(0L)))
    assert(before(0L).contains("EffectiveEndDate must not be before EffectiveStartDate"))
  }

  test("address/state/postal rules (test_address_location_formatting_rules_combined)") {
    val errs = errorsFor(Seq(
      ("AddressCode", "***"), ("CityName", "City!"), ("State", "C1"),
      ("PostalCode", "12#45"), ("AddressCode", "COXE"))
      .zipWithIndex
      .foldLeft(gen()) { case (df, ((c, v), i)) =>
        BankDataGen.withInvalid(df, c, v, Seq(i.toLong)) })
    assert(errs(0L).contains("AddressCode must be PMT or COR"))
    assert(errs(1L).contains("CityName contains invalid characters"))
    assert(errs(2L).contains("State must be a 2-letter uppercase code"))
    assert(errs(3L).contains("PostalCode must be 5 digits or ZIP+4"))
    assert(errs(4L).contains("AddressCode must be PMT or COR"))
  }

  test("RecordOperation/OrganizationCode enums (test_recordoperation_invalid_z, organizationcode_invalid_h)") {
    val errs = errorsFor(Seq(
      ("RecordOperation", "Z"), ("RecordOperation", "$"), ("OrganizationCode", "H"))
      .zipWithIndex
      .foldLeft(gen()) { case (df, ((c, v), i)) =>
        BankDataGen.withInvalid(df, c, v, Seq(i.toLong)) })
    assert(errs(0L).contains("RecordOperation must be A or D"))
    assert(errs(1L).contains("RecordOperation must be A or D"))
    assert(errs(2L).contains("OrganizationCode must be one of M, D, P, R"))
  }

  test("PayeeID special chars and length (test_payeeid_invalid_special_char_hash, _over_max_length)") {
    val errs = errorsFor(Seq(
      ("PayeeID", "#$%"), ("PayeeID", "ABCDEFGHIJK"))
      .zipWithIndex
      .foldLeft(gen()) { case (df, ((c, v), i)) =>
        BankDataGen.withInvalid(df, c, v, Seq(i.toLong)) })
    assert(errs(0L).contains("PayeeID must be alphanumeric"))
    assert(errs(1L).contains("PayeeID must be 2-9 characters"))
  }

  test("duplicate PayeeID detection (run_duplicate_payee_id_scenario)") {
    import graft.ops.Dedup
    val df = BankDataGen.withInvalid(gen(), "PayeeID", "DUPKEY1", Seq(0L, 1L))
    val dups = Dedup.duplicateKeys(df, Seq("PayeeID"))
    assert(dups.count() == 1)
  }

  test("blank-as-null generation still validates clean (--blank-as-null flag)") {
    val nulled = BankDataGen.withNullBlanks(gen(50))
    // at least one optional field should actually be null now
    assert(nulled.where(col("EffectiveEndDate").isNull).count() > 0)
    val v = Validator.validate(nulled, BankRules.all)
    assert(v.where(!col(Validator.ValidCol)).count() == 0)
  }

  test("extra columns are detected by the schema gate (--extra-columns flag)") {
    import graft.schema.SchemaCheck
    val extra = BankDataGen.withExtraColumns(gen(), Seq("AuditTag"))
    val report = SchemaCheck.check(BankSchema.schema, extra.drop("id").schema)
    assert(report.extra.map(_.column) == Seq("AuditTag"))
  }

  test("duplicate full-row detection (run_duplicate_row_scenario)") {
    import graft.ops.Dedup
    val df = BankDataGen.withDuplicatedRows(gen(), Seq(3L))
    val dups = Dedup.duplicateRows(df)
    assert(dups.count() == 1)
  }

  test("generator output validates clean across the 100k id boundary and at huge ids") {
    // ids 99_000..101_000 span the old failure point (PayeeID grew a
    // 10th char at id >= 100000); base-36 tail must stay at 9 chars
    val boundary = BankDataGen.generate(spark, 2000, seed = 11, startId = 99000L).cache()
    try {
      assert(boundary.where(length(col("PayeeID")) =!= 9).count() == 0)
      assert(boundary.select("PayeeID").distinct().count() == 2000)
      val v = Validator.validate(boundary, BankRules.all)
      assert(v.where(!col(Validator.ValidCol)).count() == 0)
    } finally { boundary.unpersist(); () }

    // 50e9 > 36^6: a 7-char base-36 tail still fits the 9-char max
    val huge = BankDataGen.generate(spark, 100, seed = 11, startId = 50_000_000_000L).cache()
    try {
      assert(huge.where(length(col("PayeeID")) =!= 9).count() == 0)
      val v = Validator.validate(huge, BankRules.all)
      assert(v.where(!col(Validator.ValidCol)).count() == 0)
    } finally { huge.unpersist(); () }
  }
}
