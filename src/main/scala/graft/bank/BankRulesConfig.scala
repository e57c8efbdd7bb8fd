package graft.bank

import graft.rules.{Pred, RuleConfig, RuleSetConfig}
import graft.rules.Pred._

/** The full [[BankRules]] rule set as CONFIG — the data form a tester
  * edits without a recompile, mirroring how the reference drives its
  * scenarios from dicts (DM_bankfile_validate_pipeline.py:3113).
  *
  * Every rule here compiles (via [[graft.rules.RuleConfig.toRule]])
  * through the same [[graft.rules.Checks]] combinators the hand-written
  * [[BankRules]] uses, so the Column trees — and therefore the error
  * files — are identical; BankRulesConfigSpec pins name-for-name,
  * row-for-row parity on generated data with injected invalids, plus a
  * JSON round trip of the whole set. This file is the shipped default
  * config; `RuleSetConfig.fromJson` loads a customized copy.
  */
object BankRulesConfig {

  private val isMDP: Pred = InLit("OrganizationCode", Seq("M", "D", "P"))
  private val isDP: Pred = InLit("OrganizationCode", Seq("D", "P"))
  private val isR: Pred = Cmp("eq", "OrganizationCode", "R")
  private val isEft: Pred = Cmp("eq", "PaymentMode", "EFT")
  private val isChk: Pred = Cmp("eq", "PaymentMode", "CHK")

  private val nameExtra = "-&.,'() "

  val recordOperation: Seq[RuleConfig] = Seq(
    RuleConfig("RecordOperation.required", "RecordOperation is required",
      check("required", "RecordOperation")),
    RuleConfig("RecordOperation.enum", "RecordOperation must be A or D",
      inSet("RecordOperation", "A", "D")))

  val organizationCode: Seq[RuleConfig] = Seq(
    RuleConfig("OrganizationCode.required", "OrganizationCode is required",
      check("required", "OrganizationCode")),
    RuleConfig("OrganizationCode.enum", "OrganizationCode must be one of M, D, P, R",
      inSet("OrganizationCode", "M", "D", "P", "R")))

  val payee: Seq[RuleConfig] = Seq(
    RuleConfig("PayeeID.required", "PayeeID is required",
      check("required", "PayeeID")),
    RuleConfig("PayeeID.length", "PayeeID must be 2-9 characters",
      or(withN("maxLength", "PayeeID", 9), withN("minLength", "PayeeID", 2))),
    RuleConfig("PayeeID.charset", "PayeeID must be alphanumeric",
      check("alnum", "PayeeID")),
    RuleConfig("PayeeID.matchesOrgIdentifier",
      "PayeeID must equal OrganizationIdentifier for M, D and P records",
      and(check("present", "PayeeID"), check("present", "OrganizationIdentifier"),
        ColCmp("ne", "PayeeID", "OrganizationIdentifier")),
      when = Some(isMDP)),
    RuleConfig("OrganizationIdentifier.required", "OrganizationIdentifier is required",
      check("required", "OrganizationIdentifier")),
    RuleConfig("OrganizationIdentifier.length",
      "OrganizationIdentifier must be 3-12 characters",
      or(withN("maxLength", "OrganizationIdentifier", 12),
        withN("minLength", "OrganizationIdentifier", 3))),
    RuleConfig("OrganizationIdentifier.charset",
      "OrganizationIdentifier must be alphanumeric",
      check("alnum", "OrganizationIdentifier")),
    RuleConfig("OrganizationIdentifier.rFormat",
      "OrganizationIdentifier must be a 10-digit identifier for R records",
      withS("matches", "OrganizationIdentifier", "^[1-9][0-9]{9}$"),
      when = Some(isR)))

  val organization: Seq[RuleConfig] = Seq(
    RuleConfig("OrganizationName.required", "OrganizationName is required",
      check("required", "OrganizationName")),
    RuleConfig("OrganizationName.maxLength", "OrganizationName exceeds 40 characters",
      withN("maxLength", "OrganizationName", 40)),
    RuleConfig("OrganizationName.charset", "OrganizationName contains invalid characters",
      withS("charsetOnly", "OrganizationName", nameExtra)),
    RuleConfig("OrganizationLegalName.maxLength",
      "OrganizationLegalName exceeds 40 characters",
      withN("maxLength", "OrganizationLegalName", 40)),
    RuleConfig("OrganizationLegalName.charset",
      "OrganizationLegalName contains invalid characters",
      withS("charsetOnly", "OrganizationLegalName", nameExtra)),
    RuleConfig("OrganizationTIN.required",
      "OrganizationTIN is required for M, D and P records",
      check("required", "OrganizationTIN"), when = Some(isMDP)),
    RuleConfig("OrganizationTIN.format", "OrganizationTIN must be 9 digits",
      withN("digits", "OrganizationTIN", 9)),
    RuleConfig("OrganizationTIN.blankForR", "OrganizationTIN must be blank for R records",
      check("mustBeBlank", "OrganizationTIN"), when = Some(isR)),
    RuleConfig("OrganizationTINType.required",
      "OrganizationTINType is required for M, D and P records",
      check("required", "OrganizationTINType"), when = Some(isMDP)),
    RuleConfig("OrganizationTINType.enum", "Invalid OrganizationTinType for non-R records",
      inSet("OrganizationTINType", "EIN", "SSN")),
    RuleConfig("OrganizationTINType.blankForR",
      "OrganizationTINType must be blank for R records",
      check("mustBeBlank", "OrganizationTINType"), when = Some(isR)),
    RuleConfig("ProfitNonprofit.required",
      "ProfitNonprofit is required for D and P records",
      check("required", "ProfitNonprofit"), when = Some(isDP)),
    RuleConfig("ProfitNonprofit.enum", "ProfitNonprofit must be P or NP",
      inSet("ProfitNonprofit", "P", "NP")),
    RuleConfig("OrganizationNPI.format", "OrganizationNPI must be 10 digits",
      withS("matches", "OrganizationNPI", "^[1-9][0-9]{9}$")))

  val payment: Seq[RuleConfig] = Seq(
    RuleConfig("PaymentMode.required", "PaymentMode is required for M, D and P records",
      check("required", "PaymentMode"), when = Some(isMDP)),
    RuleConfig("PaymentMode.enum", "PaymentMode must be EFT or CHK",
      inSet("PaymentMode", "EFT", "CHK")),
    RuleConfig("PaymentMode.mRequiresEft", "PaymentMode must be EFT for M records",
      and(check("present", "PaymentMode"), Cmp("ne", "PaymentMode", "EFT")),
      when = Some(Cmp("eq", "OrganizationCode", "M"))))

  val banking: Seq[RuleConfig] = Seq(
    RuleConfig("RoutingTransitNumber.requiredEft",
      "RoutingTransitNumber is required for M, D and P records with payment type as EFT",
      check("required", "RoutingTransitNumber"), when = Some(and(isMDP, isEft))),
    RuleConfig("RoutingTransitNumber.format", "RoutingTransitNumber must be 9 digits",
      withN("digits", "RoutingTransitNumber", 9)),
    RuleConfig("AccountNumber.requiredEft",
      "AccountNumber is required for M, D and P records with payment type as EFT",
      check("required", "AccountNumber"), when = Some(and(isMDP, isEft))),
    RuleConfig("AccountNumber.format", "AccountNumber must be 1-17 digits",
      or(check("numeric", "AccountNumber"), withN("maxLength", "AccountNumber", 17))),
    RuleConfig("AccountType.requiredEft",
      "AccountType is required for M, D and P records with payment type as EFT",
      check("required", "AccountType"), when = Some(and(isMDP, isEft))),
    RuleConfig("AccountType.enum", "AccountType must be CHKING or SAVING",
      inSet("AccountType", "CHKING", "SAVING")),
    RuleConfig("RoutingTransitNumber.blankChk",
      "RoutingTransitNumber must be blank, For PaymentMode CHK",
      check("mustBeBlank", "RoutingTransitNumber"), when = Some(isChk)),
    RuleConfig("AccountNumber.blankChk",
      "AccountNumber must be blank, For PaymentMode CHK",
      check("mustBeBlank", "AccountNumber"), when = Some(isChk)),
    RuleConfig("AccountType.blankChk",
      "AccountType must be blank, For PaymentMode CHK",
      check("mustBeBlank", "AccountType"), when = Some(isChk)),
    RuleConfig("R.bankingAddressBlank",
      "For OrgCode R, all banking/address fields must be completely blank",
      Or(Seq("RoutingTransitNumber", "AccountNumber", "AccountType", "AddressCode",
        "AddressLine1", "AddressLine2", "CityName", "State", "PostalCode",
        "ContactFirstName", "ContactLastName").map(f => check("present", f))),
      when = Some(isR)))

  val dates: Seq[RuleConfig] = Seq(
    RuleConfig("EffectiveStartDate.required", "EffectiveStartDate is required",
      check("required", "EffectiveStartDate")),
    RuleConfig("EffectiveStartDate.format",
      "EffectiveStartDate must be a valid YYYY-MM-DD date",
      check("dateYmd", "EffectiveStartDate")),
    RuleConfig("EffectiveEndDate.format",
      "EffectiveEndDate must be a valid YYYY-MM-DD date",
      check("dateYmd", "EffectiveEndDate")),
    RuleConfig("EffectiveEndDate.afterStart",
      "EffectiveEndDate must not be before EffectiveStartDate",
      and(check("present", "EffectiveEndDate"), check("present", "EffectiveStartDate"),
        DateCmp("lt", "EffectiveEndDate", "EffectiveStartDate"))),
    RuleConfig("EffectiveEndDate.requiredDeactivated",
      "EffectiveEndDate should be provided for deactivated records",
      check("required", "EffectiveEndDate"),
      when = Some(Cmp("eq", "RecordOperation", "D"))))

  val address: Seq[RuleConfig] = Seq(
    RuleConfig("AddressCode.enum", "AddressCode must be PMT or COR",
      inSet("AddressCode", "PMT", "COR")),
    RuleConfig("AddressCode.requiredDP", "AddressCode is required for D and P records",
      check("required", "AddressCode"), when = Some(isDP)),
    RuleConfig("AddressLine1.maxLength", "AddressLine1 exceeds 40 characters",
      withN("maxLength", "AddressLine1", 40)),
    RuleConfig("AddressLine1.charset", "AddressLine1 contains invalid characters",
      withS("charsetOnly", "AddressLine1", nameExtra + "/#")),
    RuleConfig("AddressLine2.maxLength", "AddressLine2 exceeds 40 characters",
      withN("maxLength", "AddressLine2", 40)),
    RuleConfig("AddressLine2.charset", "AddressLine2 contains invalid characters",
      withS("charsetOnly", "AddressLine2", nameExtra + "/#")),
    RuleConfig("CityName.maxLength", "CityName exceeds 25 characters",
      withN("maxLength", "CityName", 25)),
    RuleConfig("CityName.charset", "CityName contains invalid characters",
      check("nameFormat", "CityName")),
    RuleConfig("State.format", "State must be a 2-letter uppercase code",
      withN("upperCode", "State", 2)),
    RuleConfig("PostalCode.format", "PostalCode must be 5 digits or ZIP+4",
      withS("matches", "PostalCode", "^[0-9]{5}(-[0-9]{4})?$")))

  val contact: Seq[RuleConfig] = Seq(
    RuleConfig("ContactCode.enum", "ContactCode must be AO or DO",
      inSet("ContactCode", "AO", "DO")),
    RuleConfig("ContactFirstName.maxLength", "ContactFirstName exceeds 20 characters",
      withN("maxLength", "ContactFirstName", 20)),
    RuleConfig("ContactFirstName.charset", "ContactFirstName contains invalid characters",
      check("nameFormat", "ContactFirstName")),
    RuleConfig("ContactLastName.maxLength", "ContactLastName exceeds 25 characters",
      withN("maxLength", "ContactLastName", 25)),
    RuleConfig("ContactLastName.charset", "ContactLastName contains invalid characters",
      check("nameFormat", "ContactLastName")),
    RuleConfig("ContactTitle.maxLength", "ContactTitle exceeds 23 characters",
      withN("maxLength", "ContactTitle", 23)),
    RuleConfig("ContactPhone.maxLength", "ContactPhone exceeds 25 characters",
      withN("maxLength", "ContactPhone", 25)),
    RuleConfig("ContactPhone.format", "ContactPhone has invalid format",
      check("phone", "ContactPhone")),
    RuleConfig("ContactFax.maxLength", "ContactFax exceeds 25 characters",
      withN("maxLength", "ContactFax", 25)),
    RuleConfig("ContactFax.format", "ContactFax has invalid format",
      check("phone", "ContactFax")),
    RuleConfig("ContactOtherPhone.maxLength", "ContactOtherPhone exceeds 25 characters",
      withN("maxLength", "ContactOtherPhone", 25)),
    RuleConfig("ContactOtherPhone.format", "ContactOtherPhone has invalid format",
      check("phone", "ContactOtherPhone")),
    RuleConfig("ContactEmail.maxLength", "ContactEmail exceeds 99 characters",
      withN("maxLength", "ContactEmail", 99)),
    RuleConfig("ContactEmail.format", "ContactEmail has invalid format",
      check("email", "ContactEmail")))

  /** The complete configurable set, declaration order = [[BankRules.all]]. */
  val all: RuleSetConfig = RuleSetConfig(
    recordOperation ++ organizationCode ++ payee ++ organization ++ payment ++
      banking ++ dates ++ address ++ contact)
}
