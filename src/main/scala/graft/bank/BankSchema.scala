package graft.bank

import org.apache.spark.sql.types._

/** The reference feed's 30-column payee schema
  * (/root/reference/newaugsver_clean.py:41-72 field_constraints and
  * :440-471 generate_row). All business fields arrive as strings; the
  * generator materializes Effective*Date as date32 in parquet but CSV
  * feeds carry YYYY-MM-DD strings — we validate the string form and
  * accept either on read.
  */
object BankSchema {

  val columns: Seq[String] = Seq(
    "RecordOperation", "OrganizationCode", "PayeeID", "OrganizationIdentifier",
    "OrganizationName", "OrganizationLegalName", "OrganizationTIN",
    "OrganizationTINType", "ProfitNonprofit", "OrganizationNPI", "PaymentMode",
    "RoutingTransitNumber", "AccountNumber", "AccountType",
    "EffectiveStartDate", "EffectiveEndDate", "AddressCode", "AddressLine1",
    "AddressLine2", "CityName", "State", "PostalCode", "ContactCode",
    "ContactFirstName", "ContactLastName", "ContactTitle", "ContactPhone",
    "ContactFax", "ContactOtherPhone", "ContactEmail")

  val schema: StructType = StructType(columns.map(StructField(_, StringType, nullable = true)))

  /** max_length per field (newaugsver_clean.py:41-72). */
  val maxLength: Map[String, Int] = Map(
    "RecordOperation" -> 1, "OrganizationCode" -> 1, "OrganizationTINType" -> 3,
    "ProfitNonprofit" -> 2, "OrganizationNPI" -> 10, "PaymentMode" -> 3,
    "RoutingTransitNumber" -> 9, "AccountNumber" -> 17, "AccountType" -> 6,
    "EffectiveStartDate" -> 10, "EffectiveEndDate" -> 10, "AddressCode" -> 10,
    "AddressLine1" -> 40, "AddressLine2" -> 40, "CityName" -> 25, "State" -> 2,
    "PostalCode" -> 10, "ContactCode" -> 2, "ContactFirstName" -> 20,
    "ContactLastName" -> 25, "ContactTitle" -> 23, "ContactPhone" -> 25,
    "ContactFax" -> 25, "ContactOtherPhone" -> 25, "ContactEmail" -> 99,
    "OrganizationName" -> 40, "OrganizationLegalName" -> 40,
    "OrganizationTIN" -> 9, "PayeeID" -> 9, "OrganizationIdentifier" -> 12)
}
