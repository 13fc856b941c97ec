package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the 11 source tables (SURVEY.md §1.3; reference
  * projection src/ingestion_lambda.py:26-119) and the star outputs
  * (§1.4). Declaring these kills CSV type inference in production paths
  * (§1.2) and encodes the reference's column-exclusion policy (P1): the
  * sensitive columns it deliberately never ingests
  * (counterparty.commercial_contact, department.manager,
  * payment.company_ac_number, …) simply do not exist here.
  */
object Schemas {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  val money: DataType = DecimalType(10, 2)

  val address: StructType = st(
    "address_id" -> IntegerType, "address_line_1" -> StringType,
    "address_line_2" -> StringType, "district" -> StringType,
    "city" -> StringType, "postal_code" -> StringType,
    "country" -> StringType, "phone" -> StringType)

  val counterparty: StructType = st(
    "counterparty_id" -> IntegerType, "counterparty_legal_name" -> StringType,
    "legal_address_id" -> IntegerType)

  val currency: StructType = st(
    "currency_id" -> IntegerType, "currency_code" -> StringType)

  val department: StructType = st(
    "department_id" -> IntegerType, "department_name" -> StringType,
    "location" -> StringType)

  val design: StructType = st(
    "design_id" -> IntegerType, "design_name" -> StringType,
    "file_location" -> StringType, "file_name" -> StringType)

  val payment: StructType = st(
    "payment_id" -> IntegerType, "created_at" -> TimestampType,
    "last_updated" -> TimestampType, "transaction_id" -> IntegerType,
    "counterparty_id" -> IntegerType, "payment_amount" -> money,
    "currency_id" -> IntegerType, "payment_type_id" -> IntegerType,
    "paid" -> BooleanType, "payment_date" -> DateType)

  val paymentType: StructType = st(
    "payment_type_id" -> IntegerType, "payment_type_name" -> StringType)

  val purchaseOrder: StructType = st(
    "purchase_order_id" -> IntegerType, "created_at" -> TimestampType,
    "last_updated" -> TimestampType, "staff_id" -> IntegerType,
    "counterparty_id" -> IntegerType, "item_code" -> StringType,
    "item_quantity" -> IntegerType, "item_unit_price" -> money,
    "currency_id" -> IntegerType, "agreed_delivery_date" -> DateType,
    "agreed_payment_date" -> DateType, "agreed_delivery_location_id" -> IntegerType)

  val salesOrder: StructType = st(
    "sales_order_id" -> IntegerType, "created_at" -> TimestampType,
    "last_updated" -> TimestampType, "design_id" -> IntegerType,
    "staff_id" -> IntegerType, "counterparty_id" -> IntegerType,
    "units_sold" -> IntegerType, "unit_price" -> money,
    "currency_id" -> IntegerType, "agreed_delivery_date" -> DateType,
    "agreed_payment_date" -> DateType, "agreed_delivery_location_id" -> IntegerType)

  val staff: StructType = st(
    "staff_id" -> IntegerType, "first_name" -> StringType,
    "last_name" -> StringType, "department_id" -> IntegerType,
    "email_address" -> StringType)

  val transaction: StructType = st(
    "transaction_id" -> IntegerType, "transaction_type" -> StringType,
    "sales_order_id" -> IntegerType, "purchase_order_id" -> IntegerType)

  /** All 11 source tables, keyed by reference table name, with their
    * primary key (dedup key for keep-last, A2). */
  val sources: Map[String, (StructType, String)] = Map(
    "address" -> (address, "address_id"),
    "counterparty" -> (counterparty, "counterparty_id"),
    "currency" -> (currency, "currency_id"),
    "department" -> (department, "department_id"),
    "design" -> (design, "design_id"),
    "payment" -> (payment, "payment_id"),
    "payment_type" -> (paymentType, "payment_type_id"),
    "purchase_order" -> (purchaseOrder, "purchase_order_id"),
    "sales_order" -> (salesOrder, "sales_order_id"),
    "staff" -> (staff, "staff_id"),
    "transaction" -> (transaction, "transaction_id"))
}
