package graft.model

import java.sql.Date

/** Typed facades for the 11 star-schema outputs (SURVEY.md §1.4) — the
  * optional `Dataset[T]` layer for compile-time safety over the
  * `DataFrame` core (§1.2). Decimal money keeps `BigDecimal`; surrogate
  * ids are Long; date FKs in facts reference `DimDate.date_id`.
  */
object StarRows {
  final case class DimLocation(location_id: Int, address_line_1: String,
      address_line_2: String, district: String, city: String,
      postal_code: String, country: String, phone: String)

  final case class DimCounterparty(counterparty_id: Int,
      counterparty_legal_name: String, counterparty_legal_address_line_1: String,
      counterparty_legal_address_line_2: String, counterparty_legal_district: String,
      counterparty_legal_city: String, counterparty_legal_postal_code: String,
      counterparty_legal_country: String, counterparty_legal_phone_number: String)

  final case class DimCurrency(currency_id: Int, currency_code: String)

  final case class DimDesign(design_id: Int, design_name: String,
      file_location: String, file_name: String)

  final case class DimPaymentType(payment_type_id: Int, payment_type_name: String)

  final case class DimStaff(staff_id: Int, first_name: String, last_name: String,
      department_name: String, location: String, email_address: String)

  final case class DimTransaction(transaction_id: Int, transaction_type: String,
      sales_order_id: Option[Int], purchase_order_id: Option[Int])

  final case class DimDate(date_id: Long, date: Date, year: Long, month: Long,
      day: Long, day_of_week: Long, day_name: String, month_name: String,
      quarter: Long)

  final case class FactPayment(record_payment_id: Long, payment_id: Int,
      created_date: Long, created_time: String, last_updated_date: Long,
      last_updated_time: String, transaction_id: Int, counterparty_id: Int,
      payment_amount: BigDecimal, currency_id: Int, payment_type_id: Int,
      paid: Boolean, payment_date: Long)

  final case class FactPurchaseOrder(purchase_record_id: Long,
      purchase_order_id: Int, created_date: Long, created_time: String,
      last_updated_date: Long, last_updated_time: String, staff_id: Int,
      counterparty_id: Int, item_code: String, item_quantity: Int,
      item_unit_price: BigDecimal, currency_id: Int, agreed_delivery_date: Long,
      agreed_payment_date: Long, agreed_delivery_location_id: Int)

  final case class FactSalesOrder(sales_record_id: Long, sales_order_id: Int,
      created_date: Long, created_time: String, last_updated_date: Long,
      last_updated_time: String, sales_staff_id: Int, counterparty_id: Int,
      units_sold: Int, unit_price: BigDecimal, currency_id: Int, design_id: Int,
      agreed_payment_date: Long, agreed_delivery_date: Long,
      agreed_delivery_location_id: Int)
}
