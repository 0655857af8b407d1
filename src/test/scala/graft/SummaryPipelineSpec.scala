package graft

import graft.plans._
import graft.sources.Source
import org.apache.spark.sql.functions._

/** SURVEY §7.2 slice 2: the summary-pipeline shape — switching per
  * category, assignation, fold, unfold — end-to-end through the YAML
  * engine over the reference demo data (corrected per SURVEY §5.2: the
  * committed summary flow references a nonexistent products.profit;
  * intent per the golden is cost-derived profit).
  */
class SummaryPipelineSpec extends SparkSpec {

  private val ref = "/root/reference"

  private val configYaml =
    s"""
inputs:
  orders_input:
    path: $ref/input_folder/orders.csv
    file_schema:
      name: OrdersSchema
      columns:
        order_id: { type: integer }
        customer_id: { type: integer }
        order_date: { type: string }
        product_name: { type: string }
        quantity: { type: integer }
        unit_price: { type: string }
  customers_input:
    path: $ref/input_folder/customers.csv
    file_schema:
      name: CustomersSchema
      columns:
        customer_id: { type: integer }
        customer_name: { type: string }
        city: { type: string }
        country: { type: string }
        signup_date: { type: string }
  products_input:
    path: $ref/input_folder/products.csv
    file_schema:
      name: ProductsSchema
      columns:
        product_name: { type: string }
        category: { type: string }
        cost_price: { type: string }
outputs:
  summary_output_def:
    path: /tmp/graft-test/summary
    format: csv
    file_schema:
      name: SummarySchema
      columns:
        country: { type: string }
        product_name: { type: string }
        Electronics: { type: float }
        Furniture: { type: float }
        Stationery: { type: float }
        other_column: { type: float }
"""

  private val flowYaml =
    """
source: orders_input
operations:
- operation_type: bind
  right_file_path: customers_input
  right_schema_columns: { customer_id: integer, country: string }
  left_on: customer_id
  right_on: customer_id
  how: left
  columns_to_add: [country]
- operation_type: bind
  right_file_path: products_input
  right_schema_columns: { product_name: string, category: string, cost_price: string }
  left_on: product_name
  right_on: product_name
  how: left
  columns_to_add: [category, cost_price]
- operation_type: application
  output_column: unit_price_f
  input_columns: [unit_price]
  function_str: 'lambda r: float(r[''unit_price''].replace(''$'', ''''))'
- operation_type: casting
  output_column: cost_price_f
  input_column: cost_price
  target_type: float
- operation_type: arithmetic
  output_column: unit_margin
  input_columns: [unit_price_f, cost_price_f]
  operator: '-'
- operation_type: application
  output_column: profit
  input_columns: [unit_margin, quantity]
  function_str: 'lambda r: r[''unit_margin''] * r[''quantity'']'
- operation_type: switching
  output_column: Electronics
  switch_column: category
  mapping: { Electronics: profit }
  default_value: 0.0
- operation_type: switching
  output_column: Furniture
  switch_column: category
  mapping: { Furniture: profit }
  default_value: 0.0
- operation_type: switching
  output_column: Stationery
  switch_column: category
  mapping: { Stationery: profit }
  default_value: 0.0
- operation_type: assignation
  output_column: other_column
  value: 0.0
- operation_type: fold
  id_columns: [country, product_name]
  value_columns: [Electronics, Furniture, Stationery, other_column]
  key_column_name: key
  value_column_name: value
- operation_type: unfold
  index_columns: [country, product_name]
  key_column: key
  value_column: value
"""

  test("slice 2: switching x3 + fold + unfold reconstruct per-category profit columns") {
    val config = Yaml.parseConfig(configYaml)
    val flow = Yaml.parseFlow(flowYaml)
    val src = Source.load(spark, config.inputMap(flow.source))
    val result = Runner.applyAll(spark, src, flow.operations, config.inputMap)

    assert(SchemaValidator.diff(result.schema, config.outputMap("summary_output_def").schema).isEmpty)

    // fold emits 4 rows per order; unfold reconstructs one row per
    // (country, product_name) with first-appearance column order
    val rows = result.collect()
    assert(result.columns.toSeq ==
      Seq("country", "product_name", "Electronics", "Furniture", "Stationery", "other_column"))

    // semantic check against hand-computed demo values:
    // Laptop Pro (USA, Electronics): (1050-850)*1 = 200
    val laptop = rows.find(r => r.getString(1) == "Laptop Pro").get
    assert(math.abs(laptop.getAs[Double]("Electronics") - 200.0) < 1e-9)
    assert(laptop.getAs[Double]("Furniture") == 0.0)
    // Office Chair (Germany, Furniture): (130-120.75)*2 = 18.5
    val chair = rows.find(r => r.getString(1) == "Office Chair").get
    assert(math.abs(chair.getAs[Double]("Furniture") - 18.5) < 1e-9)
    assert(chair.getAs[Double]("Electronics") == 0.0)
  }
}
