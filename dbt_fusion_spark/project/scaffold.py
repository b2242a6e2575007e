"""`dbt init`-style project scaffolding.

Mirrors the reference's starter-project behavior
(crates/dbt-init/assets/jaffle_shop/): a small but complete project —
seeds, staged views, mart tables, schema tests — that runs end-to-end
out of the box. Content below is an original minimal jaffle-style shop
(customers/orders/payments), not a copy of the reference assets.
"""

from __future__ import annotations

from pathlib import Path

FILES: dict[str, str] = {
    "dbt_project.yml": """\
name: jaffle_shop
version: '1.0.0'
profile: jaffle_shop

model-paths: ["models"]
seed-paths: ["seeds"]
macro-paths: ["macros"]
snapshot-paths: ["snapshots"]

models:
  jaffle_shop:
    +materialized: table
    staging:
      +materialized: view
""",
    "profiles.yml": """\
jaffle_shop:
  target: dev
  outputs:
    dev:
      type: spark
      schema: jaffle
      threads: 4
""",
    "seeds/raw_customers.csv": """\
id,first_name,last_name
1,Ada,Lovelace
2,Alan,Turing
3,Grace,Hopper
4,Edsger,Dijkstra
5,Barbara,Liskov
""",
    "seeds/raw_orders.csv": """\
id,user_id,order_date,status
1,1,2018-01-01,returned
2,3,2018-01-02,completed
3,2,2018-01-04,completed
4,1,2018-01-05,shipped
5,5,2018-01-05,completed
6,3,2018-01-07,placed
""",
    "seeds/raw_payments.csv": """\
id,order_id,payment_method,amount
1,1,credit_card,1000
2,2,credit_card,2000
3,3,coupon,100
4,4,bank_transfer,1700
5,5,credit_card,600
6,6,credit_card,800
""",
    "models/staging/stg_customers.sql": """\
select id as customer_id, first_name, last_name
from {{ ref('raw_customers') }}
""",
    "models/staging/stg_orders.sql": """\
select id as order_id, user_id as customer_id, order_date, status
from {{ ref('raw_orders') }}
""",
    "models/staging/stg_payments.sql": """\
select id as payment_id, order_id, payment_method,
       amount / 100.0 as amount
from {{ ref('raw_payments') }}
""",
    "models/orders.sql": """\
with order_payments as (
    select order_id, sum(amount) as amount
    from {{ ref('stg_payments') }}
    group by order_id
)
select o.order_id, o.customer_id, o.order_date, o.status,
       coalesce(p.amount, 0) as amount
from {{ ref('stg_orders') }} o
left join order_payments p using (order_id)
""",
    "models/customers.sql": """\
with customer_orders as (
    select customer_id,
           min(order_date) as first_order,
           max(order_date) as most_recent_order,
           count(*) as number_of_orders,
           sum(amount) as customer_lifetime_value
    from {{ ref('orders') }}
    group by customer_id
)
select c.customer_id, c.first_name, c.last_name,
       o.first_order, o.most_recent_order,
       coalesce(o.number_of_orders, 0) as number_of_orders,
       coalesce(o.customer_lifetime_value, 0) as customer_lifetime_value
from {{ ref('stg_customers') }} c
left join customer_orders o using (customer_id)
""",
    "models/schema.yml": """\
version: 2

models:
  - name: customers
    description: One row per customer with order rollups.
    columns:
      - name: customer_id
        tests: [unique, not_null]
  - name: orders
    columns:
      - name: order_id
        tests: [unique, not_null]
      - name: customer_id
        tests:
          - not_null
          - relationships:
              to: ref('customers')
              field: customer_id
      - name: status
        tests:
          - accepted_values:
              values: [placed, shipped, completed, returned, return_pending]
""",
    "models/staging/schema.yml": """\
version: 2

models:
  - name: stg_customers
    columns:
      - name: customer_id
        tests: [unique, not_null]
  - name: stg_orders
    columns:
      - name: order_id
        tests: [unique, not_null]
  - name: stg_payments
    columns:
      - name: payment_id
        tests: [unique, not_null]
""",
    "macros/cents_to_dollars.sql": """\
{% macro cents_to_dollars(column_name) %}
    ({{ column_name }} / 100.0)
{% endmacro %}
""",
}


def init_project(dest: str | Path, files: dict[str, str] | None = None) -> Path:
    dest = Path(dest)
    if dest.exists() and any(dest.iterdir()):
        raise FileExistsError(f"{dest} exists and is not empty")
    for rel, content in (files or FILES).items():
        path = dest / rel
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(content)
    return dest
