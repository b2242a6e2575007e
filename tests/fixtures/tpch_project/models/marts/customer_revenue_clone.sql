{{ config(materialized='clone') }}

select * from {{ ref('customer_revenue') }}
