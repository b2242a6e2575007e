{{ config(
    materialized='function',
    arguments=[{'name': 'total_price', 'data_type': 'DOUBLE'},
               {'name': 'fx_rate', 'data_type': 'DOUBLE'}],
    returns='DOUBLE'
) }}

round(total_price * fx_rate, 2)
