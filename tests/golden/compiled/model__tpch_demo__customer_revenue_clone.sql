select * from `analytics`.`customer_revenue`
