round(total_price * fx_rate, 2)
