"""User-defined function surface (row-wise, Arrow-vectorized, SQL-registered)."""
