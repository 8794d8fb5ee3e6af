"""Column-expression and pandas-UDF function libraries."""
