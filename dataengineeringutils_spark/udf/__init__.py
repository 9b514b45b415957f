"""Pandas-UDF / grouped-map / mapInPandas surface (B54-B56)."""
