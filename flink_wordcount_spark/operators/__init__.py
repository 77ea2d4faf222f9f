"""Composable DataFrame operators (the engine's operator library).

Each module exposes pure DataFrame->DataFrame functions built from
``pyspark.sql.functions`` expressions; queries in ``plans/`` compose them.
"""
