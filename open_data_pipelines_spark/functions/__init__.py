"""Scalar expression packs (SURVEY.md §2.3, §2.9).

Everything here returns Column expressions built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd. No Python
UDFs in these packs.
"""
