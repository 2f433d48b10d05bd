"""Schema helpers: DDL-template dicts -> StructType, validation.

The reference declares every table as a ``db_template: dict[str, str]``
of column name -> warehouse DDL type (e.g.
``src/data_sources/street_manager.py:171-220``,
``src/data_sources/naptan.py:69-117``) and validates ingested headers
against it by set difference (``validate_column_names``,
``src/data_sources/nhs_english_prescriptions.py:72-98`` + 4 clones).
Schema evolution is handled by *dated template selection*
(``get_template_for_date``, ``nhs_english_prescriptions.py:356-368``).

Here the same shapes map onto Spark StructTypes:

- :func:`template_to_struct` converts a db_template to a StructType
  (explicit ``schema=`` on every read — never ``inferSchema``).
- :func:`validate_columns` is the fail-fast header check; ``strict=False``
  reproduces the lenient Cadent variant
  (``cadent_underground.py:165-169``: log and proceed).
- :func:`TemplateRegistry` reproduces dated template selection.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# Warehouse DDL type -> Spark type. The reference's two-tier convention
# (stringly bronze, typed silver — SURVEY.md §1.2) is preserved by
# `all_string_template`.
_DDL_TO_SPARK: dict[str, T.DataType] = {
    "VARCHAR": T.StringType(),
    "TEXT": T.StringType(),
    "BIGINT": T.LongType(),
    "INTEGER": T.IntegerType(),
    "INT": T.IntegerType(),
    "SERIAL": T.IntegerType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT": T.FloatType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
    "BOOLEAN": T.BooleanType(),
}


def _ddl_to_type(ddl: str) -> T.DataType:
    base = ddl.strip().upper()
    # strip parameters / constraints: VARCHAR(36) PRIMARY KEY -> VARCHAR
    base = base.split("(")[0].split()[0]
    if base not in _DDL_TO_SPARK:
        raise ValueError(f"unsupported DDL type: {ddl!r}")
    return _DDL_TO_SPARK[base]


def template_to_struct(template: dict[str, str], nullable: bool = True) -> T.StructType:
    """``{"usrn": "BIGINT", "geometry": "VARCHAR"}`` -> StructType."""
    return T.StructType(
        [T.StructField(name, _ddl_to_type(ddl), nullable) for name, ddl in template.items()]
    )


def all_string_template(columns: list[str]) -> T.StructType:
    """Stringly-typed bronze schema ("All data is converted to strings
    for simplicity" — ``nhs_english_prescriptions.py:108-109``)."""
    return T.StructType([T.StructField(c, T.StringType(), True) for c in columns])


class SchemaValidationError(ValueError):
    pass


def validate_columns(
    actual: list[str],
    expected: list[str],
    strict: bool = True,
) -> tuple[set[str], set[str]]:
    """Header set-difference check (fail-fast before load).

    Mirrors ``validate_column_names`` (missing/extra columns -> error,
    ``nhs_english_prescriptions.py:72-98``). Returns (missing, extra);
    raises when strict and either is non-empty.
    """
    missing = set(expected) - set(actual)
    extra = set(actual) - set(expected)
    if strict and (missing or extra):
        raise SchemaValidationError(
            f"column validation failed: missing={sorted(missing)} extra={sorted(extra)}"
        )
    return missing, extra


@dataclass
class TemplateRegistry:
    """Dated template selection (schema evolution).

    The reference keys NHS schemas off ``SCHEMA_CHANGE_CUTOFFS`` =
    "202502" (``nhs_english_prescriptions.py:274-391``) and DFT uses
    per-file templates (``dft_road_stats.py:150-215``). Register
    (cutoff_yyyymm, template) pairs; lookup returns the template whose
    cutoff window contains the period.
    """

    # sorted list of (first_period_yyyymm, template)
    eras: list[tuple[str, dict[str, str]]] = field(default_factory=list)

    def register(self, first_period: str, template: dict[str, str]) -> None:
        self.eras.append((first_period, template))
        self.eras.sort(key=lambda e: e[0])

    def for_period(self, period_yyyymm: str) -> dict[str, str]:
        chosen = None
        for first, tpl in self.eras:
            if period_yyyymm >= first:
                chosen = tpl
        if chosen is None:
            raise KeyError(f"no template registered for period {period_yyyymm}")
        return chosen
