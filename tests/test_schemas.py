from __future__ import annotations

import pytest
from pyspark.sql import types as T

from open_data_pipelines_spark.schemas import (
    SchemaValidationError,
    TemplateRegistry,
    all_string_template,
    template_to_struct,
    validate_columns,
)


def test_template_to_struct():
    st = template_to_struct(
        {
            "usrn": "BIGINT",
            "geometry": "VARCHAR",
            "log_id": "VARCHAR(36) PRIMARY KEY",
            "ts": "TIMESTAMP",
            "flag": "BOOLEAN",
            "score": "DOUBLE",
        }
    )
    assert st["usrn"].dataType == T.LongType()
    assert st["log_id"].dataType == T.StringType()
    assert st["ts"].dataType == T.TimestampType()
    assert st["flag"].dataType == T.BooleanType()
    assert st["score"].dataType == T.DoubleType()


def test_all_string_template():
    st = all_string_template(["a", "b"])
    assert all(f.dataType == T.StringType() for f in st.fields)


def test_validate_columns_strict_and_lenient():
    with pytest.raises(SchemaValidationError):
        validate_columns(["a", "b"], ["a", "c"])
    missing, extra = validate_columns(["a", "b"], ["a", "c"], strict=False)
    assert missing == {"c"} and extra == {"b"}


def test_template_registry_dated_selection():
    reg = TemplateRegistry()
    legacy = {"BNF_CODE": "VARCHAR"}
    current = {"BNF_PRESENTATION_CODE": "VARCHAR"}
    reg.register("000000", legacy)
    reg.register("202503", current)
    assert reg.for_period("202502") is legacy
    assert reg.for_period("202503") is current
    assert reg.for_period("202512") is current
