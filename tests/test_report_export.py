"""Report rendering (A3/A4) and BioSamples export reshape (P1-P3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.engine import ValidationEngine
from faang_pydantics_validation_spark.report import (
    export_biosample_format,
    purl,
    validation_report,
)
from faang_pydantics_validation_spark.rules import Rule, RuleSet


def test_purl(spark):
    out = spark.range(1).select(purl(F.lit("NCBITaxon:9913")).alias("u")).collect()
    assert out[0].u == "http://purl.obolibrary.org/obo/NCBITaxon_9913"


def _validated(spark):
    df = spark.createDataFrame(
        [("r1", "ok"), ("r2", None), ("r3", "meh")], "id string, v string"
    )
    rs = RuleSet(
        name="t",
        rules=(
            Rule("v_required", "v", "required", tier="mandatory"),
            Rule(
                "v_enum",
                "v",
                "enum",
                params={"values": ["ok"]},
                severity="warning",
            ),
        ),
    )
    return ValidationEngine(rs).validate(df, record_id="id")


def test_report_text(spark):
    out = _validated(spark)
    text = validation_report(out.violations(), out.verdicts())
    assert "Total records: 3" in text
    assert "Invalid records: 1" in text
    assert "Record 'r2':" in text and "field required" in text
    assert "WARNINGS:" in text and "Record 'r3':" in text
    assert text.strip().endswith("Submission status: Fix issues")


def test_report_clean_status(spark):
    df = spark.createDataFrame([("r1", "ok")], "id string, v string")
    rs = RuleSet(name="t", rules=(Rule("v_required", "v", "required"),))
    out = ValidationEngine(rs).validate(df, record_id="id")
    text = validation_report(out.violations(), out.verdicts())
    assert text.strip().endswith("Submission status: Ready for submission")


def test_export_shape(spark):
    df = spark.createDataFrame(
        [
            (
                "s1",
                {"text": "specimen", "term": "OBI:0001479"},
                {"text": "Bos taurus", "term": "NCBITaxon:9913"},
                ["PARENT1", "PARENT2"],
            )
        ],
        "record_id string, material struct<text:string,term:string>, "
        "organism struct<text:string,term:string>, child_of array<string>",
    )
    out = export_biosample_format(df).collect()[0]
    assert out.name == "s1"
    mat = out.characteristics.material[0]
    assert mat.text == "specimen"
    assert mat.ontologyTerms == ["http://purl.obolibrary.org/obo/OBI_0001479"]
    assert [r.type for r in out.relationships] == ["child of", "child of"]
    assert [r.target for r in out.relationships] == ["PARENT1", "PARENT2"]


def test_export_full_organism_reference_shape(spark):
    """The FULL reference export dict (organism_validation.py:267-307):
    material/organism/sex always; `birth date` with {text, unit} and NO
    ontologyTerms; breed with ontologyTerms; both conditional;
    relationships conditional. to_json(ignoreNullFields) reproduces the
    reference's key-omission behavior exactly."""
    import json

    from faang_pydantics_validation_spark.organism import ORGANISM_SCHEMA
    from faang_pydantics_validation_spark.report import export_organism_batch
    from test_organism import _rec

    rows = [
        _rec("FULL", child_of=("P1", "P2")),
        _rec("BARE", birth_date=None, breed_term=None),
    ]
    df = spark.createDataFrame(
        [json.loads(json.dumps(r)) for r in rows], f"struct<{ORGANISM_SCHEMA}>"
    ).withColumn("record_id", F.col("custom.sample_name.value"))

    got = {
        r.name: json.loads(r.js)
        for r in export_organism_batch(df)
        .select("name", F.to_json(F.struct("characteristics", "relationships")).alias("js"))
        .collect()
    }

    full = got["FULL"]
    assert full["characteristics"]["material"] == [
        {"text": "organism",
         "ontologyTerms": ["http://purl.obolibrary.org/obo/OBI_0100026"]}
    ]
    assert full["characteristics"]["sex"] == [
        {"text": "male",
         "ontologyTerms": ["http://purl.obolibrary.org/obo/PATO_0000384"]}
    ]
    assert full["characteristics"]["birth date"] == [
        {"text": "2020-01-15", "unit": "YYYY-MM-DD"}
    ]
    assert full["characteristics"]["breed"] == [
        {"text": "Holstein",
         "ontologyTerms": ["http://purl.obolibrary.org/obo/LBO_0000487"]}
    ]
    assert full["relationships"] == [
        {"type": "child of", "target": "P1"},
        {"type": "child of", "target": "P2"},
    ]

    bare = got["BARE"]
    # conditional keys omitted exactly like the reference's dict
    assert "birth date" not in bare["characteristics"]
    assert "breed" not in bare["characteristics"]
    assert "relationships" not in bare
    assert set(bare["characteristics"]) == {"material", "organism", "sex"}
