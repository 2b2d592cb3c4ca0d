"""Flattener unit tests (SURVEY.md §5.2): handcrafted nested JSON with
arrays-of-structs, depth >= 4, empty arrays (explode_outer null path) and
name collisions."""

from __future__ import annotations

import pytest

from formula_1_spark.plans.flatten import flatten_json, index_columns, leaf_name


@pytest.fixture(scope="module")
def nested_df(spark):
    data = [
        """{"MRData": {"total": "2", "RaceTable": {"season": "2020",
             "Races": [
               {"round": "1", "Results": [
                  {"pos": "1", "FastestLap": {"AverageSpeed": {"speed": "201.5"}}},
                  {"pos": "2", "FastestLap": {"AverageSpeed": {"speed": "199.0"}}}]},
               {"round": "2", "Results": []}
             ]}}}""",
    ]
    return spark.read.json(spark.sparkContext.parallelize(data))


def test_flatten_produces_path_named_flat_schema(nested_df):
    flat = flatten_json(nested_df)
    from pyspark.sql.types import ArrayType, StructType

    for f in flat.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, StructType))
    # Deep leaf keeps its full lossless path with *depth markers.
    deep = [c for c in flat.columns if "speed" in c]
    assert deep == [
        "MRData*1->RaceTable*2->Races*3->Results*4->FastestLap*5->AverageSpeed*6->speed*7"
    ]


def test_flatten_row_semantics_and_empty_array_nulls(nested_df):
    flat = flatten_json(nested_df)
    rows = flat.collect()
    # Race 1 explodes into 2 result rows; race 2's empty Results array
    # keeps one row with NULL leaves (explode_outer semantics).
    assert len(rows) == 3
    pos_col = next(c for c in flat.columns if c.endswith("pos*5"))
    by_round = {}
    round_col = next(c for c in flat.columns if c.endswith("round*4"))
    for r in rows:
        by_round.setdefault(r[round_col], []).append(r[pos_col])
    assert sorted(by_round["1"]) == ["1", "2"]
    assert by_round["2"] == [None]


def test_no_leaf_values_lost(nested_df):
    """Property (SURVEY §5.4): every scalar leaf value in the input JSON
    appears in the flattened output."""
    flat = flatten_json(nested_df)
    values = set()
    for row in flat.collect():
        values.update(str(v) for v in row if v is not None)
    for leaf in ["2020", "1", "2", "201.5", "199.0"]:
        assert leaf in values


def test_collision_suffix(spark):
    data = ['{"a": {"b": 1}, "a->b*2": 99}']
    flat = flatten_json(spark.read.json(spark.sparkContext.parallelize(data)))
    # The pre-existing top-level column claims its name at depth 1; the
    # struct child would collide and gets the #1 suffix.
    assert sorted(flat.columns) == ["a*1->b*2", "a->b*2*1"]
    row = flat.collect()[0]
    assert row["a*1->b*2"] == 1
    assert row["a->b*2*1"] == 99


def test_index_columns_and_leaf_name(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "name"])
    assert index_columns(df).columns == ["id*1", "name*1"]
    assert leaf_name("MRData*1->RaceTable*2->season*3") == "season"
    assert leaf_name("plain") == "plain"
