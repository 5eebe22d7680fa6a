"""Built-in transform library parity (reference util/transform.py)."""

from graflo_spark.transforms import Transform


def test_parse_date_conf(spark):
    df = spark.createDataFrame([("20230101",), ("19991231",)], ["d"])
    out = Transform(fn="parse_date_conf", input=["d"],
                    output=["year", "month", "day"]).apply(df)
    rows = {r["d"]: (r["year"], r["month"], r["day"]) for r in out.collect()}
    assert rows["20230101"] == (2023, 1, 1)
    assert rows["19991231"] == (1999, 12, 31)


def test_parse_date_yahoo_and_reference(spark):
    df = spark.createDataFrame(
        [("2023-01-01", "1923, May 10"), ("2020-06-15", "circa 1850")],
        ["d", "ref"],
    )
    out = Transform(fn="parse_date_yahoo", input=["d"], output=["iso"]).apply(df)
    assert {r["iso"] for r in out.collect()} == {
        "2023-01-01T12:00:00Z", "2020-06-15T12:00:00Z"}
    out2 = Transform(fn="parse_date_reference", input=["ref"],
                     output=["year"]).apply(df)
    assert {r["year"] for r in out2.collect()} == {1923, 1850}


def test_parse_multi_item_bracketed(spark):
    df = spark.createDataFrame(
        [("[name: John, age: 30] [name: Jane, age: 25]",)], ["s"])
    out = Transform(
        fn="parse_multi_item", input=["s"], output=["full_name", "age"],
        params={"keys": {"name": "full_name", "age": "age"}},
    ).apply(df)
    row = out.first()
    assert row["full_name"] == ["John", "Jane"]
    assert row["age"] == ["30", "25"]


def test_parse_multi_item_quoted_with_missing_key(spark):
    df = spark.createDataFrame(
        [("'name: John, age: 30' 'name: Jane'",)], ["s"])
    out = Transform(
        fn="parse_multi_item", input=["s"], output=["full_name", "age"],
        params={"keys": {"name": "full_name", "age": "age"}},
    ).apply(df)
    row = out.first()
    assert row["full_name"] == ["John", "Jane"]
    assert row["age"] == ["30", None]


def test_python_fn_strategy_all_whole_row(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])

    def whole(row, sep="-"):
        return f"{row['k']}{sep}{row['v']}"

    out = Transform(python_fn=whole, strategy="all", output=["combo"],
                    params={"sep": ":"}).apply(df)
    assert {r["combo"] for r in out.collect()} == {"1:a", "2:b"}
    assert out.columns == ["k", "v", "combo"]


def test_python_fn_strategy_all_multi_output_overwrites(spark):
    df = spark.createDataFrame([(3, "x")], ["k", "combo"])

    def pair(row):
        return (row["k"] * 2, row["combo"].upper())

    out = Transform(python_fn=pair, strategy="all",
                    output=["doubled", "combo"]).apply(df)
    row = out.first()
    assert (row["doubled"], row["combo"]) == ("6", "X")
