"""Transforms: the reference's per-row transform surface as Column expressions.

Reference (graflo/architecture/contract/ingestion/transform.py + runtime actor
transform.py + builtin library util/transform.py:41-516): a transform renames
columns, applies a function over input columns (strategies ``single`` — one
call over the tuple of inputs, ``each`` — unary fn per column, ``all`` — whole
row), optionally pivots a scalar result into ``{key, value}`` ("dress"), or
renames document *keys* by function.

Spark design: every builtin compiles to native Column expressions (JVM-side,
whole-stage-codegen); arbitrary Python callables get a vectorized pandas_udf
escape hatch. A transform application is ``df.withColumns`` — no shuffle, no
row-at-a-time Python in the hot path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Builtin library: name -> factory(input Columns, params) -> list[Column]
# (one output Column per declared output). Mirrors reference util/transform.py
# with native exprs instead of python calls.
# --------------------------------------------------------------------------

def _camel_to_snake(c: Column) -> Column:
    return F.lower(F.regexp_replace(c, r"(?<=[a-z0-9])([A-Z])", r"_$1"))


def _snake_to_camel(c: Column) -> Column:
    # initcap each _-separated token then strip separators; keep first lower
    parts = F.split(c, "_")
    camel = F.concat_ws(
        "",
        F.element_at(parts, 1),
        F.array_join(F.transform(F.slice(parts, 2, 100000), F.initcap), ""),
    )
    return camel


BUILTINS: dict[str, Callable[..., list[Column]]] = {
    "identity": lambda cols, p: list(cols),
    # (reference util/transform.py: standardize — lowercase + whitespace fold)
    "standardize": lambda cols, p: [
        F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")) for c in cols
    ],
    "lower": lambda cols, p: [F.lower(c) for c in cols],
    "upper": lambda cols, p: [F.upper(c) for c in cols],
    "trim": lambda cols, p: [F.trim(c) for c in cols],
    "camel_to_snake": lambda cols, p: [_camel_to_snake(c) for c in cols],
    "snake_to_camel": lambda cols, p: [_snake_to_camel(c) for c in cols],
    "try_int": lambda cols, p: [c.cast("string").try_cast("long") for c in cols],
    "try_float": lambda cols, p: [c.cast("string").try_cast("double") for c in cols],
    "round_str": lambda cols, p: [
        # format_string, not format_number: the latter inserts thousands
        # separators ("1,234.57"), which the reference's plain rounded
        # string does not and numeric re-parses reject (review finding)
        F.when(c.isNotNull(), F.format_string(
            f"%.{int(p.get('ndigits', 2))}f", F.round(
                c.cast("double"), int(p.get("ndigits", 2))))) for c in cols
    ],
    "round": lambda cols, p: [F.round(c, int(p.get("ndigits", 2))) for c in cols],
    # re.escape: the reference semantics are LITERAL str.removeprefix /
    # removesuffix — an unescaped "." or "$" in the param would mis-match
    # or never match as a regex (review finding)
    "remove_prefix": lambda cols, p: [
        F.regexp_replace(c, "^" + _re_escape(p["prefix"]), "") for c in cols
    ],
    "remove_suffix": lambda cols, p: [
        F.regexp_replace(c, _re_escape(p["suffix"]) + "$", "") for c in cols
    ],
    "split_keep_part": lambda cols, p: [
        F.element_at(F.split(c, p.get("sep", r"\s+")), int(p.get("index", 0)) + 1)
        for c in cols
    ],
    # parse_date_standard(date_str) -> timestamp (reference parse_date_*)
    "parse_date_standard": lambda cols, p: [
        F.to_timestamp(c, p.get("format", "yyyy-MM-dd")) for c in cols
    ],
    # parse_date_ibes(yyyymmdd, hhmmss) -> one timestamp
    "parse_date_ibes": lambda cols, p: [
        F.to_timestamp(
            F.concat_ws(" ", cols[0].cast("string"), cols[1].cast("string")),
            "yyyyMMdd HH:mm:ss",
        )
    ],
    "epoch_to_datetime": lambda cols, p: [
        F.to_timestamp(F.from_unixtime(c.cast("long"))) for c in cols
    ],
    "datetime_to_epoch": lambda cols, p: [F.unix_timestamp(c) for c in cols],
    "concat": lambda cols, p: [F.concat_ws(p.get("sep", " "), *cols)],
    # cast_ibes_analyst("LAST  F") -> (last_name, initial)
    "cast_ibes_analyst": lambda cols, p: [
        F.trim(F.regexp_extract(cols[0], r"^(.*?)\s+(\S+)$", 1)),
        F.regexp_extract(cols[0], r"^(.*?)\s+(\S+)$", 2),
    ],
    # parse_date_conf("20230101") -> (year, month, day) as longs
    # (reference util/transform.py:85-99)
    "parse_date_conf": lambda cols, p: [
        F.substring(cols[0].cast("string"), 1, 4).cast("long"),
        F.substring(cols[0].cast("string"), 5, 2).cast("long"),
        F.substring(cols[0].cast("string"), 7, 2).cast("long"),
    ],
    # parse_date_yahoo("2023-01-01") -> "2023-01-01T12:00:00Z"
    # (reference util/transform.py:123-137 — noon-pinned ISO 8601 string)
    "parse_date_yahoo": lambda cols, p: [F.concat(cols[0], F.lit("T12:00:00Z"))],
    # parse_date_reference("1923, May 10") -> 1923 (first 4-digit year in a
    # human-written date reference, reference util/transform.py:210-223)
    "parse_date_reference": lambda cols, p: [
        F.regexp_extract(cols[0], r"\b(\d{4})\b", 1).try_cast("long")
    ],
    "parse_multi_item": lambda cols, p: _parse_multi_item(cols[0], p),
}


def _re_escape(s: str) -> str:
    import re

    return re.escape(str(s))


def _parse_multi_item(col: Column, params: dict) -> list[Column]:
    """Quoted/bracketed multi-item string -> per-key arrays (reference
    util/transform.py:328-377: ``'[name: John, age: 30] [name: Jane]'`` with
    ``keys={"name": "full_name", "age": "age"}`` yields ``full_name =
    ["John", "Jane"]``, ``age = ["30", null]``).

    Pure higher-order Column expressions (regexp_extract_all + transform) —
    stays inside codegen; the reference's quoted-vs-bracketed switch becomes
    a per-row ``when``. One output array per mapped key, in ``keys`` order.
    """
    keys: dict[str, str] = params["keys"]
    quoted = F.concat(
        F.regexp_extract_all(col, F.lit(r'"(.*?)"'), F.lit(1)),
        F.regexp_extract_all(col, F.lit(r"'(.*?)'"), F.lit(1)),
    )
    bracketed = F.regexp_extract_all(col, F.lit(r"\[([^]]+)\]"), F.lit(1))
    # bracketed input wins even when a VALUE carries an apostrophe
    # ("[name: O'Brien]"), and double-quoted input is quoted input too
    items = F.when(
        col.contains("["), bracketed
    ).when(col.contains("'") | col.contains('"'), quoted).otherwise(bracketed)
    out = []
    def value_for(item: Column, key: str) -> Column:
        # "k: v" entries; regexp_extract rejects lambda-variable inputs, so
        # split_part/filter (Column-native) do the per-entry key match
        entries = F.split(item, ",")
        matched = F.filter(
            entries,
            lambda e: F.trim(F.split_part(e, F.lit(":"), F.lit(1))) == F.lit(key),
        )
        first = F.get(matched, 0)
        return F.nullif(F.trim(F.split_part(first, F.lit(":"), F.lit(2))), F.lit(""))

    def item_fn(k: str):
        # NB: not `lambda item, k=src_key: ...` — PySpark reads the lambda's
        # arity, and a defaulted second parameter would bind the array INDEX
        return lambda item: value_for(item, k)

    for src_key in keys:
        out.append(F.transform(items, item_fn(src_key)))
    return out


def register_builtin(name: str, factory: Callable[..., list[Column]]) -> None:
    """Extend the named-transform registry (reference
    ingestion_model.transforms merge, model.py:56-102)."""
    BUILTINS[name] = factory


@dataclass
class Transform:
    """One transform step.

    Exactly one of ``rename`` / ``fn`` / ``python_fn`` is set. ``strategy``:
    ``single`` (fn over the input tuple -> positional outputs), ``each``
    (unary fn per input column, outputs align 1:1), ``all`` (whole-row).
    ``dress`` pivots a scalar output into two columns
    ``{key: <input col name>, value: <result>}`` (reference transform.py:95-105).
    ``target="keys"`` renames *columns* by the function instead of values.
    """

    rename: dict[str, str] | None = None
    fn: str | None = None
    python_fn: Callable | None = None
    input: list[str] = dc_field(default_factory=list)
    output: list[str] = dc_field(default_factory=list)
    params: dict[str, Any] = dc_field(default_factory=dict)
    strategy: str = "single"
    dress: dict[str, str] | None = None  # {"key": col, "value": col}
    target: str = "fields"  # or "keys"
    input_groups: list[list[str]] = dc_field(default_factory=list)
    fail_on_missing: bool = False

    def output_columns(self) -> list[str]:
        if self.rename:
            return list(self.rename.values())
        if self.dress:
            return [self.dress["key"], self.dress["value"]]
        return list(self.output) or list(self.input)

    # ---------------------------------------------------------------- apply
    def apply(self, df: DataFrame) -> DataFrame:
        if self.target == "keys":
            return self._apply_keys(df)
        if self.rename:
            present = {k: v for k, v in self.rename.items() if k in df.columns}
            if len(present) < len(self.rename) and self.fail_on_missing:
                missing = sorted(set(self.rename) - set(present))
                raise ValueError(
                    f"rename inputs missing from frame: {missing}")
            return df.withColumnsRenamed(present)
        if self.input_groups:
            out = df
            for group in self.input_groups:
                out = self._apply_call(out, group)
            return out
        return self._apply_call(df, self.input)

    def _apply_keys(self, df: DataFrame) -> DataFrame:
        if self.fn not in BUILTINS:
            raise ValueError(f"key-target transform needs a builtin fn, got {self.fn}")
        include = set(self.params.get("include", df.columns))
        exclude = set(self.params.get("exclude", ()))

        def rename_one(name: str) -> str:
            if name not in include or name in exclude:
                return name
            import re

            if self.fn == "camel_to_snake":
                return re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", name).lower()
            if self.fn == "lower":
                return name.lower()
            if self.fn == "upper":
                return name.upper()
            raise ValueError(f"unsupported key fn {self.fn}")

        return df.toDF(*[rename_one(c) for c in df.columns])

    def _missing_guard(self, df: DataFrame, cols: list[str]) -> bool:
        missing = [c for c in cols if c not in df.columns]
        if missing and self.fail_on_missing:
            raise ValueError(f"transform inputs missing from frame: {missing}")
        return not missing

    def _apply_call(self, df: DataFrame, input_cols: list[str]) -> DataFrame:
        if self.python_fn is not None and self.strategy == "all":
            return self._apply_python_all(df)
        outputs = self.output or input_cols
        if not self._missing_guard(df, input_cols):
            # error tolerance: null the DECLARED outputs — for a dress
            # transform those are the key/value pivot columns, not the
            # missing input's name (review finding: nulling the input
            # name left downstream mappings unresolved)
            if self.dress:
                outputs = [self.dress["key"], self.dress["value"]]
            return df.withColumns({o: F.lit(None) for o in outputs})

        if self.dress:
            # wide->long pivot of one column: {key: input name, value: result}
            key_col, val_col = self.dress["key"], self.dress["value"]
            cols = self._result_columns(df, input_cols)
            return df.withColumns(
                {key_col: F.lit(input_cols[0]), val_col: cols[0]}
            )

        cols = self._result_columns(df, input_cols)
        if len(cols) != len(outputs):
            raise ValueError(
                f"transform produced {len(cols)} columns for outputs {outputs}"
            )
        return df.withColumns(dict(zip(outputs, cols)))

    def _result_columns(self, df: DataFrame, input_cols: list[str]) -> list[Column]:
        in_cols = [F.col(c) for c in input_cols]
        if self.fn is not None:
            if self.fn not in BUILTINS:
                raise ValueError(f"unknown builtin transform {self.fn!r}")
            factory = BUILTINS[self.fn]
            if self.strategy == "each":
                return [factory([c], self.params)[0] for c in in_cols]
            return list(factory(in_cols, self.params))
        if self.python_fn is not None:
            return self._pandas_udf_columns(df, input_cols)
        raise ValueError("transform has neither fn nor python_fn nor rename")

    def _apply_python_all(self, df: DataFrame) -> DataFrame:
        """``strategy='all'``: the callable receives the WHOLE row as a dict
        (reference contract/ingestion/transform.py:591-595 — full-document
        call; models.py:340-343 forbids ``input``/``input_groups`` with it).
        One Arrow-batched mapInPandas pass appends the declared outputs —
        string-typed, like every other python escape hatch here."""
        outputs = self.output
        if not outputs:
            raise ValueError(
                "strategy='all' python transforms require declared output fields"
            )
        from pyspark.sql import types as T

        fn, params, n_out = self.python_fn, self.params, len(outputs)
        # the callable sees the FULL document, including any column it
        # overwrites; overwritten columns are replaced in the output schema
        kept = [f for f in df.schema.fields if f.name not in outputs]
        out_schema = T.StructType(
            kept + [T.StructField(o, T.StringType()) for o in outputs]
        )
        kept_names = [f.name for f in kept]

        def batch(it):
            for pdf in it:
                res = [fn(r, **params) for r in pdf.to_dict("records")]
                if n_out == 1:
                    cols = {
                        outputs[0]: [None if v is None else str(v) for v in res]
                    }
                else:
                    cols = {
                        o: [None if r[i] is None else str(r[i]) for r in res]
                        for i, o in enumerate(outputs)
                    }
                yield pdf[kept_names].assign(**cols)

        return df.mapInPandas(batch, schema=out_schema)

    def _pandas_udf_columns(self, df: DataFrame, input_cols: list[str]) -> list[Column]:
        """Vectorized escape hatch for arbitrary Python callables (reference
        Transform.call with module.foo — invoked per row there; Arrow-batched
        here)."""
        fn = self.python_fn
        n_out = max(len(self.output), 1)
        params = self.params

        from pyspark.sql.functions import pandas_udf

        if n_out == 1:
            @pandas_udf("string")
            def u(*series: pd.Series) -> pd.Series:
                # keep None as SQL null: .astype(str) would mint the
                # literal string "None", which survives isNotNull guards
                # and poisons identity digests (review finding); the
                # multi-output struct path already preserves None
                return pd.Series(
                    [None if v is None else str(v)
                     for v in (fn(*vals, **params) for vals in zip(*series))],
                    dtype=object,
                )

            return [u(*[F.col(c) for c in input_cols])]

        # tuple-returning fn -> struct udf, then unpack positionally
        struct_type = ", ".join(f"_o{i} string" for i in range(n_out))

        @pandas_udf(f"struct<{struct_type}>")
        def u_multi(*series: pd.Series) -> pd.DataFrame:
            results = [fn(*vals, **params) for vals in zip(*series)]
            return pd.DataFrame(
                {f"_o{i}": [r[i] for r in results] for i in range(n_out)}
            )

        s = u_multi(*[F.col(c) for c in input_cols])
        return [s.getField(f"_o{i}") for i in range(n_out)]
