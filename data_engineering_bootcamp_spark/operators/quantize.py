"""Embedding quantization: int8 symmetric scalar quantization with
exact, engine-replayable error accounting.

The storage/serving half of the similarity stack (`operators/
similarity.py` is the compute half): at 100 TB an `array<float>`
embedding column is usually shipped to the ANN index quantized —
int8 symmetric (the faiss `SQ8` / ScaNN `int8` baseline) cuts the
column 4x and the dot-product bandwidth 4x, at a recall cost that
must be MEASURED, not assumed. This module produces both the
quantized vectors and the per-vector reconstruction-error stats a
pipeline gates that decision on.

Everything is pure Catalyst (`transform`/`aggregate` higher-order
functions — scan speed, no Python, no shuffle: the operator is
embarrassingly parallel per row). Determinism contract: the fold
`aggregate(errs, 0.0, +)` adds left-to-right starting from an exact
0.0, which is the same addition sequence DuckDB's `list_reduce`
performs, so a SQL oracle reproduces the doubles bit-for-bit;
rounding `floor(x*scale + 0.5)` is spelled out instead of `round()`
so both engines share one tie rule.

Reference anchor: the bootcamp's embedding lessons stop at raw
float vectors (see SURVEY.md §2 similarity notes); quantization is
part of the "beyond the reference" LLM-pipeline surface the brief
names (storage-efficient similarity search at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _scale_of(v: Column) -> Column:
    max_abs = F.array_max(F.transform(v, F.abs))
    return F.when(max_abs > 0.0, F.lit(127.0) / max_abs).otherwise(
        F.lit(1.0)
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q8",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Append int8 symmetric quantization of ``vec_col``.

    scale = 127 / max(|x|) per vector (1.0 for all-zero vectors);
    q_i = floor(x_i * scale + 0.5) — exact half-up, engine-agnostic.
    Output columns: ``out_col`` array<int>, ``scale_col`` double.
    Dequantize with q_i / scale.

    Expression-shape note: the scale is threaded through
    ``zip_with(v, array_repeat(scale, size))`` instead of a named
    column the lambda references — CollapseProject inlines a plain
    column INTO the lambda body, re-evaluating the array_max-based
    scale once PER ELEMENT (a measured ~60x slowdown on 64-dim
    vectors); array_repeat's argument is structurally evaluated once
    per row no matter how projects collapse.
    """
    v = _as_double(F.col(vec_col))
    q = F.zip_with(
        v,
        F.array_repeat(_scale_of(v), F.size(F.col(vec_col))),
        lambda x, s: F.floor(x * s + 0.5).cast("int"),
    )
    return df.withColumn(scale_col, _scale_of(v)).withColumn(out_col, q)


def quantization_error(
    df: DataFrame,
    id_cols: list[str],
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """Per-vector int8 reconstruction-error report.

    Output: id_cols + (dim, q_scale, sse, max_abs_err), the floats
    rounded to ``ndigits``. sse = sum((x - q/scale)^2) folded
    left-to-right from 0.0; max_abs_err = max |x - q/scale|. No
    shuffle — one narrow projection over the scan.
    """
    v = _as_double(F.col(vec_col))
    tmp = df.select(
        *id_cols,
        F.size(F.col(vec_col)).alias("dim"),
        _scale_of(v).alias("_scale"),
        _as_double(F.col(vec_col)).alias("_v"),
    )
    # same CollapseProject hazard as quantize_int8: thread the scale
    # per-row via array_repeat rather than referencing the column
    # inside the lambda
    err = F.zip_with(
        F.col("_v"),
        F.array_repeat(F.col("_scale"), F.size(F.col("_v"))),
        lambda x, s: x - F.floor(x * s + 0.5) / s,
    )
    tmp = tmp.withColumn("_err", err)
    sse = F.aggregate(
        F.transform(F.col("_err"), lambda e: e * e),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    max_err = F.array_max(F.transform(F.col("_err"), F.abs))
    return tmp.select(
        *id_cols,
        "dim",
        F.round(F.col("_scale"), ndigits).alias("q_scale"),
        F.round(sse, ndigits).alias("sse"),
        F.round(max_err, ndigits).alias("max_abs_err"),
    )
