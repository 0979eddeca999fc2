"""Spark ↔ DuckDB oracle parity for every registered query — the
local mirror of the driver's correctness gate (row count + sorted
schema + order-insensitive value comparison) at sf0.001.
"""

from __future__ import annotations

import math

import pytest

from damg7245_casestudy_03_ai_scoring_engine_spark.operators import REGISTRY

from conftest import SF_SMOKE


def _canon(rows, colnames):
    """Order-insensitive canonical form: rows as tuples of columns
    sorted by column name, floats rounded to 9 significant places."""
    idx = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return bool(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return float(f"{v:.9g}")
        try:
            import decimal

            if isinstance(v, decimal.Decimal):
                return float(f"{float(v):.9g}")
        except Exception:
            pass
        return v

    # sort key stringifies values: tuples mixing None/date/str are not
    # orderable in Python (first seen at sf0.1 where SCD2 ties reach a
    # NULL valid_to column); the comparison itself still uses the
    # typed tuples so 1 != "1" cannot false-match
    canon = [tuple(norm(r[i]) for i in idx) for r in rows]
    return sorted(canon, key=lambda t: tuple((v is None, repr(v)) for v in t))


ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
WEAK_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)

# Float-hygiene lint allowlist: (query, column) pairs whose DOUBLE
# output is NOT a fixed-point-rounded value but is still hash-stable by
# construction — either a verbatim parquet passthrough (both engines
# read identical bits) or a single exact-integer-ratio division (one
# IEEE op on order-independent operands).  Everything else must go
# through functions/core.round_stable on BOTH sides: an unrounded
# float AGGREGATE is summation-order-dependent and WILL eventually
# flip the driver's value-hash (round-3 red row).
FLOAT_LINT_OK: set[tuple[str, str]] = {
    # |value − median| where both operands are verbatim 2dp parquet
    # doubles: ONE IEEE subtraction of identical bits on both engines
    # (rank-selected median, no aggregation order anywhere), so the
    # result is bit-stable even though it is not decimal-fixed-point.
    ("mad_robust_outliers", "mad"),
}


def _lint_double_outputs(name, sdf, srows):
    """Every finite double output must be idempotent under the
    round_stable transform at 7dp (true for any value produced by
    round_stable(·, ≤6)) unless explicitly allowlisted."""
    import math as _m

    dbl_idx = [
        i
        for i, f in enumerate(sdf.schema.fields)
        if f.dataType.typeName() in ("double", "float")
        and (name, f.name.lower()) not in FLOAT_LINT_OK
    ]
    if not dbl_idx:
        return
    for r in srows:
        for i in dbl_idx:
            v = r[i]
            if v is None or not isinstance(v, float):
                continue
            if _m.isnan(v) or _m.isinf(v) or abs(v) > 1e9:
                continue
            rounded = _m.floor(v * 1e7 + 0.5) / 1e7
            assert rounded == v, (
                f"{name}.{sdf.schema.fields[i].name}: value {v!r} is not "
                f"fixed-point at <=7dp — unrounded double output; wrap it in "
                f"round_stable on both sides or allowlist it in FLOAT_LINT_OK "
                f"with a stability justification"
            )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [f.lower() for f in sdf.columns]

    res = duck.execute(spec.oracle)
    drows = res.fetchall()
    dcols = [d[0].lower() for d in res.description]

    assert sorted(scols) == sorted(dcols), f"schema mismatch: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"row count {len(srows)} vs {len(drows)}"
    assert _canon(srows, scols) == _canon(drows, dcols)
    _lint_double_outputs(name, sdf, srows)


def test_oracle_output_types_no_hugeint(duck):
    """Registry-wide typing lint: no oracle may OUTPUT a HUGEINT
    (int128) column.  DuckDB types a bare `sum(bigint_col)` as
    HUGEINT; the driver's comparator materializes oracle results
    through a path where int128 degrades to float64, so the value
    hash of `8254.0` no longer matches Spark's int64 `8254` even
    though fetchall()-based local mirrors (drive.py,
    tools/exact_parity.py) see identical Python ints and pass.
    Round-5 red row `domain_token_budget` was exactly this; wrap
    integer-sum outputs in CAST(... AS BIGINT).  DESCRIBE plans
    without executing, so this sweeps all oracles cheaply."""
    offenders = {}
    for name in ORACLE_QUERIES:
        desc = duck.execute("DESCRIBE " + REGISTRY[name].oracle).fetchall()
        hug = [c for c, t, *_ in desc if "HUGEINT" in t.upper()]
        if hug:
            offenders[name] = hug
    assert not offenders, (
        f"oracles with HUGEINT output columns (driver value-hash trap; "
        f"CAST them to BIGINT): {offenders}"
    )


@pytest.mark.parametrize("name", WEAK_QUERIES)
def test_rows_only(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0
