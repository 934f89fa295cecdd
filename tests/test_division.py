"""Relational division — the sf corpus has an empty quotient (best
coverage 6/10), so the full=1 path is pinned here with an engineered
corpus where one supplier covers the whole divisor."""

import numpy as np
import pandas as pd

from ocracle_ray.pipelines.queries import (
    DIVISION_BRAND,
    DIVISION_SIZE_CAP,
    q_supplier_part_division,
)


def _write(tmp_path, parts, lineitems):
    pd.DataFrame(parts, columns=["p_partkey", "p_brand", "p_size"]).assign(
        p_name="x", p_type="t", p_retailprice=1.0
    ).to_parquet(tmp_path / "part.parquet")
    pd.DataFrame(lineitems, columns=["l_suppkey", "l_partkey"]).assign(
        l_orderkey=1
    ).to_parquet(tmp_path / "lineitem.parquet")


def test_full_coverage_supplier_flagged(ray_session, tmp_path):
    # divisor = parts 1..3 (brand + size <= cap); part 99 is outside
    parts = [(1, DIVISION_BRAND, 1), (2, DIVISION_BRAND, 2),
             (3, DIVISION_BRAND, DIVISION_SIZE_CAP),
             (4, DIVISION_BRAND, DIVISION_SIZE_CAP + 1),  # too big
             (99, "Brand#9", 1)]                          # wrong brand
    # supplier 10 covers all three; 20 covers two; 30 ships only
    # out-of-divisor parts
    lines = [(10, 1), (10, 2), (10, 3), (10, 1),
             (20, 1), (20, 3), (20, 99),
             (30, 4), (30, 99)]
    _write(tmp_path, parts, lines)
    out = q_supplier_part_division(str(tmp_path))
    assert out["n_divisor"].tolist() == [3, 3]
    assert out.iloc[0].to_dict() == {
        "s_suppkey": 10, "n_covered": 3, "n_divisor": 3, "full": 1}
    assert out.iloc[1].to_dict() == {
        "s_suppkey": 20, "n_covered": 2, "n_divisor": 3, "full": 0}
    assert 30 not in set(out["s_suppkey"])  # zero coverage: no row


def test_empty_divisor_yields_empty(ray_session, tmp_path):
    parts = [(4, DIVISION_BRAND, DIVISION_SIZE_CAP + 7)]
    lines = [(10, 4)]
    _write(tmp_path, parts, lines)
    out = q_supplier_part_division(str(tmp_path))
    assert len(out) == 0
