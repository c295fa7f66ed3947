"""Pin the differential-gate classifier (tools/check_oracle.py).

The pandas-surface classifier IS part of the correctness gate since r10
(the r07-r09 score_auc divergence lived on that surface), and r11
hardened it per ADVICE.md plus the round's self-review. These tests pin
the hardened behaviors so a future refactor cannot silently re-open
them:

- mixed-type object columns classify over a STRIDED sample (a tail-only
  divergence past the cell budget was demonstrably invisible to both
  the r10 first-cell form and a naive head-slice sample);
- list-like cells recurse one level into element types (list-of-Decimal
  vs list-of-float must NOT collapse to an undifferentiated 'list');
- the empty-class wildcard applies ONLY in --surface-limit sampled mode
  (full mode stays strict: None-vs-NaT on an all-null column is a real
  rendering divergence and must fail, exactly as pre-r11).

r12 additions (r11 VERDICT "What's wrong" #1 + ADVICE):
- the list-ELEMENT sample is strided and includes the final element (a
  divergent type in the tail of a long list — past index 8 under the
  old head slice — must be caught);
- the cell-level strided sample explicitly includes the FINAL cell (a
  ceil-step stride skips up to step-1 trailing cells: a lone divergent
  cell at index 1501 of a 1502-row column fell off-stride);
- list recursion is depth-capped (_CLS_MAX_DEPTH) so a self-referential
  cell terminates instead of recursing forever.

r13 additions (r12 ADVICE): both strides are FLOOR-step + budget cap —
ceil-step could spend as little as half the stated budget, leaving
interior indices unsampled that the budget was sized to cover.

Pure-pandas unit tests — no SparkSession, no DuckDB, sub-second.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import numpy as np
import pandas as pd

from tools.check_oracle import _cell_cls, _pandas_cls, _surface_match


class TestCellCls:
    def test_scalars(self):
        assert _cell_cls(Decimal("1")) == "decimal"
        assert _cell_cls(3) == "int"
        assert _cell_cls(np.int64(3)) == "int"
        assert _cell_cls(1.5) == "float"
        assert _cell_cls(np.float64(1.5)) == "float"
        assert _cell_cls("x") == "str"
        assert _cell_cls(b"x") == "bin"

    def test_bool_before_int(self):
        # Python bool subclasses int; numpy likewise — a bool cell must
        # never classify as int
        assert _cell_cls(True) == "bool"
        assert _cell_cls(np.bool_(True)) == "bool"

    def test_datetime_before_date(self):
        # datetime.datetime subclasses datetime.date
        assert _cell_cls(datetime.date(2020, 1, 1)) == "date"
        assert _cell_cls(datetime.datetime(2020, 1, 1)) == "ts"
        assert _cell_cls(pd.Timestamp("2020-01-01")) == "ts"

    def test_list_recurses_one_level(self):
        assert _cell_cls([1.0, 2.0]) == "list<float>"
        assert _cell_cls([Decimal("1")]) == "list<decimal>"
        assert _cell_cls(np.array([1.0])) == "list<float>"
        assert _cell_cls((1, 2)) == "list<int>"
        assert _cell_cls([]) == "list<?>"
        assert _cell_cls([None, 1.0]) == "list<float>"

    def test_list_tail_element_divergence_caught(self):
        # r11 VERDICT #1: a divergent element type appearing only PAST
        # index 8 of a long list evaded the old head-slice element
        # sample (the tail of a 384-dim embedding is the real case)
        v = [1.0] * 383 + [Decimal("1")]
        assert _cell_cls(v) == "list<decimal,float>"
        # ...and an off-stride tail element (last index not a stride
        # multiple) is caught via the explicit final-element probe:
        # len 100 -> floor step 100//8=12, strided+capped indices
        # 0,12,...,84; index 99 is off-stride
        v2 = [1.0] * 99 + [Decimal("1")]
        assert _cell_cls(v2) == "list<decimal,float>"

    def test_elem_budget_filled_by_floor_stride(self):
        # r12 ADVICE: ceil-step spent as little as half the element
        # budget — len 9, budget 8 -> ceil step 2 sampled only indices
        # 0,2,4,6,8 (5 of 8), so a divergent element at an odd
        # NON-final index (7) evaded both the stride and the final
        # probe. Floor step 9//8=1 samples indices 0..7 + final: caught.
        v = [1.0] * 7 + [Decimal("1")] + [1.0]
        assert _cell_cls(v) == "list<decimal,float>"

    def test_list_recursion_depth_capped(self):
        # nested lists classify through _CLS_MAX_DEPTH levels, then
        # truncate to a marker instead of recursing forever (scalars
        # classify regardless of depth — only LIST recursion is capped)
        assert _cell_cls([[1.0]]) == "list<list<float>>"
        assert _cell_cls([[[1.0]]]) == "list<list<list<float>>>"
        assert _cell_cls([[[[1.0]]]]) == "list<list<list<list<...>>>>"
        # a self-referential cell terminates (the pre-r12 form looped)
        v = [1.0]
        v.append(v)
        assert "list" in _cell_cls(v)


class TestPandasCls:
    def test_native_dtypes(self):
        assert _pandas_cls(pd.Series([1, 2])) == "int"
        assert _pandas_cls(pd.Series([1.0])) == "float"
        assert _pandas_cls(pd.Series([True, False])) == "bool"
        assert _pandas_cls(pd.Series(pd.to_datetime(["2020-01-01"]))) == "ts"

    def test_object_homogeneous(self):
        s = pd.Series([Decimal("1"), Decimal("2")], dtype=object)
        assert _pandas_cls(s) == "decimal"

    def test_nested_element_divergence_detected(self):
        # the ADVICE.md scenario: list-of-Decimal (Spark) vs
        # list-of-float (DuckDB) must yield DIFFERENT classes
        spark_like = pd.Series([[Decimal("1")], [Decimal("2")]], dtype=object)
        duck_like = pd.Series([[1.0], [2.0]], dtype=object)
        assert _pandas_cls(spark_like) == "list<decimal>"
        assert _pandas_cls(duck_like) == "list<float>"
        assert not _surface_match(_pandas_cls(spark_like), _pandas_cls(duck_like))

    def test_mixed_type_column_not_hidden_by_first_cell(self):
        s = pd.Series([1, "x"], dtype=object)
        assert _pandas_cls(s) == "mixed{int,str}"

    def test_tail_only_divergence_caught_by_strided_sample(self):
        # 1500 Decimals then ONE float: a head-slice sample of 1024 cells
        # (and the r10 first-cell form) both said 'decimal'
        s = pd.Series([Decimal("1")] * 1500 + [1.0], dtype=object)
        assert _pandas_cls(s) == "mixed{decimal,float}"

    def test_off_stride_final_cell_divergence_caught(self):
        # r11 ADVICE scenario, still pinned under the r13 floor stride:
        # len 1502 -> floor step 1, capped sample = cells 0..1023 — a
        # lone divergent cell at index 1501 (the LAST cell, past the
        # cap) is examined only by the explicit final-cell probe
        s = pd.Series([Decimal("1")] * 1501 + [1.0], dtype=object)
        assert _pandas_cls(s) == "mixed{decimal,float}"

    def test_cell_budget_filled_by_floor_stride(self):
        # r12 ADVICE: ceil-step spent as little as half the cell budget
        # — len 1025, budget 1024 -> ceil step 2 sampled only the 513
        # even indices, so a divergent cell at an odd NON-final index
        # (513) evaded both the stride and the final probe. Floor step
        # 1025//1024=1 samples cells 0..1023 + final: caught.
        cells = [Decimal("1")] * 1025
        cells[513] = 1.0
        s = pd.Series(cells, dtype=object)
        assert _pandas_cls(s) == "mixed{decimal,float}"

    def test_empty_list_merges_into_typed_class(self):
        # [] and [1, 2] in one column are the same class
        s = pd.Series([[], [1, 2]], dtype=object)
        assert _pandas_cls(s) == "list<int>"

    def test_all_null_and_all_empty(self):
        assert _pandas_cls(pd.Series([None, None], dtype=object)) == "object-empty"
        assert _pandas_cls(pd.Series([[], []], dtype=object)) == "list<?>"


class TestSurfaceMatch:
    def test_full_mode_is_strict(self):
        # pre-r11 strictness preserved at the gate default: an all-null
        # object column vs a concrete class is a FAIL (None vs NaT is a
        # real pandas-surface rendering divergence)
        assert not _surface_match("object-empty", "ts")
        assert not _surface_match("list<?>", "list<float>")
        assert not _surface_match("decimal", "float")

    def test_sampled_mode_wildcards_only_empties(self):
        # in --surface-limit mode an empty class is a sampling artifact
        # (each engine limited a different row subset), not evidence
        assert _surface_match("object-empty", "ts", sampled=True)
        assert _surface_match("list<?>", "list<float>", sampled=True)
        # ...but concrete-vs-concrete divergence still fails
        assert not _surface_match("decimal", "float", sampled=True)

    def test_equal_always_matches(self):
        assert _surface_match("decimal", "decimal")
        assert _surface_match("list<float>", "list<float>", sampled=True)
