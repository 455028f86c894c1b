#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_filter_fixture.json by EXECUTING
the reference's strict PYTHON filter flavor (FilterExpression._cast_python,
graflo/filter/onto.py:499-523) over typed docs — ground truth for
ReferenceFilterParitySpec, which asserts FilterExpr.compilePython matches
per-row.

Each case records the filter (in the reference's own parse dialect), a
uniformly-typed doc column set (Spark columns are uniformly typed — the
reason the engine flavor exists), and the reference's boolean verdict per
doc.

Usage:
  PYTHONPATH=/tmp/refstubs:/root/reference python3 tools/gen_filter_fixture.py \
      > src/test/resources/reference_filter_fixture.json
"""
import sys, json
sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')

from graflo.filter.onto import parse_filter_expression, ExpressionFlavor

CASES = []

def case(name, filt, docs, types):
    expr = parse_filter_expression(filt)
    verdicts = [bool(expr(kind=ExpressionFlavor.PYTHON, **doc)) for doc in docs]
    CASES.append({"name": name, "filter": filt, "docs": docs,
                  "types": types, "verdicts": verdicts})

S = {"x": "string"}
L = {"x": "long"}
D = {"x": "double"}
B = {"x": "boolean"}

# --- strict cross-type semantics ---------------------------------------
case("eq_str_vs_int_is_false", ["==", 1, "x"],
     [{"x": "1"}, {"x": ""}], S)
case("eq_int_vs_str_is_false", ["==", "1", "x"],
     [{"x": 1}, {"x": 0}], L)
case("neq_cross_type_is_ALSO_false", ["!=", "1", "x"],
     [{"x": 1}, {"x": 2}], L)  # the NotImplemented-is-not-True quirk
case("lt_cross_type_is_false", ["<", "9", "x"],
     [{"x": 1}, {"x": 100}], L)
case("int_float_intercompare", ["==", 1.0, "x"],
     [{"x": 1}, {"x": 2}], L)
case("float_col_int_value", [">=", 2, "x"],
     [{"x": 1.5}, {"x": 2.0}, {"x": 2.5}], D)
case("bool_is_an_int", ["==", 1, "x"],
     [{"x": True}, {"x": False}], B)
case("bool_value_on_int_col", ["==", True, "x"],
     [{"x": 1}, {"x": 0}, {"x": 2}], L)
case("str_compare_same_type", [">", "m", "x"],
     [{"x": "a"}, {"x": "z"}, {"x": "m"}], S)

# --- missing / None fields ---------------------------------------------
case("none_field_is_false", ["==", 1, "x"],
     [{"x": None}, {"x": 1}], L)
case("missing_field_is_false", ["==", 1, "y"],
     [{"x": 1}], L)
case("is_null_on_none_and_missing", ["IS_NULL", None, "x"],
     [{"x": None}, {"x": 3}, {}], L)
case("is_not_null", ["IS_NOT_NULL", None, "x"],
     [{"x": None}, {"x": 3}], L)
case("not_over_none_field_is_true", {"NOT": [["==", 1, "x"]]},
     [{"x": None}, {"x": 1}, {"x": 2}], L)

# --- IN ------------------------------------------------------------------
case("in_same_type", {"field": "x", "cmp_operator": "IN",
                      "value": [1, 2, 3]},
     [{"x": 2}, {"x": 4}, {"x": None}], L)
case("in_cross_type_elements", {"field": "x", "cmp_operator": "IN",
                                "value": ["1", 2]},
     [{"x": 1}, {"x": 2}], L)
# IN evaluates real `in` (reflected ==), so numeric KINDS unify there —
# unlike the dunder-direct comparisons above
case("in_float_elements_coerce", {"field": "x", "cmp_operator": "IN",
                                  "value": [1.0, 3.5]},
     [{"x": 1}, {"x": 3}], L)
case("in_bool_element", {"field": "x", "cmp_operator": "IN",
                         "value": [True]},
     [{"x": 1}, {"x": 0}], L)
# dunder-direct asymmetry: int.__eq__(float) is NotImplemented but
# float.__ge__(int) works; bool is an int so bool.__eq__(float) is
# NotImplemented too
case("bool_col_float_value", ["==", 1.0, "x"],
     [{"x": True}], B)
case("float_col_bool_value", ["==", True, "x"],
     [{"x": 1.0}, {"x": 0.0}], D)

# --- composites ---------------------------------------------------------
case("and_or_tree", {"AND": [[">", 1, "x"], {"OR": [["<", 10, "x"],
                                                    ["==", 99, "x"]]}]},
     [{"x": 5}, {"x": 50}, {"x": 99}, {"x": 0}, {"x": None}], L)
case("if_then", {"IF_THEN": [[">", 0, "x"], ["<", 10, "x"]]},
     [{"x": 5}, {"x": 50}, {"x": -3}, {"x": None}], L)

print(json.dumps(CASES, indent=1, ensure_ascii=True))
