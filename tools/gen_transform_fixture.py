#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_transform_fixture.json by
EXECUTING the reference's own transform library (graflo/util/transform.py)
over a fixed input grid — the ground truth ReferenceTransformParitySpec
asserts against. Driver-side tooling only (needs the reference checkout
and its Python deps; stubs for strenum/suthing are created inline).

Usage:
  PYTHONPATH=<stubs>:/root/reference python3 tools/gen_transform_fixture.py \
      > src/test/resources/reference_transform_fixture.json
"""
import sys, json
sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')
from graflo.util import transform as T

cases = []
def add(fn, args, kwargs=None):
    kwargs = kwargs or {}
    try:
        r = getattr(T, fn)(*args, **kwargs)
        if isinstance(r, tuple): r = list(r)
        ok = True
        if isinstance(r, float) and (r != r or r in (float('inf'), float('-inf'))):
            r = f"<nonfinite:{r}>"
            ok = False
    except Exception as e:
        r = f"<error:{type(e).__name__}>"
        ok = False
    cases.append({"fn": fn, "args": args, "kwargs": kwargs, "result": r, "ok": ok})

strings = ["John. Doe, Smith", "John Doe Smith", "Doe, Jane Q", "A, B C, D",
           "Hello World", "  padded  ", "snake_case_name", "camelCaseName",
           "UPPERCASE", "with-dash", "with.dot", "O'Leary", "a/b/c", "", "x",
           "Ångström", "naïve café", "MixedUPPERlower", "HTTPResponse",
           "already_snake", "trailing_", "_leading", "a b  c", "tab\there"]
for s in strings:
    add("standardize", [s])
    add("camel_to_snake", [s])
    add("snake_to_camel", [s])
    add("snake_to_camel", [s], {"upper_first": True})

dates = ["2020-01-05", "1999-12-31", "2024-02-29", "05/01/2020", "2020",
         "JAN 5, 2020", "5 January 2020", "20200105", "not a date", "",
         "1923, May 10", "1923, July", "1921, Sept", "1935-36",
         "1926, December 24th", "1923, Bogus 10", "1923, Bogus", "a,b"]
for d in dates:
    add("parse_date_standard", [d])
    add("parse_date_conf", [d])
    add("parse_date_yahoo", [d])
    add("parse_date_standard_to_epoch", [d])
    add("parse_date_reference", [d])

for d, t in [("20200105", "9:30:00"), ("20191231", "23:59:59"),
             (20140310, "0:20:00"), ("20000101", "0:0:0")]:
    add("parse_date_ibes", [d, t])

for s in ["ADKINS/NARRA", "ARFSTROM      J", "VAN DEUSEN    P", "SOLO",
          "/X/Y", "O'LEARY       G", "A/B/C", "NELSON, C", "DU BOFF       R",
          "", "TAB\tSEP", "A  ", "/ONLY"]:
    add("cast_ibes_analyst", [s])

for x in ["3.14159", "2.5", "-1.75", "0", "1e3", "nan", "", "abc", "  7.0  "]:
    add("round_str", [x])
    add("round_str", [x], {"ndigits": 2})
    add("try_int", [x])
for x in [3, 3.7, -2.2, True, None, [1], "12", "12.9"]:
    add("try_int", [x])

for s, sep, keep in [("a/b/c", "/", -1), ("a/b/c", "/", 0), ("a/b/c", "/", 2),
                     ("a b c", " ", 1), ("nosep", "/", -1), ("x/y", "/", 5),
                     ("a/b/c", "/", -2), ("", "/", -1),
                     ("https://openalex.org/I220871436", "/", -1)]:
    add("split_keep_part", [s], {"sep": sep, "keep": keep})
add("split_keep_part", ["a/b/c"])  # defaults
add("split_keep_part", ["a/b/c"], {"keep": [0, 2]})  # list keep

for s, p in [("prefix_rest", "prefix_"), ("no_match", "xx"), ("", "a"), ("aa", "a")]:
    add("remove_prefix", [s, p])
for s, x in [("rest_suffix", "_suffix"), ("no_match", "xx"), ("", "a"), ("aa", "a")]:
    add("remove_suffix", [s, x])

print(json.dumps(cases, indent=1, ensure_ascii=False, default=str))
