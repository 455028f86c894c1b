#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_fuzzy_fixture.json by EXECUTING
the reference's FuzzyMatcher (graflo/util/fuzzy_matcher.py) over fixed
(vertex_names, fragment) grids — ground truth for FuzzyMatcherParitySpec.
Driver-side tooling only (needs the reference checkout).

Usage:
  PYTHONPATH=<stubs>:/root/reference python3 tools/gen_fuzzy_fixture.py \
      > src/test/resources/reference_fuzzy_fixture.json
"""
import sys, json
sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')
from graflo.util.fuzzy_matcher import FuzzyMatcher

grids = [
    (["users", "orders", "products", "order_items", "addresses"],
     ["user", "user_id", "users", "USER", "order", "orders_fk", "fk_orders",
      "product_key", "item", "order_item", "address", "addr", "ordr",
      "products", "id_users", "reference_products", "pk", "x", "",
      "userz", "orderz_id", "usres", "oredrs"]),
    (["customer", "supplier", "nation", "region", "part", "lineitem"],
     ["cust", "customer_id", "supplier_fk", "natio", "regio", "partkey",
      "line_item", "lineitems", "c", "su", "nationkey", "part_ref",
      "customr", "suplier", "netion", "lineitm"]),
    (["person", "personal_record"],
     ["person", "personal", "person_id", "personal_record_id", "record",
      "personnel", "persan"]),
]
out = []
for names, frags in grids:
    # cache disabled: the cached path flattens scores to 1.0 — we assert the
    # raw scoring contract
    m = FuzzyMatcher(names, threshold=0.8, enable_cache=False)
    for f in frags:
        match, score = m.match(f)
        out.append({"names": names, "fragment": f,
                    "match": match, "score": score})
    # a second threshold exercises the cutoff
    m2 = FuzzyMatcher(names, threshold=0.5, enable_cache=False)
    for f in frags:
        match, score = m2.match(f)
        out.append({"names": names, "fragment": f, "threshold": 0.5,
                    "match": match, "score": score})
print(json.dumps(out, indent=1))
